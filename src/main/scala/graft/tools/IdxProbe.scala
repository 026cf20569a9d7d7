package graft.tools
object IdxProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.functions.GraftExtensions.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mf = graft.core.MiniFrame.fromParquet(spark, "/root/testdata/sf0.001/customer.parquet")
    mf.df.explain("formatted")
    val r = mf.df.selectExpr("max(_idx) as mx", "min(_idx) as mn", "count(*) as n", "count(distinct _idx) as nd").collect()(0)
    println(s"IDX_CHECK max=${r.getLong(0)} min=${r.getLong(1)} n=${r.getLong(2)} distinct=${r.getLong(3)}")
    spark.stop()
  }
}
