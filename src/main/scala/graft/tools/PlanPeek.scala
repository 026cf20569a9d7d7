package graft.tools
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.functions.GraftExtensions
      .builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"=== $name")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      println(df.queryExecution.executedPlan.toString.take(9000))
    }
    spark.stop()
  }
}
