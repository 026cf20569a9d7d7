package graft.tools

/** Print a named SparkEntry query's result — the eyeball-one-query
  * loop (QRepeat times them; this shows the rows).
  *
  * Usage: runMain graft.tools.QShow <sfDir> <name> [<name>...]
  */
object QShow {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.functions.GraftExtensions
      .builder("local[8]", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"=== $name")
      graft.SparkEntry.queries(name)(spark, sfDir).show(50, false)
    }
    spark.stop()
  }
}
