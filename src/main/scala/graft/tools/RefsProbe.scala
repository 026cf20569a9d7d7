package graft.tools

/** One-off diagnostic for the r14 bench anomaly: sql_catalog_refs read
  * ~5 s on BOTH bench trials (min-of-2) while QRepeat's warm reps read
  * ~0.5 s. The one mechanical difference is the bench's
  * `spark.catalog.clearCache()` between trials — this main replays
  * exactly that sequence and times each leg. */
object RefsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.functions.GraftExtensions
      .builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[refsprobe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val fn = graft.SparkEntry.queries("sql_catalog_refs")
    time("trial1 (fixture build)")(fn(spark, sfDir).count())
    spark.catalog.clearCache()
    time("trial2 (post clearCache)")(fn(spark, sfDir).count())
    time("trial3 (no clear)")(fn(spark, sfDir).count())
    spark.catalog.clearCache()
    time("trial4 (post clearCache)")(fn(spark, sfDir).count())
    spark.stop()
  }
}
