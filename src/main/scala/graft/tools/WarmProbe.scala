package graft.tools

/** Time one module's warmArtifacts in isolation (cold-vs-warm A/B aid:
  * delete the module's artifact tags, run this, compare).
  *
  * Usage: runMain graft.tools.WarmProbe <sfDir> <module>
  * where module ∈ dedup | similarity | corpus | graph | sql
  */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val module = args.lift(1).getOrElse("corpus")
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val warm: (org.apache.spark.sql.SparkSession, String) => Unit =
      module match {
        case "dedup" => graft.operators.Dedup.warmArtifacts
        case "similarity" => graft.operators.Similarity.warmArtifacts
        case "corpus" => graft.operators.Corpus.warmArtifacts
        case "graph" => graft.queries.Graph.warmArtifacts
        case "sql" => graft.queries.SqlInterface.warmArtifacts
        case other => sys.error(s"unknown module $other")
      }
    val t0 = System.nanoTime()
    warm(spark, sfDir)
    println(f"[warmprobe] $module ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
