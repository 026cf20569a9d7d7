package graft.tools

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the optimization-round evidence trail (plans/rNN/<query>_before.txt /
  * _after.txt). Executes each query through the noop sink first so the
  * AQE-final executed plan is also captured below the formatted one.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <name>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r16")
    val suffix = args.lift(2).getOrElse("before")
    val names = args.drop(3).toSeq
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // Execute THIS QueryExecution (not a write command's clone) so
      // AQE finalizes and the printed plan carries isFinalPlan=true
      // with any ReusedExchange nodes visible.
      df.queryExecution.toRdd.count()
      val executed = df.queryExecution.executedPlan.toString
      val txt = s"== explain(formatted) — $name @ $sfDir ==\n" + formatted +
        "\n\n== executed plan (AQE final) ==\n" + executed
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
