package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: only run queries whose name starts with the
    // prefix (local iteration aid; the driver always passes 2 args)
    val prefix = args.lift(2).getOrElse("")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.functions.GraftExtensions
      .builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.Map.empty[String, String]
    SparkEntry.queries.filter(_._1.startsWith(prefix)).foreach { case (name, fn) =>
      // progress marker BEFORE the run: any engine warning in the log
      // (e.g. a single-partition WindowExec) is attributable to the
      // query that follows the marker
      System.err.println(s"[verify] running $name")
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // A failed query must leave a LOUD trace in the correctness
        // artifact, not vanish from it (r6: 22 broken queries simply had
        // no row). Write a one-row error parquet under the query's name:
        // the driver's compare then records an explicit red row (schema
        // + hash mismatch against the oracle) instead of silence.
        val msg = s"${e.getClass.getName}: " +
          Option(e.getMessage).getOrElse("").take(500)
        System.err.println(s"[verify] $name FAILED: $msg")
        failures(name) = msg
        try {
          import spark.implicits._
          Seq("GRAFT_QUERY_ERROR: " + msg).toDF("graft_query_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(_._1.startsWith(prefix))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Full error detail alongside the oracle dump (the error parquets
    // above carry only the fact of failure into the driver compare).
    val errJson = failures.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    spark.stop()
  }
}
