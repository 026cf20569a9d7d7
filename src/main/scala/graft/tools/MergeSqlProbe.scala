package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale evidence for RUNTIME-bounded SQL MERGE (perf only; the
  * correctness gate is GraftCatalogSpec + sql_catalog_merge):
  * the same 20k-key MERGE INTO runs against a 1x (500k rows / 16
  * files) and an 8x (4M rows / 128 files) range-layout catalog table,
  * and the report counts how many files the commit actually retired.
  * With SupportsRuntimeV2Filtering group filtering the rewrite must
  * track the touched key range (~1 file at both scales), not the
  * table size — the property that makes SQL upserts affordable at
  * 100 TB, demonstrated mechanically rather than by assertion.
  *
  * Usage: runMain graft.tools.MergeSqlProbe
  */
object MergeSqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]",
        "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = new java.io.File(
      graft.core.ArtifactCache.userScopedRoot("merge_sql_probe"),
      System.nanoTime().toString).getPath
    spark.conf.set("spark.sql.catalog.gmp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmp.ns")

    def run(tag: String, rows: Long, files: Int): Unit = {
      val t = s"gmp.ns.m_$tag"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT)")
      spark.sql(s"""INSERT INTO $t
        SELECT /*+ REPARTITION_BY_RANGE($files, id) */ id, id
        FROM range(0, $rows)""")
      val dir = s"$wh/ns/m_$tag"
      val before = graft.sources.GraftLog.currentVersion(dir)
      val t0 = System.nanoTime()
      spark.sql(s"""
        MERGE INTO $t t
        USING (SELECT id, -id AS v
               FROM range(100000, 120000)) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
      val wall = (System.nanoTime() - t0) / 1e9
      val removes = graft.sources.GraftLog.entries(dir)
        .count(e => e.version > before && e.action == "remove")
      val n = spark.table(t).count()
      println(f"[merge-sql] $tag files=$files rewrote=$removes " +
        f"wall=$wall%.2f rows=$n")
    }

    run("1x", 500000L, 16)
    run("8x", 4000000L, 128)
    spark.stop()
  }
}
