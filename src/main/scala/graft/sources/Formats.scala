package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink surface beyond the Parquet fixtures: CSV, JSON (lines),
  * and ORC, with schema-preserving round-trips. The reference has no
  * I/O at all (SURVEY.md §2.1); this is the ingest/egress surface a
  * standalone engine needs.
  *
  * Scale notes: every writer here partitions by the frame's existing
  * partitioning (no coalesce — a 100 TB egress wants one file per
  * task); readers take an explicit schema, because schema inference
  * over CSV/JSON is a full extra pass at scale (and type-lossy for
  * CSV). Parquet/ORC embed their schema — columnar + predicate
  * pushdown make them the only sane at-rest formats for the pipeline;
  * CSV/JSON exist for interchange. */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("timestampFormat",
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)

  def readJson(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Partitioned-by-column Parquet layout (hive-style directories) —
    * the layout that makes partition pruning work on a date/key column
    * at scale. */
  def writePartitioned(df: DataFrame, path: String, byCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(byCol).parquet(path)

  /** Bucketed parquet table (external path, session catalog): rows
    * hash-partitioned into `nBuckets` files by `byCol` and sorted within
    * each bucket. Two tables bucketed the same way join WITHOUT a
    * shuffle — at 100 TB, pre-bucketing the fact tables on the join key
    * turns every subsequent equi-join into a local merge (the biggest
    * single cost a warehouse layout decision can remove; BucketingSpec
    * asserts the Exchange-free plan mechanically). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      nBuckets: Int, byCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, byCol).sortBy(byCol)
      .option("path", path).format("parquet").saveAsTable(table)

  /** Small-file compaction — the table-maintenance pass a lake runs
    * continuously: streaming sinks and over-parallel writes leave
    * thousands of tiny files whose per-file open/footer/listing cost
    * comes to dominate scans at 100 TB. Rewrites the directory into
    * ⌈bytes / targetBytes⌉ files via a round-robin repartition
    * (uniform output sizes), then swaps directories. Returns the
    * output file count. At scale, run per partition directory so each
    * swap is bounded by one partition's data, and take a table lock
    * (or use a transactional table format) for the swap window —
    * rename is atomic per directory on HDFS-like filesystems. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): Int = {
    val df = spark.read.parquet(path)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = ((bytes + targetBytes - 1) / targetBytes)
      .max(1).min(10000).toInt
    val target = new org.apache.hadoop.fs.Path(path)
    // resolve the PATH's filesystem, not the cluster default: with
    // fs.defaultFS=hdfs:// a file:/ or s3a:// table would otherwise
    // pay the full rewrite and then die in the swap with "Wrong FS"
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val retired = new org.apache.hadoop.fs.Path(path + "__retired")
    df.repartition(nFiles).write.mode(SaveMode.Overwrite)
      .parquet(tmp.toString)
    // swap via two renames with the OLD data parked aside, never a
    // delete-then-rename: a crash (or a false rename return) between
    // a delete and the rename would leave NO copy at the published
    // path. Here every failure mode leaves either the old directory
    // in place or the old copy recoverable at __retired.
    fs.delete(retired, true) // clear a previous run's parked copy
    if (!fs.rename(target, retired))
      throw new java.io.IOException(s"compaction swap failed for $path" +
        " (could not retire the current directory)")
    if (!fs.rename(tmp, target)) {
      fs.rename(retired, target) // restore — old data was never lost
      throw new java.io.IOException(s"compaction swap failed for $path")
    }
    fs.delete(retired, true)
    nFiles
  }

  /** Co-located join over pre-bucketed tables, as an inventory query:
    * the values match a plain join (the oracle), the point is the plan —
    * both scan sides report the bucket spec and the equi-join runs with
    * zero Exchange nodes. The only shuffle left is the final group-by. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_bucketed_colocated" -> ((s, d) => {
      // the path embeds the fixture FINGERPRINT (name + parquet
      // mtimes/sizes, same key as the persisted artifacts), so a
      // regenerated fixture can never be served a prior generation's
      // bucketed rows — which is what makes the cross-process REUSE
      // below safe
      // under the 0700 per-user scratch root (not a fixed world-writable
      // /tmp name): trusting any _SUCCESS-bearing directory is only safe
      // when no other local user can have planted it
      val base = new java.io.File(
        graft.core.ArtifactCache.userScopedRoot("bucketed_v2"),
        graft.core.ArtifactCache.fixtureTag(d)).getPath
      // Build the warehouse layout once per FIXTURE GENERATION: in a
      // real deployment the fact tables are bucketed at ingest, not
      // per query, so repeat runs (bench trials) measure the join, not
      // the one-time write — and a fresh process whose /tmp already
      // holds this generation's buckets only RE-REGISTERS the external
      // table (metadata DDL pointing at the existing files; Spark's
      // bucketed layout is carried by the file naming + the table's
      // bucket spec), which is why the registration check must still
      // verify the table ACTUALLY POINTS AT this fixture's path: the
      // table name is session-global while the path is per-fixture.
      def ensure(table: String, path: String)(df: => DataFrame)(
          bucketCol: String): Unit = {
        val complete = new java.io.File(path, "_SUCCESS").exists()
        val pointsHere = complete && s.catalog.tableExists(table) &&
          scala.util.Try(s.table(table).inputFiles).toOption
            .exists(fs => fs.nonEmpty && fs.forall(_.contains(path)))
        if (!pointsHere) {
          if (complete) {
            s.sql(s"DROP TABLE IF EXISTS $table")
            s.sql(s"CREATE TABLE $table (${df.schema.toDDL}) " +
              s"USING parquet CLUSTERED BY ($bucketCol) " +
              s"SORTED BY ($bucketCol) INTO 8 BUCKETS " +
              s"LOCATION '$path'")
          } else writeBucketed(df, table, path, 8, bucketCol)
        }
      }
      ensure("g_orders_bkt", s"$base/orders")(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")))(
        "o_orderkey")
      ensure("g_lineitem_bkt", s"$base/lineitem")(
        Tables.lineitem(s, d).select(col("l_orderkey"),
          col("l_extendedprice"), col("l_discount")))(
        "l_orderkey")
      s.table("g_orders_bkt")
        .join(s.table("g_lineitem_bkt"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,10)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // The custom DSv2 connector driven end to end: a range predicate
    // that the source consumes at planning (partition pruning — only
    // the overlapping id-slices are ever generated; SeriesSourceSpec
    // pins the plan) and a projection that prunes `tag` out of the
    // reader. DECIMAL sum so the aggregate is order-independent; the
    // oracle rebuilds the identical table from range() — the custom
    // source passes the same gate as every operator.
    "source_custom_dsv2" -> ((s, d) =>
      s.read.format("graft.sources.SeriesSource")
        .option("n", "100000").option("slices", "16").load()
        .filter(col("id") >= 25000L && col("id") < 75000L)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))),

    // The custom TRANSACTIONAL sink driven end to end: generator source
    // → manifest-committed graft-log table → read back → aggregate.
    // The write happens once per session+fixture (overwrite mode is
    // idempotent — the ingest step of a pipeline); repeat runs measure
    // the manifest-gated read. DECIMAL sum → order-independent; the
    // oracle rebuilds the same table from range(), so a row lost or
    // doubled anywhere in the write/commit/read path is a hash miss.
    "sink_custom_dsv2_roundtrip" -> ((s, d) => {
      // _v2: versioned-manifest format (time travel) — old bare-name
      // manifests in a stale /tmp cache must not be parsed
      val dir = graft.core.ArtifactCache.fixtureScratch("log_v2", d)
      if (GraftLog.committedFiles(dir).isEmpty)
        s.read.format("graft.sources.SeriesSource")
          .option("n", "50000").option("slices", "8").load()
          .write.format("graft.sources.GraftLogSource")
          .option("path", dir).mode("overwrite").save()
      s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
    }),

    // The custom SQL catalog driven through the driver gate: CREATE
    // TABLE + two INSERTs through `spark.sql` against GraftCatalog,
    // then a versioned aggregate — rows from snapshot 0 tagged apart
    // from the full table, so the oracle checks BOTH the DDL path and
    // time travel. DDL runs once per session+fixture (the catalog dir
    // doubles as the marker); repeat runs measure the reads.
    "sql_catalog_versioned" -> ((s, d) => {
      ensureCatalogSeries(s, d)
      s.sql("""
        SELECT v.bucket,
               CAST(COUNT(*) AS BIGINT) AS n_v0,
               (SELECT COUNT(*) FROM graftq.ns.series) AS n_total
        FROM graftq.ns.series VERSION AS OF 0 v
        GROUP BY v.bucket""")
    }),

    // Manifest-stats file skipping driven end to end: a range-layout
    // graft-log table (repartitionByRange at ingest → per-file id
    // ranges are disjoint) read under a selective range predicate. The
    // scan plans only the files whose [min, max] overlap the predicate
    // (GraftLogSpec asserts files=kept/total mechanically); the oracle
    // checks the VALUES the kept-and-filtered rows produce — a file
    // wrongly skipped loses rows, a file wrongly kept is filtered
    // Spark-side, so only under-reads can hash-mismatch. This is the
    // scan-side half of the format the r7 verdict flagged: pruning a
    // 100 TB log table to the touched key range at planning time.
    "sink_custom_dsv2_pruned" -> ((s, d) => {
      val dir = ensurePrunedSeries(s, d)
      s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .filter(col("id") >= 40000L && col("id") < 45000L)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
    }),

    // The change data feed driven through the driver gate: the catalog
    // table's two committed versions, read incrementally from version 0
    // — exactly the second INSERT's rows, never a rescan of history.
    // Oracle = the difference of the two range() twins.
    "sql_catalog_cdf" -> ((s, d) => {
      val dir = ensureCatalogSeries(s, d)
      s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).option("changesFromVersion", "0").load()
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_changed"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
    }),

    // The `t$files` metadata table driven through the driver gate: the
    // REPARTITION hints in the ensure-DDL make file counts per version
    // deterministic (1 then 2), and the manifest's per-file row counts
    // must sum to each insert's row count — gating the stats the scan
    // pruning above relies on.
    "sql_catalog_files" -> ((s, d) => {
      ensureCatalogSeries(s, d)
      s.sql("""
        SELECT version, CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(rows) AS BIGINT) AS n_rows
        FROM graftq.ns.`series$files` WHERE action = 'add'
        GROUP BY version""")
    }),

    // The `t$stats` metadata table through the driver gate: table-level
    // column statistics — HLL NDV estimate, exact null count — computed
    // purely from the per-file manifest sketches (no data scan; the
    // ANALYZE-TABLE answer at metadata cost). The exact figures come
    // from the data; the sketch estimates are gated as tolerance
    // booleans (±15% at p=9 for 10k distinct, ±10% in the
    // linear-counting regime for 97).
    "sql_catalog_stats" -> ((s, d) => {
      ensureCatalogSeries(s, d)
      val st = s.sql("""SELECT column, ndv_est, null_count
          FROM graftq.ns.`series$stats`""").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val (idNdv, idNulls) = st("id")
      val (bNdv, bNulls) = st("bucket")
      s.sql("""SELECT CAST(COUNT(DISTINCT id) AS BIGINT) AS exact_id_ndv,
               CAST(COUNT(DISTINCT bucket) AS BIGINT) AS exact_bucket_ndv
               FROM graftq.ns.series""")
        .select(col("exact_id_ndv"), col("exact_bucket_ndv"),
          lit(math.abs(idNdv - 10000.0) / 10000.0 < 0.15)
            .as("id_ndv_ok"),
          lit(math.abs(bNdv - 97.0) / 97.0 < 0.10).as("bucket_ndv_ok"),
          lit(idNulls == 0L && bNulls == 0L).as("nulls_exact"))
    }),

    // The `t$cdc` metadata table through the driver gate: one row per
    // committed version with its typed-feed coverage — which spans a
    // downstream sync can replay with exact change types (has_cdc)
    // and which fall back to adds-as-inserts. Closed form: the seed
    // insert is a plain append (1000 add rows, no sidecars); the
    // DELETE under graft.cdf.enabled publishes exactly the 50 deleted
    // rows as typed sidecar rows in the same commit. Metadata-only:
    // answered from the manifest, no data scan.
    "sql_catalog_cdc_meta" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/cdcm"
      rebuildOnce(cdcMetaBuilt, dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.cdcm")
        s.sql("CREATE TABLE graftq.ns.cdcm (id BIGINT, v BIGINT)")
        s.sql("""INSERT INTO graftq.ns.cdcm
                 SELECT /*+ REPARTITION(1) */ id, id
                 FROM range(0, 1000)""")
        GraftLog.setProperties(dir, Map("graft.cdf.enabled" -> "true"))
        s.sql("DELETE FROM graftq.ns.cdcm WHERE id < 50")
        true
      }
      s.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_versions,
               CAST(SUM(CASE WHEN has_cdc THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_cdc_versions,
               CAST(SUM(n_cdc_rows) AS BIGINT) AS total_cdc_rows,
               CAST(SUM(CASE WHEN NOT has_cdc THEN n_add_rows
                 ELSE 0 END) AS BIGINT) AS plain_add_rows
        FROM graftq.ns.`cdcm$cdc`""")
    }),

    // Partition EVOLUTION through the driver gate (Iceberg's
    // partition-spec change + rewrite_data_files as one CALL): the
    // fact table re-keys from a to b, the rewrite routes one file per
    // new value, and a join with an alike-partitioned dim then plans
    // with ZERO exchange — storage-partitioned joins resume on the
    // new key (gated boolean). The oracle recomputes the join, so a
    // row lost or duplicated by the relayout is a hash miss.
    "sql_catalog_partition_evolution" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/pevo_t"
      rebuildOnce(partEvoBuilt, dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.pevo_t")
        s.sql("DROP TABLE IF EXISTS graftq.ns.pevo_d")
        s.sql("""CREATE TABLE graftq.ns.pevo_t
                 (id BIGINT, a BIGINT, b BIGINT) PARTITIONED BY (a)""")
        s.sql("""INSERT INTO graftq.ns.pevo_t
                 SELECT id, id % 4, id % 8 FROM range(0, 4000)""")
        s.sql("""CREATE TABLE graftq.ns.pevo_d
                 (w BIGINT, b BIGINT) PARTITIONED BY (b)""")
        s.sql("""INSERT INTO graftq.ns.pevo_d
                 SELECT id * 2, id % 8 FROM range(0, 800)""")
        s.sql("""CALL graftq.system.repartition_table(
                 table => 'ns.pevo_t', col => 'b')""")
        true
      }
      // gated per-query: the conf is set, the 8-group result (plus
      // the plan-shape gate) materialized, and the prior value
      // restored — no planner conf leaks into the shared session
      withConfMaterialized(s,
          "spark.sql.sources.v2.bucketing.enabled", "true") {
        val j = s.table("graftq.ns.pevo_t")
          .join(s.table("graftq.ns.pevo_d").hint("merge"), "b")
          .groupBy(col("b"))
          .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
            sum(col("w")).as("sum_w"))
        val plan = j.queryExecution.executedPlan.toString
        val spj = (plan.contains("SortMergeJoin") ||
          plan.contains("ShuffledHashJoin")) && !plan.contains("Exchange")
        j.select(col("b"), col("n"), col("sum_id"), col("sum_w"),
          lit(spj).as("spj_resumed_on_new_key"))
      }
    }),

    // SQL TRUNCATE TABLE through the driver gate: the unconditional
    // DELETE — one metadata commit retires every live file (no data
    // I/O), history stays time-travelable, and the CDF-enabled table
    // publishes every vanished row as a typed delete so downstream
    // replicas follow the wipe. Gated booleans: pre-truncate snapshot
    // still readable, typed feed carries exactly the wiped rows.
    "sql_catalog_truncate" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/trunc_t"
      val (histOk, cdcOk) = rebuildOnce(truncateBuilt, dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.trunc_t")
        s.sql("CREATE TABLE graftq.ns.trunc_t (id BIGINT, v BIGINT)")
        s.sql("""INSERT INTO graftq.ns.trunc_t
                 SELECT /*+ REPARTITION(1) */ id, id
                 FROM range(0, 1000)""")
        GraftLog.setProperties(dir, Map("graft.cdf.enabled" -> "true"))
        val v = GraftLog.currentVersion(dir)
        s.sql("TRUNCATE TABLE graftq.ns.trunc_t")
        val hist = s.sql(
          s"SELECT COUNT(*) FROM graftq.ns.trunc_t VERSION AS OF $v")
          .head.getLong(0) == 1000L
        val cdc = GraftLog.typedChanges(s, dir, v)
          .filter(col("_change_type") === "delete")
          .agg(count(lit(1)), sum(col("id"))).head
        s.sql("""INSERT INTO graftq.ns.trunc_t
                 SELECT id, id * 5 FROM range(0, 300)""")
        (hist, cdc.getLong(0) == 1000L &&
          cdc.getLong(1) == (0L until 1000L).sum)
      }
      s.sql("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(v) AS BIGINT) AS sum_v
               FROM graftq.ns.trunc_t""")
        .select(col("n_rows"), col("sum_v"),
          lit(histOk).as("history_time_travelable"),
          lit(cdcOk).as("cdf_records_wipe"))
    }),

    // SQL INSERT OVERWRITE through the driver gate: Spark's
    // OverwriteByExpression rides the write builder's
    // SupportsTruncate — one atomic version replaces the table's
    // contents (readers see all-old or all-new, never a mix), and the
    // table stays appendable after. Gated boolean: the overwrite is
    // ONE commit (no partial visibility window in the log).
    "sql_catalog_insert_overwrite" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/iow_t"
      val oneCommit = rebuildOnce(insertOverwriteBuilt, dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.iow_t")
        s.sql("CREATE TABLE graftq.ns.iow_t (id BIGINT, v BIGINT)")
        s.sql("""INSERT INTO graftq.ns.iow_t
                 SELECT /*+ REPARTITION(1) */ id, id
                 FROM range(0, 1000)""")
        val vBefore = GraftLog.currentVersion(dir)
        s.sql("""INSERT OVERWRITE graftq.ns.iow_t
                 SELECT /*+ REPARTITION(1) */ id, id * 9
                 FROM range(0, 200)""")
        s.sql("""INSERT INTO graftq.ns.iow_t
                 SELECT id, id * 9 FROM range(200, 250)""")
        // overwrite resets the lineage to a fresh version 0 commit —
        // exactly one version between it and the follow-up append
        GraftLog.currentVersion(dir) == vBefore + 1 ||
          GraftLog.currentVersion(dir) == 1L
      }
      s.sql("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(v) AS BIGINT) AS sum_v
               FROM graftq.ns.iow_t""")
        .select(col("n_rows"), col("sum_v"),
          lit(oneCommit).as("atomic_single_commit"))
    }),

    // RENAME COLUMN through the driver gate (Delta column-mapping
    // 'name' mode in miniature): metadata-only — the schema field
    // records its former name and every consumer resolves each file's
    // LOCAL name through the trail, so pre-rename files keep serving
    // their data AND their stats pruning. Gated boolean: a filter on
    // the renamed column still skips the pre-rename file whose range
    // excludes it (files=1/2 in the plan), while the aggregate spans
    // both vintages.
    "sql_catalog_rename_col" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/ren_t"
      rebuildOnce(renameColBuilt, dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.ren_t")
        s.sql("CREATE TABLE graftq.ns.ren_t (id BIGINT, v BIGINT)")
        s.sql("""INSERT INTO graftq.ns.ren_t
                 SELECT /*+ REPARTITION(1) */ id, id * 3
                 FROM range(0, 2000)""")
        s.sql("ALTER TABLE graftq.ns.ren_t RENAME COLUMN v TO score")
        s.sql("""INSERT INTO graftq.ns.ren_t
                 SELECT /*+ REPARTITION(1) */ id, id * 3
                 FROM range(2000, 2500)""")
        true
      }
      val hi = s.sql(
        "SELECT * FROM graftq.ns.ren_t WHERE score >= 6000")
      val prunedOk = hi.queryExecution.executedPlan.toString
        .contains("files=1/2")
      s.sql("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(score) AS BIGINT) AS sum_score
               FROM graftq.ns.ren_t""")
        .select(col("n_rows"), col("sum_score"),
          lit(prunedOk).as("former_name_stats_prune"))
    }),

    // Type WIDENING through the driver gate (the Delta 4.0 feature,
    // metadata-only here by construction: part-file cells are decimal
    // text, so re-typing the schema field re-decodes every vintage
    // exactly). The post-widen insert exceeds the old INT range —
    // the operation the widen exists for — and the manifest min/max
    // aggregate keeps answering across both vintages (gated boolean).
    "sql_catalog_widen_col" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/widet"
      rebuildOnce(widenColBuilt, dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.widet")
        s.sql("CREATE TABLE graftq.ns.widet (id BIGINT, n INT)")
        s.sql("""INSERT INTO graftq.ns.widet
                 SELECT /*+ REPARTITION(1) */ id, CAST(id AS INT)
                 FROM range(0, 2000)""")
        s.sql("ALTER TABLE graftq.ns.widet ALTER COLUMN n TYPE BIGINT")
        s.sql("""INSERT INTO graftq.ns.widet
                 SELECT /*+ REPARTITION(1) */ id, id * 10000000
                 FROM range(2000, 2500)""")
        true
      }
      val metaOk = s.sql("SELECT MIN(n), MAX(n) FROM graftq.ns.widet")
        .queryExecution.executedPlan.toString.contains("metaCount=")
      s.sql("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(n) AS BIGINT) AS sum_n
               FROM graftq.ns.widet""")
        .select(col("n_rows"), col("sum_n"),
          lit(metaOk).as("meta_agg_spans_vintages"))
    }),

    // DROP COLUMN through the driver gate: metadata-only — the schema
    // narrows, old files keep their now-invisible cells until
    // compaction physically purges them, and the name TOMBSTONES
    // (old cells still key under it, so a re-added column would
    // silently resurrect stale values — the hazard Iceberg's field
    // ids exist to prevent; a name-keyed format must reject reuse).
    "sql_catalog_drop_col" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/dropt"
      val (readdRejected, cellsPurged) =
        rebuildOnce(dropColBuilt, dir) {
          s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
          s.sql("DROP TABLE IF EXISTS graftq.ns.dropt")
          s.sql("""CREATE TABLE graftq.ns.dropt
                   (id BIGINT, keep BIGINT, junk BIGINT)""")
          (0 until 2).foreach(i => s.sql(
            s"""INSERT INTO graftq.ns.dropt
                SELECT /*+ REPARTITION(1) */ id, id * 2, id * 7
                FROM range(${i * 1000}, ${i * 1000 + 1000})"""))
          s.sql("ALTER TABLE graftq.ns.dropt DROP COLUMN junk")
          val rejected =
            try {
              s.sql("ALTER TABLE graftq.ns.dropt ADD COLUMN junk BIGINT")
              false
            } catch {
              case e: Exception => Option(e.getMessage)
                .exists(_.contains("previously used"))
            }
          s.sql("CALL graftq.system.compact(table => 'ns.dropt')")
          val purged = GraftLog.entriesAsOf(dir, Long.MaxValue)
            .forall(e => e.cols == Seq("id", "keep"))
          (rejected, purged)
        }
      s.sql("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(keep) AS BIGINT) AS sum_keep
               FROM graftq.ns.dropt""")
        .select(col("n_rows"), col("sum_keep"),
          lit(readdRejected).as("tombstone_rejects_readd"),
          lit(cellsPurged).as("compaction_purges_cells"))
    }),

    // Named refs (Iceberg tags) + log expiration through the driver
    // gate: `first_batch` pins version 0 and reads by NAME; the log
    // then expires everything a checkpoint subsumes and the CURRENT
    // snapshot still answers exactly (expire is metadata-only). Gated
    // booleans: the sub-horizon tag read must fail loudly afterwards,
    // and expiration must actually delete log segments.
    "sql_catalog_refs" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/refs_t"
      val (tagN, expired, horizonLoud) = rebuildOnce(refStats, dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.refs_t")
        s.sql("CREATE TABLE graftq.ns.refs_t (id BIGINT, v BIGINT)")
        s.sql("""INSERT INTO graftq.ns.refs_t
                 SELECT /*+ REPARTITION(1) */ id, id FROM range(0, 3000)""")
        s.sql("""CALL graftq.system.set_ref(table => 'ns.refs_t',
                 name => 'first_batch', version => 0)""")
        // 12 more commits so a checkpoint lands, then expire behind it
        (0 until 12).foreach(i => s.sql(
          s"INSERT INTO graftq.ns.refs_t SELECT $i + 10000, 0" +
            " FROM range(1)"))
        val n = s.sql("""SELECT COUNT(*) FROM graftq.ns.refs_t
                         VERSION AS OF 'first_batch'""").head.getLong(0)
        val del = s.sql("""CALL graftq.system.expire_log(
          table => 'ns.refs_t', before_version => 11)""").head.getInt(0)
        val loud =
          try {
            s.sql("""SELECT COUNT(*) FROM graftq.ns.refs_t
                     VERSION AS OF 'first_batch'""").collect(); false
          } catch {
            case e: Exception =>
              Option(e.getMessage).exists(_.contains("expired"))
          }
        (n, del > 0, loud)
      }
      s.sql("SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
          "CAST(SUM(id) AS BIGINT) AS sum_id FROM graftq.ns.refs_t")
        .select(col("n_rows"), col("sum_id"),
          lit(tagN == 3000L).as("tag_read_pinned_v0"),
          lit(expired).as("log_expired"),
          lit(horizonLoud).as("horizon_fails_loudly"))
    }),

    // Writable branches through the driver gate (the Iceberg-branch
    // lifecycle): create_branch forks the table, a session with
    // spark.graft.log.branch set commits to the branch's own log
    // (gated: mainline count stays 2000 while the branch carries
    // 500 more), and fast_forward publishes the branch as ONE
    // mainline commit, exactly once. The oracle recomputes the final
    // table in closed form — a leaked branch row pre-publish, a lost
    // row at publish, or a double publish is a hash miss. At 100 TB
    // this is how a multi-batch ingest line is validated in isolation
    // and landed atomically.
    "sql_catalog_branch" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/brch_t"
      val (invisible, ffPublished) = rebuildOnce(branchStats, dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.brch_t")
        s.sql("CREATE TABLE graftq.ns.brch_t (id BIGINT, v BIGINT)")
        s.sql("""INSERT INTO graftq.ns.brch_t
                 SELECT id, id FROM range(2000)""")
        s.sql("""CALL graftq.system.create_branch(
                 table => 'ns.brch_t', name => 'dev')""")
        s.conf.set(GraftLog.BranchConf, "dev")
        try
          s.sql("""INSERT INTO graftq.ns.brch_t
                   SELECT id + 2000, id FROM range(500)""")
        finally s.conf.unset(GraftLog.BranchConf)
        val mainN = s.sql(
          "SELECT COUNT(*) FROM graftq.ns.brch_t").head.getLong(0)
        val v = s.sql("""CALL graftq.system.fast_forward(
          table => 'ns.brch_t', name => 'dev')""").head.getLong(0)
        (mainN == 2000L, v == 1L)
      }
      s.sql("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(id) AS BIGINT) AS sum_id,
               CAST(SUM(v) AS BIGINT) AS sum_v
               FROM graftq.ns.brch_t""")
        .select(col("n_rows"), col("sum_id"), col("sum_v"),
          lit(invisible).as("branch_invisible"),
          lit(ffPublished).as("ff_published"))
    }),

    // The `t$txns` metadata table through the driver gate: a REAL
    // materialized-view lifecycle (bootstrap + one incremental
    // refresh) leaves its exactly-once watermark in the view's log,
    // and t$txns surfaces it — which writer, applied through which
    // source version, committed at which view version. The oracle
    // pins all three (the marker must ride the MERGE commit itself:
    // applied_through = source head 1, committed_version = view
    // commit 2 — a marker-in-separate-commit bug breaks the row).
    "sql_catalog_txns" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val base = s"$wh/txnsns"
      val src = s"$base/src"; val mvd = s"$base/mv"
      rebuildOnce(txnsBuilt, base) {
        s.range(0, 1000).selectExpr("id", "id % 20 AS bucket",
            "id AS v")
          .coalesce(1)
          .write.format("graft.sources.GraftLogSource")
          .option("path", src).mode("append").save()
        MaterializedAgg.refresh(s, src, mvd, "bucket", Seq("v"))
        s.range(1000, 1200).selectExpr("id", "id % 5 AS bucket",
            "id AS v")
          .coalesce(1)
          .write.format("graft.sources.GraftLogSource")
          .option("path", src).mode("append").save()
        MaterializedAgg.refresh(s, src, mvd, "bucket", Seq("v"))
        ()
      }
      s.sql("""SELECT app_id, applied_through, committed_version
               FROM graftq.txnsns.`mv$txns`""")
    }),

    // Atomic CTAS/RTAS through the driver gate (StagingTableCatalog):
    // the table builds in a hidden staged directory and moves into
    // place only when the write committed. Gated booleans: a CTAS
    // whose query fails mid-write must strand NO table (the
    // non-staged path leaves a committed empty one), and a failed
    // REPLACE TABLE AS SELECT must keep the old table intact (the
    // non-staged path drops it first and loses it).
    "sql_catalog_ctas_atomic" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/ctas_ok"
      val (noStrand, oldKept) = rebuildOnce(ctasStats, dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.ctas_ok")
        s.sql("DROP TABLE IF EXISTS graftq.ns.ctas_bad")
        s.udf.register("graft_ctas_boom", (id: Long) =>
          if (id >= 500) throw new RuntimeException("boom") else id)
        s.sql("""CREATE TABLE graftq.ns.ctas_ok AS
                 SELECT id, id * 3 AS v FROM range(0, 2000)""")
        val stranded =
          try {
            s.sql("""CREATE TABLE graftq.ns.ctas_bad AS
              SELECT graft_ctas_boom(id) AS id FROM range(0, 1000)""")
            true
          } catch {
            case _: Exception =>
              s.catalog.tableExists("graftq.ns.ctas_bad")
          }
        val kept =
          try {
            s.sql("""REPLACE TABLE graftq.ns.ctas_ok AS
              SELECT graft_ctas_boom(id) AS id FROM range(0, 1000)""")
            false
          } catch {
            case _: Exception =>
              s.sql("SELECT COUNT(*) FROM graftq.ns.ctas_ok")
                .head.getLong(0) == 2000L
          }
        (!stranded, kept)
      }
      s.sql("SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
          "CAST(SUM(v) AS BIGINT) AS sum_v FROM graftq.ns.ctas_ok")
        .select(col("n_rows"), col("sum_v"),
          lit(noStrand).as("failed_ctas_strands_nothing"),
          lit(oldKept).as("failed_rtas_keeps_old_table"))
    }),

    // Write-audit-publish through the driver gate: an INSERT staged
    // under a WAP id is visible to the audit session (5000 rows) but
    // NOT to ordinary readers (4000) until CALL publish_staged makes
    // it one ordinary commit; a second publish fails loudly. The
    // final SELECT runs against the published table; the booleans
    // gate each leg of the audit lifecycle.
    "sql_catalog_wap" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/wap_t"
      val (auditN, baseN, pubOnce) = rebuildOnce(wapStats, dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.wap_t")
        s.sql("CREATE TABLE graftq.ns.wap_t (id BIGINT, v BIGINT)")
        s.sql("""INSERT INTO graftq.ns.wap_t
                 SELECT id, id FROM range(0, 4000)""")
        s.conf.set(GraftLog.WapConf, "r9audit")
        val a =
          try {
            s.sql("""INSERT INTO graftq.ns.wap_t
                     SELECT id + 4000, 1 FROM range(0, 1000)""")
            s.sql("SELECT COUNT(*) FROM graftq.ns.wap_t")
              .head.getLong(0)
          } finally s.conf.unset(GraftLog.WapConf)
        val base = s.sql("SELECT COUNT(*) FROM graftq.ns.wap_t")
          .head.getLong(0)
        s.sql("""CALL graftq.system.publish_staged(
          table => 'ns.wap_t', wap_id => 'r9audit')""").collect()
        val once =
          try {
            s.sql("""CALL graftq.system.publish_staged(
              table => 'ns.wap_t', wap_id => 'r9audit')""").collect()
            false
          } catch {
            case e: Exception =>
              Option(e.getMessage).exists(_.contains("no staged"))
          }
        (a, base, once)
      }
      s.sql("SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
          "CAST(SUM(v) AS BIGINT) AS sum_v FROM graftq.ns.wap_t")
        .select(col("n_rows"), col("sum_v"),
          lit(auditN == 5000L).as("audit_saw_staged"),
          lit(baseN == 4000L).as("staged_invisible"),
          lit(pubOnce).as("publish_exactly_once"))
    }),

    // The `t$partitions` metadata table (Iceberg's `partitions`): live
    // per-partition file/row counts — what a compaction policy reads to
    // find fragmented or skewed partitions. Fixture: a partitioned
    // table, two single-task appends (deterministic file counts: one
    // file per value per append), then a MoR delete of ids [0, 300) so
    // the row counts must be EFFECTIVE rows (DV-deleted rows excluded,
    // zero files rewritten). Closed-form oracle.
    "sql_catalog_partitions_meta" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/pmeta_t"
      rebuildOnce(partsMetaBuilt, dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.pmeta_t")
        s.sql("""CREATE TABLE graftq.ns.pmeta_t (id BIGINT, k STRING)
                 PARTITIONED BY (k)""")
        s.sql("""INSERT INTO graftq.ns.pmeta_t
                 SELECT /*+ REPARTITION(1) */ id,
                   CASE WHEN id % 3 = 0 THEN 'a'
                        WHEN id % 3 = 1 THEN 'b' ELSE 'c' END
                 FROM range(0, 3000)""")
        s.sql("""INSERT INTO graftq.ns.pmeta_t
                 SELECT /*+ REPARTITION(1) */ id + 3000,
                   CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END
                 FROM range(0, 1000)""")
        s.sql("""CALL graftq.system.delete_mor(table => 'ns.pmeta_t',
                 key_col => 'id', lo => 0, hi => 300)""").collect()
        true
      }
      s.sql("""SELECT part_value, n_files, n_rows
               FROM graftq.ns.`pmeta_t$partitions`""")
    }),

    // Table maintenance driven through the driver gate: three appends
    // → compact (one file serves the snapshot, dataChange=false keeps
    // the CDF clean) → expire-history vacuum (pre-compaction parts
    // reclaimed). The query re-reads the maintained table plus its
    // observable file state; any row lost or doubled by the
    // rewrite/reclaim cycle is a hash miss against the closed-form
    // oracle.
    "sink_log_compact_vacuum" -> ((s, d) => {
      val dir = graft.core.ArtifactCache.fixtureScratch("log_compact", d)
      val compacted = GraftLog.entries(dir).exists(!_.isAdd)
      if (!compacted) {
        wipeDir(dir)
        for (lo <- Seq(0L, 1000L, 3000L))
          s.range(lo, lo * 2 + 1000)
            .selectExpr("id", "CAST(id AS DOUBLE) / 2 AS value")
            .coalesce(1)
            .write.format("graft.sources.GraftLogSource")
            .option("path", dir).mode("append").save()
        GraftLog.compact(dir)
        // minAgeMs=0 is safe here: the build is single-writer.
        GraftLog.vacuum(dir, 0L, expireHistory = true)
      }
      val liveFiles = GraftLog.entriesAsOf(dir, Long.MaxValue).size
      val diskParts = Option(new java.io.File(dir).listFiles())
        .getOrElse(Array.empty)
        .count(_.getName.startsWith("part-"))
      s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .agg(count(lit(1)).as("n_rows"), sum(col("id")).as("sum_id"))
        .select(col("n_rows"), col("sum_id"),
          lit(liveFiles).cast("long").as("n_live_files"),
          lit(diskParts).cast("long").as("n_disk_parts"),
          lit(GraftLog.currentVersion(dir)).as("current_version"))
    }),

    // Size-bounded compaction: gzip'd TSV is not splittable, so a
    // compacted file IS the read-parallelism granule — outputs must
    // roll at a target size instead of fusing a partition into one
    // unbounded file. Fixture: 3 single-file commits (~60k chars),
    // compact under a 15k-char target; the snapshot must land in >1
    // rolled file, every row must survive, and the folded group
    // stats must still serve the exact global extremes.
    "sink_log_compact_target" -> ((s, d) => {
      val dir = graft.core.ArtifactCache.fixtureScratch("log_ctarget", d)
      val done = GraftLog.entries(dir).exists(!_.isAdd)
      if (!done) {
        wipeDir(dir)
        (1 to 3).foreach(_ => s.range(0, 1500)
          .selectExpr("id", "CAST(id AS DOUBLE) / 2 AS value")
          .coalesce(1)
          .write.format("graft.sources.GraftLogSource")
          .option("path", dir).mode("append").save())
        s.conf.set("spark.graft.log.compactTargetBytes", "15000")
        try GraftLog.compact(dir)
        finally s.conf.unset("spark.graft.log.compactTargetBytes")
      }
      val live = GraftLog.entriesAsOf(dir, Long.MaxValue)
      s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .agg(count(lit(1)).as("n_rows"), sum(col("id")).as("sum_id"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .select(col("n_rows"), col("sum_id"), col("min_id"),
          col("max_id"),
          lit(live.size > 1).as("rolled_multiple_files"),
          lit(live.map(_.rows).sum == 4500L).as("manifest_rows_exact"))
    }),

    // Incremental view maintenance off the change data feed: the
    // consumer pattern the CDF exists for. A per-bucket aggregate is
    // built once over the v0 snapshot; when v1 commits, the consumer
    // reads ONLY the delta (changesFromVersion=0 — one new file, never
    // a history rescan) and folds it into the materialized state by
    // partial-aggregate merge (counts and sums add). The emitted result
    // is the merged state; the oracle recomputes from scratch over both
    // batches, so the check IS the merge-equals-recompute law that
    // makes incremental maintenance sound. At 100 TB this is the
    // difference between touching an append's worth of data and the
    // whole table, every refresh cycle.
    "sink_log_incremental_agg" -> ((s, d) => {
      val dir = graft.core.ArtifactCache.fixtureScratch("log_incr", d)
      if (GraftLog.currentVersion(dir) != 1L) {
        wipeDir(dir)
        for ((lo, hi) <- Seq((0L, 4000L), (4000L, 6000L)))
          s.range(lo, hi).selectExpr("id", "id % 10 AS bucket")
            .coalesce(1)
            .write.format("graft.sources.GraftLogSource")
            .option("path", dir).mode("append").save()
      }
      def bucketAgg(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"))
      val base = bucketAgg(s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).option("asOfVersion", "0").load())
      val delta = bucketAgg(s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).option("changesFromVersion", "0").load())
      base.unionAll(delta)
        .groupBy(col("bucket"))
        .agg(sum(col("n")).as("n"), sum(col("sum_id")).as("sum_id"))
    }),

    // Z-order layout meets manifest-stats pruning: a 256x256 grid
    // written range-partitioned by its Morton value, so each part file
    // covers a compact 2-D tile and gets NARROW min/max on BOTH x and
    // y — the Delta/Iceberg OPTIMIZE ZORDER layout. A 32x32 tile
    // predicate (x AND y both selective) then skips most files at
    // planning time on stats alone; under a linear (single-column)
    // layout the same predicate prunes on one dimension only. The
    // kept/total ratio is parsed from the scan's own description and
    // gated inside the result (<= 25% of files read); row math is
    // closed-form. At 100 TB this is the difference between reading a
    // tile and reading a stripe.
    "sink_log_zorder_pruned" -> ((s, d) => {
      val dir = graft.core.ArtifactCache.fixtureScratch("log_zorder", d)
      if (GraftLog.committedFiles(dir).isEmpty)
        s.range(0, 65536)
          .selectExpr("id", "id % 256 AS x", "id DIV 256 AS y")
          .withColumn("zv",
            graft.functions.ZOrder.zValue(col("x"), col("y"), 8))
          .repartitionByRange(16, col("zv"))
          .write.format("graft.sources.GraftLogSource")
          .option("path", dir).mode("overwrite").save()
      val scan = s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .filter(col("x") >= 64L && col("x") < 96L &&
          col("y") >= 64L && col("y") < 96L)
      val desc = scan.queryExecution.executedPlan.toString
      val pruned = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(desc)
        .exists(m => m.group(2).toInt == 16 &&
          m.group(1).toInt * 4 <= m.group(2).toInt)
      scan.agg(count(lit(1)).as("n_rows"), sum(col("id")).as("sum_id"))
        .select(col("n_rows"), col("sum_id"),
          lit(pruned).as("tile_pruned"))
    }),

    // Additive schema evolution on the transactional sink: a second
    // append carries an extra column; the stored schema widens (the new
    // column nullable), pre-evolution rows read NULL for it, and a
    // comparison on the added column SKIPS the pre-evolution file
    // outright at planning time (its rows can never match) — the
    // Delta-mergeSchema contract a long-lived 100 TB table depends on,
    // since production schemas never stand still. Closed-form oracle
    // over both vintages; n_pruned_files pins the evolution-aware skip
    // inside the driver-gated result itself.
    "sink_log_schema_evolution" -> ((s, d) => {
      val dir = graft.core.ArtifactCache.fixtureScratch("log_evolve", d)
      val built = GraftLog.currentVersion(dir) == 1L &&
        GraftLog.storedSchema(dir).exists(_.fieldNames.contains("score"))
      if (!built) {
        wipeDir(dir)
        s.range(0, 1000).selectExpr("id", "id * 2 AS val")
          .coalesce(1)
          .write.format("graft.sources.GraftLogSource")
          .option("path", dir).mode("append").save()
        s.range(1000, 1500)
          .selectExpr("id", "id * 2 AS val", "id * 3 AS score")
          .coalesce(1)
          .write.format("graft.sources.GraftLogSource")
          .option("path", dir).mode("append").save()
      }
      val back = s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
      val prunedScan = back.filter(col("score") >= 3750L)
      val prunedFiles = prunedScan.queryExecution.executedPlan.toString
        .contains("files=1/2")
      back.agg(count(lit(1)).as("n_rows"),
          sum(col("id")).as("sum_id"),
          count(when(col("score").isNull, 1)).as("n_null_score"),
          sum(col("score")).as("sum_score"))
        .crossJoin(prunedScan.agg(count(lit(1)).as("n_hi_score")))
        .select(col("n_rows"), col("sum_id"), col("n_null_score"),
          col("sum_score"), col("n_hi_score"),
          lit(prunedFiles).as("old_file_skipped"))
    }),

    // The version log as a STREAMING SOURCE — the consumption half of
    // the lakehouse streaming story (the sink half is epoch-idempotent
    // streaming writes). A log-to-log pipeline drains the source table
    // with Trigger.AvailableNow through one checkpoint, run twice
    // around a compaction + a fresh append: the resumed run delivers
    // ONLY the appended delta (offsets = table versions, checkpointed
    // like any Spark source), and the compaction's dataChange=false
    // rewrite passes through the feed invisibly — no row is ever
    // delivered twice. The oracle reads the DESTINATION table: an
    // over-delivery (compaction rows re-sent, resume re-reading
    // history) or under-delivery (missed version) lands as a count or
    // sum mismatch. At 100 TB each micro-batch's work is bounded by
    // the append rate, never the table size. Pipeline runs once per
    // session; repeat trials measure the destination read.
    "sink_log_stream_source" -> ((s, d) => {
      val base = graft.core.ArtifactCache.fixtureScratch("log_stream", d)
      val src = s"$base/src"; val dst = s"$base/dst"
      rebuildOnce(streamBuilt, base) {
        val ckpt = s"$base/ckpt"
        def runStream(): Unit = {
          val q = s.readStream.format("graft.sources.GraftLogSource")
            .option("path", src).load()
            .writeStream.format("graft.sources.GraftLogSource")
            .option("path", dst).option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.range(0, 3000).selectExpr("id", "id % 10 AS bucket").coalesce(1)
          .write.format("graft.sources.GraftLogSource")
          .option("path", src).mode("append").save()
        s.range(3000, 5000).selectExpr("id", "id % 10 AS bucket").coalesce(1)
          .write.format("graft.sources.GraftLogSource")
          .option("path", src).mode("append").save()
        runStream()
        GraftLog.compact(src)
        s.range(5000, 6000).selectExpr("id", "id % 10 AS bucket").coalesce(1)
          .write.format("graft.sources.GraftLogSource")
          .option("path", src).mode("append").save()
        runStream()
      }
      s.read.format("graft.sources.GraftLogSource")
        .option("path", dst).load()
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"))
    }),

    // Streaming CDC APPLY — the closing loop of the change-data story:
    // a DERIVED table maintained by streaming the source table's
    // version feed through foreachBatch + copy-on-write MERGE (the
    // Delta "CDC to downstream table" pattern). Run 1 bootstraps the
    // derived table from the initial snapshot; a second source commit
    // carries updates AND inserts; run 2 resumes from the checkpoint,
    // receives exactly the delta, and merges it — latest-wins. The
    // oracle recomputes the final derived state in closed form, so a
    // replayed row, missed update, or dropped insert is a hash miss.
    // At 100 TB per-run work is bounded by the append rate (the
    // version feed), and the merge rewrite by the touched key range
    // (manifest stats) — a derived table maintained at delta cost.
    "sink_log_stream_cdc_apply" -> ((s, d) => {
      val base = graft.core.ArtifactCache.fixtureScratch("log_cdc", d)
      val src = s"$base/src"; val dst = s"$base/dst"
      rebuildOnce(cdcBuilt, base) {
        val ckpt = s"$base/ckpt"
        def runApply(): Unit = {
          val q = s.readStream.format("graft.sources.GraftLogSource")
            .option("path", src).load()
            .writeStream
            .foreachBatch { (batch: DataFrame, _: Long) =>
              if (GraftLog.storedSchema(dst).isEmpty)
                batch.write.format("graft.sources.GraftLogSource")
                  .option("path", dst).mode("append").save()
              else { GraftLog.mergeUpsert(s, dst, batch, "id"); () }
            }
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.range(0, 2000).selectExpr("id", "id AS v").coalesce(1)
          .write.format("graft.sources.GraftLogSource")
          .option("path", src).mode("append").save()
        runApply()
        // the second commit UPDATES [500, 700) and INSERTS [2000, 2500)
        s.range(500, 700).selectExpr("id", "-id AS v")
          .union(s.range(2000, 2500).selectExpr("id", "-id AS v"))
          .coalesce(1)
          .write.format("graft.sources.GraftLogSource")
          .option("path", src).mode("append").save()
        runApply()
      }
      s.read.format("graft.sources.GraftLogSource")
        .option("path", dst).load()
        .agg(count(lit(1)).as("n_rows"),
          sum(col("id")).as("sum_id"), sum(col("v")).as("sum_v"))
    }),

    // Incremental MATERIALIZED aggregate view (IVM for COUNT/SUM):
    // bootstrap materializes `GROUP BY bucket` once, then an appended
    // batch refreshes the view by scanning ONLY the delta's part files
    // (change feed + pickFiles; delta_bounded gates files scanned <
    // source total) and merging per-group deltas into only the view
    // files holding touched groups (merge_bounded). The txn marker
    // rides the merge commit, so a re-refresh with no new source
    // commits is a metadata no-op (noop_skipped) and a crashed refresh
    // can never double-apply a span — the Delta SetTransaction
    // idempotent-writer pattern. The oracle recomputes the view in
    // closed form: a double-applied delta, lost group, or missed
    // combine is a hash miss. At 100 TB: refresh cost = O(append) +
    // O(touched view files), never O(table).
    "sink_log_mv_incremental" -> ((s, d) => {
      val base = graft.core.ArtifactCache.fixtureScratch("log_mv", d)
      val src = s"$base/src"; val mv = s"$base/mv"
      val (deltaBounded, mergeBounded, noopOk) =
        rebuildOnce(mvStats, base) {
          // v0: 3000 rows over 50 buckets, 4-file layout
          s.range(0, 3000).selectExpr("id", "id % 50 AS bucket",
              "id AS v")
            .repartition(4)
            .write.format("graft.sources.GraftLogSource")
            .option("path", src).mode("append").save()
          val r0 = MaterializedAgg.refresh(s, src, mv, "bucket",
            Seq("v"), minMaxCols = Seq("v"))
          // the delta touches only buckets 0..9
          s.range(3000, 3500).selectExpr("id", "id % 10 AS bucket",
              "id AS v")
            .coalesce(1)
            .write.format("graft.sources.GraftLogSource")
            .option("path", src).mode("append").save()
          val r1 = MaterializedAgg.refresh(s, src, mv, "bucket",
            Seq("v"), minMaxCols = Seq("v"))
          val r2 = MaterializedAgg.refresh(s, src, mv, "bucket",
            Seq("v"), minMaxCols = Seq("v"))
          (r0.mode == "bootstrap" && r1.mode == "incremental" &&
             r1.deltaFiles == 1 && r1.deltaFiles < r1.srcFilesTotal,
           r1.rewrittenMvFiles < r1.mvFilesTotal,
           r2.mode == "noop" && r2.deltaFiles == 0)
        }
      s.read.format("graft.sources.GraftLogSource")
        .option("path", mv).load()
        .select(col("bucket"), col("n_rows"), col("sum_v"),
          col("min_v"), col("max_v"),
          lit(deltaBounded).as("delta_bounded"),
          lit(mergeBounded).as("merge_bounded"),
          lit(noopOk).as("noop_skipped"))
    }),

    // The TYPED change data feed (the Delta _change_data design):
    // with `graft.cdf.enabled=true`, row-level operations publish CDC
    // sidecar files in the SAME commit as their rewrite, so the feed
    // carries exact per-row change types — update pre/post images and
    // deletes the append-only listing could never express, and NEVER
    // the carried rows a rewrite re-delivers. The aggregate below is
    // fully closed-form: 100 updates (pre+post), 50 inserts, 100
    // range-deletes over a known id layout.
    "sink_log_cdf_typed" -> ((s, d) => {
      val dir = ensureCdfTypedFixture(s, d)
      GraftLog.typedChanges(s, dir, fromVersion = 0L)
        .groupBy(col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
          sum(col("v")).as("sum_v"))
        .select(col("change_type"), col("n"), col("sum_id"),
          col("sum_v"))
    }),

    // The STREAMING typed change feed (Delta's streaming
    // readChangeFeed): the same typed plan served as micro-batches on
    // the version-offset axis — a continuous consumer follows
    // updates, inserts, AND deletes with exactly-once checkpointed
    // offsets, where the adds-only stream source could never express
    // a delete. Drained with Trigger.AvailableNow into a sink table,
    // then gated against the SAME closed forms as the batch feed —
    // stream == batch on the shared fixture.
    "sink_log_stream_cdf_typed" -> ((s, d) => {
      val dir = ensureCdfTypedFixture(s, d)
      val base =
        graft.core.ArtifactCache.fixtureScratch("log_cdfstream", d)
      val sink = s"$base/sink"
      rebuildOnce(cdfStreamBuilt, base) {
        val q = GraftLog.typedChangesStream(s, dir, fromVersion = 0L)
          .writeStream.format("graft.sources.GraftLogSource")
          .option("path", sink)
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(org.apache.spark.sql.streaming
            .Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
        true
      }
      s.read.format("graft.sources.GraftLogSource")
        .option("path", sink).load()
        .groupBy(col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
          sum(col("v")).as("sum_v"))
        .select(col("change_type"), col("n"), col("sum_id"),
          col("sum_v"))
    }),

    // The snapshot-DIFF changelog (Iceberg create_changelog_view with
    // compute_updates): the SAME typed changes recovered with NO
    // sidecars, by a key-based full-outer diff of the two snapshots —
    // the retroactive path that covers writers the sidecar feed
    // cannot (SQL UPDATE/MERGE ride Spark's replace-data plan). On
    // this fixture each key changes at most once, so the key-NET diff
    // equals the per-version sidecar feed exactly — one oracle, two
    // independent mechanisms.
    "sink_log_changelog_diff" -> ((s, d) => {
      import graft.sources.Replication
      val dir = ensureCdfTypedFixture(s, d)
      Replication.changesByDiff(s, dir, "id", 0L,
          GraftLog.currentVersion(dir))
        .groupBy(col("_change_type").as("change_type"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
          sum(col("v")).as("sum_v"))
        .select(col("change_type"), col("n"), col("sum_id"),
          col("sum_v"))
    }),

    // Replication over the typed feed: a mirror table follows the
    // source through a merge (updates + inserts) and a range delete,
    // applied per committed version at delta cost — the CDF
    // downstream-sync pattern. Gated booleans: bootstrap then
    // incremental modes, and the mirror is row-identical to the
    // source after the sync (exceptAll both ways, test-scale
    // scaffolding).
    "sink_log_replica_sync" -> ((s, d) => {
      import graft.sources.Replication
      val base = graft.core.ArtifactCache.fixtureScratch("log_repl", d)
      val src = s"$base/src"; val dst = s"$base/dst"
      val (modesOk, identicalOk) = rebuildOnce(replStats, base) {
        s.range(0, 1000).selectExpr("id", "id AS v").coalesce(2)
          .write.format("graft.sources.GraftLogSource")
          .option("path", src).mode("append").save()
        GraftLog.setProperties(src, Map("graft.cdf.enabled" -> "true"))
        val s0 = Replication.sync(s, src, dst, "id")
        GraftLog.mergeUpsert(s, src, s.range(0, 20)
          .selectExpr("id", "id + 50000 AS v")
          .union(s.range(5000, 5030).selectExpr("id", "id AS v")),
          "id")
        GraftLog.deleteRange(s, src, "id", 100L, 140L)
        val s1 = Replication.sync(s, src, dst, "id")
        (s0.mode == "bootstrap" && s1.mode == "incremental" &&
           s1.versionsApplied == 2,
         Replication.identical(s, src, dst))
      }
      s.read.format("graft.sources.GraftLogSource")
        .option("path", dst).load()
        .agg(count(lit(1)).as("n_rows"), sum(col("id")).as("sum_id"),
          sum(col("v")).as("sum_v"))
        .select(col("n_rows"), col("sum_id"), col("sum_v"),
          lit(modesOk).as("modes_ok"),
          lit(identicalOk).as("mirror_identical"))
    }),

    // Incremental materialized view with APPROXIMATE COUNT DISTINCT:
    // exact distinct is the classic non-incremental aggregate (its
    // state is the full value set), but the view stores a 512-byte
    // mergeable HLL sketch per group (zero-run hex in a plain string
    // column), so each refresh folds ONLY the delta's sketches in —
    // O(append) work. Gated booleans: refreshes scan only appended
    // files, and the maintained sketch is BIT-IDENTICAL to a direct
    // sketch of the full source (the lossless-union law) — the
    // in-bound NDV check rides per row. At 100 TB this is "distinct
    // users per segment, always fresh" without ever rescanning.
    "sink_log_mv_distinct" -> ((s, d) => {
      import graft.functions.HllSketchStr
      val base = graft.core.ArtifactCache.fixtureScratch("log_mvd", d)
      val src = s"$base/src"; val mv = s"$base/mv"
      val (incBounded, lossless) = rebuildOnce(mvDistinctStats, base) {
        s.range(0, 3000).selectExpr("id", "id % 20 AS bucket",
            "(id * 7) % 400 AS u", "id AS v")
          .repartition(4)
          .write.format("graft.sources.GraftLogSource")
          .option("path", src).mode("append").save()
        MaterializedAgg.refresh(s, src, mv, "bucket", Seq("v"),
          distinctCols = Seq("u"))
        s.range(3000, 3500).selectExpr("id", "id % 20 AS bucket",
            "(id * 7) % 400 AS u", "id AS v")
          .coalesce(1)
          .write.format("graft.sources.GraftLogSource")
          .option("path", src).mode("append").save()
        val r1 = MaterializedAgg.refresh(s, src, mv, "bucket",
          Seq("v"), distinctCols = Seq("u"))
        val direct = s.read.format("graft.sources.GraftLogSource")
          .option("path", src).load()
          .groupBy(col("bucket"))
          .agg(HllSketchStr.toColumn(col("u").cast("string"))
            .as("hll_direct"))
        val same = s.read.format("graft.sources.GraftLogSource")
          .option("path", mv).load()
          .join(direct, "bucket")
          .select((col("hll_u") === col("hll_direct")).as("same"))
          .collect().forall(_.getBoolean(0))
        (r1.mode == "incremental" && r1.deltaFiles == 1, same)
      }
      val exact = s.read.format("graft.sources.GraftLogSource")
        .option("path", src).load()
        .groupBy(col("bucket"))
        .agg(countDistinct(col("u")).as("n_users_exact"))
      s.read.format("graft.sources.GraftLogSource")
        .option("path", mv).load()
        .join(exact, "bucket")
        .select(col("bucket"), col("n_rows"), col("sum_v"),
          col("n_users_exact"),
          (abs(HllSketchStr.estimate(col("hll_u")) -
              col("n_users_exact")) /
            col("n_users_exact") <= 0.15).as("ndv_in_bound"),
          lit(incBounded).as("delta_bounded"),
          lit(lossless).as("sketch_lossless"))
    }),

    // Metadata-only COUNT(*): the manifest's per-file row counts ARE
    // the answer — the pushed-down aggregate plans a one-row scan that
    // never opens a data file (`metaCount=` in the scan description,
    // gated inside the result). The same counts feed `t$files` and the
    // scan's pruning denominators, so this query cross-checks the
    // statistics spine of the whole format. At 100 TB this is the
    // difference between a catalog lookup and a full table scan for
    // the most common query a pipeline runs.
    "sink_log_count_meta" -> ((s, d) => {
      // reuse the pruned fixture table (50k rows, range layout)
      val dir = ensurePrunedSeries(s, d)
      val cnt = s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .agg(count(lit(1)).as("n_rows"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      val metaOnly = cnt.queryExecution.executedPlan.toString
        .contains("metaCount=50000")
      cnt.select(col("n_rows"), col("min_id"), col("max_id"),
        lit(metaOnly).as("meta_only"))
    }),

    // Copy-on-write MERGE (Delta MERGE INTO in miniature): an update
    // batch upserts into a range-layout table, and the manifest stats
    // double as the merge's file-targeting index — only files whose
    // [min, max] can contain a matched key rewrite (bounded_rewrite
    // gates <= half the files), and a second, purely-out-of-range
    // insert batch rewrites ZERO files (pure_insert_rewrites). The
    // oracle recomputes the final table from closed form, so a lost
    // carried row, a missed update, or a dropped insert is a hash
    // miss; the pre-merge snapshot stays time-travelable. At 100 TB
    // this bounds MERGE write amplification to the touched key range —
    // the property that makes daily upserts affordable. Merges run
    // once per session; repeat trials measure the merged read.
    "sink_log_merge_cow" -> ((s, d) => {
      val dir = graft.core.ArtifactCache.fixtureScratch("log_merge", d)
      val (r1, t1, r2) = rebuildOnce(mergeStats, dir) {
        s.range(0, 40000).selectExpr("id", "id AS v")
          .repartitionByRange(8, col("id"))
          .write.format("graft.sources.GraftLogSource")
          .option("path", dir).mode("overwrite").save()
        val upd = s.range(10000, 12000).selectExpr("id", "-id AS v")
        val (ru, tu) = GraftLog.mergeUpsert(s, dir, upd, "id")
        val ins = s.range(40000, 41000).selectExpr("id", "-id AS v")
        val (ri, _) = GraftLog.mergeUpsert(s, dir, ins, "id")
        (ru, tu, ri)
      }
      s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .agg(count(lit(1)).as("n_rows"),
          sum(col("v")).as("sum_v"),
          sum(col("id")).as("sum_id"))
        .select(col("n_rows"), col("sum_v"), col("sum_id"),
          lit(r1 > 0 && r1 * 2 <= t1).as("bounded_rewrite"),
          lit(r2 == 0).as("pure_insert_rewrites_zero"))
    }),

    // SQL DML on the custom format: `DELETE FROM` through the catalog
    // lands in the copy-on-write deleteWhere (SupportsDelete) — the
    // manifest stats bound the rewrite to the files the predicate can
    // touch, and the `t$files` listing exposes exactly how many files
    // the delete retired (n_removes, gated <= 2 of the 4-file range
    // layout). Re-running the DELETE is a no-op: the rewritten file's
    // refreshed stats no longer overlap the predicate. The oracle
    // recomputes the surviving rows from closed form.
    "sql_catalog_delete" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/del_t"
      ensureBuilt(dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.del_t")
        s.sql("CREATE TABLE graftq.ns.del_t (id BIGINT, v BIGINT)")
        s.sql("""INSERT INTO graftq.ns.del_t
                 SELECT /*+ REPARTITION_BY_RANGE(4, id) */ id, id * 2
                 FROM range(0, 20000)""")
        s.sql("""DELETE FROM graftq.ns.del_t
                 WHERE id >= 2000 AND id < 3000""")
      }
      s.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(id) AS BIGINT) AS sum_id,
               CAST(SUM(v) AS BIGINT) AS sum_v,
               (SELECT COUNT(*) <= 2 FROM graftq.ns.`del_t$files`
                WHERE action = 'remove') AS bounded_rewrite
        FROM graftq.ns.del_t""")
    }),

    // SQL UPDATE through the catalog: Spark rewrites it into a
    // group-based copy-on-write ReplaceData plan over the table's
    // RowLevelOperation, and the manifest stats bound the rewrite the
    // same way they bound MERGE — the pushed condition reaches the COW
    // scan as a GROUP filter, so only the files whose [min, max] can
    // hold a touched id rewrite (gated: <= 2 removes of the 4-file
    // range layout). The oracle recomputes the updated table from
    // closed form; the pre-update snapshot stays time-travelable. At
    // 100 TB this is the difference between an UPDATE that rewrites
    // the table and one that rewrites the touched key range.
    "sql_catalog_update" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/upd_t"
      ensureBuilt(dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.upd_t")
        s.sql("CREATE TABLE graftq.ns.upd_t (id BIGINT, v BIGINT)")
        s.sql("""INSERT INTO graftq.ns.upd_t
                 SELECT /*+ REPARTITION_BY_RANGE(4, id) */ id, id * 2
                 FROM range(0, 20000)""")
        s.sql("""UPDATE graftq.ns.upd_t SET v = -v
                 WHERE id >= 2000 AND id < 3000""")
      }
      s.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(id) AS BIGINT) AS sum_id,
               CAST(SUM(v) AS BIGINT) AS sum_v,
               (SELECT COUNT(*) <= 2 FROM graftq.ns.`upd_t$files`
                WHERE action = 'remove') AS bounded_rewrite
        FROM graftq.ns.upd_t""")
    }),

    // SQL MERGE INTO through the catalog — the full three-clause Delta
    // contract driven from plain SQL: matched rows update, unmatched
    // source rows insert, and target rows absent from the source
    // delete (condition-gated). The whole merge publishes as ONE
    // atomic version via the same group-based ReplaceData path as
    // UPDATE. The oracle recomputes the post-merge table from closed
    // form, so a lost carried row, missed update, dropped insert, or
    // over-eager by-source delete is a hash miss.
    "sql_catalog_merge" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/mrg_t"
      ensureBuilt(dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.mrg_t")
        s.sql("CREATE TABLE graftq.ns.mrg_t (id BIGINT, v BIGINT)")
        s.sql("""INSERT INTO graftq.ns.mrg_t
                 SELECT /*+ REPARTITION_BY_RANGE(4, id) */ id, id
                 FROM range(0, 10000)""")
        s.sql("""
          MERGE INTO graftq.ns.mrg_t t
          USING (SELECT id, -id AS v FROM range(9000, 11000)) s
          ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET v = s.v
          WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
          WHEN NOT MATCHED BY SOURCE AND t.id < 500 THEN DELETE""")
      }
      s.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(id) AS BIGINT) AS sum_id,
               CAST(SUM(v) AS BIGINT) AS sum_v
        FROM graftq.ns.mrg_t""")
    }),

    // `_file` metadata column (Delta `_metadata.file_path` in
    // miniature): every row maps to its manifest part file, served by
    // the reader from partition state — no I/O, no storage, hidden
    // from SELECT *. On the range-layout fixture the per-file id spans
    // are disjoint, so span == count for every file — the layout audit
    // a 100 TB pipeline runs to verify its clustering before relying
    // on stats pruning, expressed as an ordinary GROUP BY _file.
    "sink_log_file_meta" -> ((s, d) => {
      val dir = ensurePrunedSeries(s, d)
      s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .select(col("id"), col("_file"))
        .groupBy(col("_file"))
        .agg(count(lit(1)).as("n"),
          (max(col("id")) - min(col("id")) + 1).as("span"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("n")).as("n_rows"),
          (sum(when(col("span") === col("n"), 0L).otherwise(1L)) === 0)
            .as("files_disjoint"))
    }),

    // SQL stored procedures (Iceberg `CALL catalog.system.proc` on
    // Spark 4's ProcedureCatalog API): table maintenance driven from
    // plain SQL — compact 3 small parts into 1, restore the
    // pre-compaction snapshot as new auditable history, then an
    // expire-history vacuum reclaims the now-unreferenced compacted
    // part. Each CALL returns a one-row result with the file counts a
    // scheduler logs, gated here against closed form; the oracle also
    // recomputes the table, so any maintenance op corrupting data is a
    // hash miss. At 100 TB these run daily per table from an
    // orchestrator speaking SQL — the reason every lakehouse format
    // grew a procedure surface.
    "sql_catalog_call_maintenance" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/call_t"
      val (nc, rm, ra, nv) = rebuildOnce(callStats, dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.call_t")
        s.sql("CREATE TABLE graftq.ns.call_t (id BIGINT)")
        (0 until 3).foreach(i => s.sql(
          s"""INSERT INTO graftq.ns.call_t
              SELECT /*+ REPARTITION(1) */ id
              FROM range(${i * 1000}, ${i * 1000 + 1000})"""))
        val c = s.sql(
          "CALL graftq.system.compact(table => 'ns.call_t')")
          .head.getInt(0)
        val r = s.sql(
          "CALL graftq.system.restore(table => 'ns.call_t', version => 2)")
          .head
        val v = s.sql(
          """CALL graftq.system.vacuum(table => 'ns.call_t',
             min_age_ms => 0, expire_history => true)""")
          .head.getInt(0)
        (c, r.getInt(0), r.getInt(1), v)
      }
      s.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(id) AS BIGINT) AS sum_id
        FROM graftq.ns.call_t""")
        .selectExpr("n_rows", "sum_id",
          s"$nc AS files_compacted", s"$rm AS restore_removed",
          s"$ra AS restore_readded", s"$nv AS vacuum_deleted")
    }),

    // SQL views on the custom catalog: vanilla Spark 4.1 has the
    // ViewCatalog connector API but NO analyzer path that calls it
    // (ResolveSessionCatalog rejects every view command aimed at a
    // non-session catalog) — the library ships the missing wiring as a
    // Hints-batch extension rule, the same approach Iceberg takes.
    // A view is a stored QUERY re-resolved at read time: the second
    // INSERT lands after the view exists and still shows through —
    // the governance property that lets a curated interface evolve
    // without rewriting a byte of data. Closed-form oracle.
    "sql_catalog_view" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/vbase"
      ensureBuilt(dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.vbase")
        s.sql("CREATE TABLE graftq.ns.vbase (id BIGINT, v BIGINT)")
        s.sql("""INSERT INTO graftq.ns.vbase
                 SELECT /*+ REPARTITION(2) */ id, id * 3
                 FROM range(0, 4000)""")
        s.sql("""CREATE OR REPLACE VIEW graftq.ns.v_even AS
                 SELECT id, v FROM graftq.ns.vbase WHERE id % 2 = 0""")
        s.sql("""INSERT INTO graftq.ns.vbase
                 SELECT /*+ REPARTITION(1) */ id, id * 3
                 FROM range(4000, 5000)""")
      }
      s.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(id) AS BIGINT) AS sum_id,
               CAST(SUM(v) AS BIGINT) AS sum_v
        FROM graftq.ns.v_even""")
    }),

    // CHECK constraints on the custom format (Delta's constraint
    // surface): ALTER TABLE ADD CONSTRAINT stores the predicate in the
    // table metadata, the table reports it ENFORCED through
    // Table.constraints(), and SPARK ITSELF injects the violation
    // check into every subsequent write plan — the engine enforces,
    // the format only remembers. The fixture proves the loop: a
    // violating INSERT throws and leaves no trace (manifest-gated
    // atomicity), a conforming one lands; the oracle recomputes the
    // final table, so a leaked violating row is a hash miss. At 100 TB
    // this is the write-time data contract that keeps a curated table
    // trustworthy without audit scans.
    "sql_catalog_constraint" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/ck_t"
      val rejected = rebuildOnce(ckStats, dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.ck_t")
        s.sql("CREATE TABLE graftq.ns.ck_t (id BIGINT, v BIGINT)")
        s.sql("""INSERT INTO graftq.ns.ck_t
                 SELECT /*+ REPARTITION(2) */ id, id FROM range(0, 3000)""")
        s.sql("""ALTER TABLE graftq.ns.ck_t
                 ADD CONSTRAINT v_nonneg CHECK (v >= 0)""")
        val r = try {
          s.sql("""INSERT INTO graftq.ns.ck_t
                   SELECT id, -1 FROM range(0, 10)""")
          false
        } catch { case _: Exception => true }
        s.sql("""INSERT INTO graftq.ns.ck_t
                 SELECT /*+ REPARTITION(1) */ id, id
                 FROM range(3000, 3500)""")
        r
      }
      s.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(id) AS BIGINT) AS sum_id,
               CAST(SUM(v) AS BIGINT) AS sum_v
        FROM graftq.ns.ck_t""")
        .selectExpr("n_rows", "sum_id", "sum_v",
          s"$rejected AS violation_rejected")
    }),

    // Column DEFAULT values: `v BIGINT DEFAULT 42` rides the schema's
    // field metadata (which the format's schema JSON persists
    // byte-for-byte) and Spark fills omitted columns engine-side at
    // INSERT — the catalog only announces the capability. Inserts
    // omitting v, passing it, and naming DEFAULT explicitly all land;
    // closed-form oracle.
    "sql_catalog_default" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/def_t"
      ensureBuilt(dir) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.def_t")
        s.sql(
          "CREATE TABLE graftq.ns.def_t (id BIGINT, v BIGINT DEFAULT 42)")
        s.sql("""INSERT INTO graftq.ns.def_t (id)
                 SELECT /*+ REPARTITION(1) */ id FROM range(0, 2000)""")
        s.sql("""INSERT INTO graftq.ns.def_t
                 SELECT /*+ REPARTITION(1) */ id, id * 5
                 FROM range(2000, 2500)""")
        s.sql("INSERT INTO graftq.ns.def_t (id, v) VALUES (9000, DEFAULT)")
      }
      s.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(id) AS BIGINT) AS sum_id,
               CAST(SUM(v) AS BIGINT) AS sum_v,
               CAST(COUNT(CASE WHEN v = 42 THEN 1 END) AS BIGINT)
                 AS n_default
        FROM graftq.ns.def_t""")
    }),

    // SQL DDL schema evolution: ALTER TABLE ADD COLUMN widens the
    // stored schema (new column nullable), pre-alter rows read NULL,
    // and a post-alter INSERT populates it — the full DDL lifecycle of
    // a long-lived table driven from plain SQL against the custom
    // catalog. Closed-form oracle over both vintages.
    "sql_catalog_alter_add_col" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/alter_t"
      val evolved = GraftLog.storedSchema(dir)
        .exists(_.fieldNames.contains("score"))
      if (!evolved) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.alter_t")
        s.sql("CREATE TABLE graftq.ns.alter_t (id BIGINT)")
        s.sql("""INSERT INTO graftq.ns.alter_t
                 SELECT /*+ REPARTITION(1) */ id FROM range(0, 1000)""")
        s.sql("ALTER TABLE graftq.ns.alter_t ADD COLUMN score BIGINT")
        s.sql("""INSERT INTO graftq.ns.alter_t
                 SELECT /*+ REPARTITION(1) */ id, id * 3
                 FROM range(1000, 1500)""")
      }
      s.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(id) AS BIGINT) AS sum_id,
               CAST(COUNT(CASE WHEN score IS NULL THEN 1 END) AS BIGINT)
                 AS n_null_score,
               CAST(SUM(score) AS BIGINT) AS sum_score
        FROM graftq.ns.alter_t""")
    }),

    // Commit-timestamped history + TIMESTAMP AS OF time travel: every
    // publish stamps its manifest entries with a strictly-monotone
    // wall-clock, `t$history` exposes one row per version, and a
    // `TIMESTAMP AS OF <ts-of-v0>` read resolves to snapshot 0 — the
    // audit-and-as-of surface (Delta DESCRIBE HISTORY) a regulated
    // 100 TB pipeline queries daily. Wall-clock values are
    // nondeterministic, so the driver-checked result carries only
    // their INVARIANTS: per-version add/row counts, stamp
    // monotonicity, and the as-of resolution landing on the right
    // snapshot.
    "sql_catalog_history" -> ((s, d) => {
      val dir = ensureCatalogSeries(s, d)
      val ts0 = GraftLog.versionTimestamps(dir).head._2
      val zone = java.time.ZoneId.of(
        s.conf.get("spark.sql.session.timeZone"))
      val lit0 = java.time.Instant.ofEpochMilli(ts0).atZone(zone)
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      // predecessor stamp via a broadcast self-join over the O(commit)
      // history rows, not LAG OVER (ORDER BY ...): Spark plans the
      // empty-partition window single-partition and warns on every
      // run, and the noise is indistinguishable from a genuine
      // data-sized window funnel (same hygiene as SmallFrames)
      val hist = s.sql(s"""
        SELECT version, n_adds, rows_added, ts_millis
        FROM graftq.ns.`series$$history`""")
      val prev = hist.select(col("version").as("__v"),
        col("ts_millis").as("__ts"))
      val travel = s.sql(s"""
        SELECT (SELECT COUNT(*) FROM graftq.ns.series
                TIMESTAMP AS OF '$lit0') = 4000 AS ts_travel_v0""")
      hist.join(broadcast(prev), col("__v") < col("version"), "left")
        .groupBy(hist.columns.map(col): _*)
        .agg(coalesce(max(col("__ts")), lit(0L)).as("__prev"))
        .crossJoin(broadcast(travel))
        .select(col("version"), col("n_adds"), col("rows_added"),
          (col("ts_millis") >= col("__prev")).as("ts_monotone"),
          col("ts_travel_v0"))
    }),

    // RESTORE to a historical version: a new commit whose live set
    // equals the target snapshot — later files removed, since-retired
    // files re-added — so the rollback is itself ordinary, auditable
    // history (the mistaken version stays time-travelable; restore is
    // a redo of an old state, not an undo of the log). The recovery
    // story every production lake eventually needs after a bad load.
    // Oracle: the restored table equals insert 1 alone, while
    // VERSION AS OF 1 still reads both inserts.
    "sql_catalog_restore" -> ((s, d) => {
      val wh = catalogWarehouse(s, d)
      val dir = s"$wh/ns/rest_t"
      if (GraftLog.currentVersion(dir) != 2L) {
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
        s.sql("DROP TABLE IF EXISTS graftq.ns.rest_t")
        s.sql("CREATE TABLE graftq.ns.rest_t (id BIGINT)")
        s.sql("""INSERT INTO graftq.ns.rest_t
                 SELECT /*+ REPARTITION(1) */ id FROM range(0, 2000)""")
        s.sql("""INSERT INTO graftq.ns.rest_t
                 SELECT /*+ REPARTITION(1) */ id FROM range(2000, 5000)""")
        GraftLog.restore(dir, 0L)
      }
      s.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(id) AS BIGINT) AS sum_id,
               (SELECT COUNT(*) FROM graftq.ns.rest_t VERSION AS OF 1)
                 AS n_v1
        FROM graftq.ns.rest_t""")
    }),

    // Manifest statistics driving the OPTIMIZER: a 25-row graft-log
    // dimension joined to the customer fact. The scan reports
    // rows/bytes from the manifest (SupportsReportStatistics), so
    // Catalyst auto-BROADCASTS the dim side — no hint, no shuffle of
    // the fact table (auto_broadcast gate parses the executed plan).
    // Without stats a DSv2 source defaults to "unknown = huge" and
    // every join pays an exchange; at 100 TB this single integration
    // decides whether dimension joins move gigabytes or kilobytes.
    "sink_log_broadcast_join" -> ((s, d) => {
      val dir = graft.core.ArtifactCache.fixtureScratch("log_dim", d)
      if (GraftLog.committedFiles(dir).isEmpty)
        s.range(0, 25).selectExpr("id AS n_key", "id % 5 AS grp")
          .coalesce(1)
          .write.format("graft.sources.GraftLogSource")
          .option("path", dir).mode("overwrite").save()
      val dim = s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
      val q = Tables.customer(s, d)
        .join(dim, col("c_nationkey") === col("n_key"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("sum_bal"))
      val bc = q.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin")
      q.select(col("grp"), col("n_cust"), col("sum_bal"),
        lit(bc).as("auto_broadcast"))
    }),

    // Storage-partitioned join: two graft-log tables identity-
    // partitioned on the same key join with ZERO exchange — each
    // table's scan reports KeyGroupedPartitioning from its manifest
    // partition records (one file group per value, `partitionKey` on
    // the input partition), so Catalyst aligns the groups instead of
    // shuffling either side; the group-by on the partition key rides
    // the same distribution exchange-free. This is the bucketed-join
    // contract delivered BY THE FORMAT: at 100 TB, co-locating a fact
    // and its enrichment table by key at WRITE time deletes the
    // dominant shuffle from every downstream join. The spj_no_shuffle
    // gate parses the executed plan; the oracle replays the join in
    // closed form.
    "sink_log_spj_join" -> ((s, d) => {
      val base = graft.core.ArtifactCache.fixtureScratch("log_spj", d)
      val fa = s"$base/fact"; val di = s"$base/dim"
      ensureSpjFact(s, fa)
      // built independently of the fact: another query
      // (sink_log_groupby_meta) shares and may have built the fact
      // first, and a cached fact must not mask a missing dim
      if (!spjReady(di))
        s.range(0, 1600).selectExpr("id * 2 AS w", "id % 16 AS k")
          .write.format("graft.sources.GraftLogSource")
          .option("path", di).option("partitionCol", "k")
          .mode("overwrite").save()
      // storage-partitioned joins are gated by this conf (off by
      // default for compatibility); set it for THIS query only — the
      // 16-group result and plan-shape gate materialize under it, then
      // the prior value is restored so bench order can't matter
      withConfMaterialized(s,
          "spark.sql.sources.v2.bucketing.enabled", "true") {
        val fact = s.read.format("graft.sources.GraftLogSource")
          .option("path", fa).load()
        val dim = s.read.format("graft.sources.GraftLogSource")
          .option("path", di).load().hint("merge")
        val j = fact.join(dim, "k")
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
            sum(col("w")).as("sum_w"))
        val plan = j.queryExecution.executedPlan.toString
        val spj = (plan.contains("SortMergeJoin") ||
          plan.contains("ShuffledHashJoin")) && !plan.contains("Exchange")
        j.select(col("k"), col("n"), col("sum_id"), col("sum_w"),
          lit(spj).as("spj_no_shuffle"))
      }
    }),

    // Table-valued function over the custom DSv2 source: the extension
    // registers `graft_series(n[, slices])` so the source is
    // addressable from plain SQL, and the relation it resolves to is
    // the SAME SeriesTable the reader API builds — filter-driven slice
    // pruning and column pruning apply identically (SeriesSourceSpec
    // pins the pruning; the oracle pins the values).
    // Splittable gcol payload driven end to end: ONE half-million-row
    // part file written with small blocks, read under a 1 MB split
    // size. Read parallelism must come from BYTE RANGES, not file
    // counts (gated: >1 planned task over the single file), and the
    // ranged read must be byte-identical to the whole-file read — the
    // "a 10 GB part must not serialize into one task" contract at
    // bench scale. The oracle replays the aggregate in closed form.
    "sink_log_split_parallel" -> ((s, d) => {
      val dir = ensureGcolBigPart(s, d)
      withConfMaterialized(s, "spark.graft.log.splitBytes",
          (1L << 20).toString) {
        val df = s.read.format("graft.sources.GraftLogSource")
          .option("path", dir).load()
        val tasks = df.rdd.getNumPartitions
        df.groupBy((col("id") % 13).as("bucket"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
          .select(col("bucket"), col("n"), col("sum_v"),
            lit(tasks > 1).as("fanned_out"))
      }
    }),

    // Dictionary-encoded categorical column driven end to end under
    // the oracle: `tag` has 7 distinct values, so every block of the
    // shared big part stores it as a dict + u8 indices (gated from
    // the footer), and the grouped aggregate over the DICT DECODE
    // path must be byte-identical to the closed-form replay. The
    // parquet-dictionary-page contract, delivered by the format.
    "sink_log_dict_groupby" -> ((s, d) => {
      val dir = ensureGcolBigPart(s, d)
      val part = GraftLog.entriesAsOf(dir, Long.MaxValue).head.file
      val footer = GraftColFile.readFooter(new java.io.File(dir, part))
      val tagIdx = footer.cols.indexOf("tag")
      val allDict = tagIdx >= 0 &&
        footer.blocks.forall(_.encOf(tagIdx) == 1)
      s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
        .select(col("tag"), col("n"), col("sum_v"),
          lit(allDict).as("dict_encoded"))
    }),

    // Block-stats skipping INSIDE one file: the footer's per-block
    // min/max admit only the blocks overlapping a narrow id range
    // (gated from the footer itself: admitted < total), and the
    // filtered aggregate is exact — parquet row-group pruning,
    // delivered by the format. At 100 TB this is the difference
    // between decompressing one block and decompressing a 10 GB part
    // to serve a point-range query.
    "sink_log_block_skip" -> ((s, d) => {
      val dir = ensureGcolBigPart(s, d)
      val part = GraftLog.entriesAsOf(dir, Long.MaxValue).head.file
      val footer = GraftColFile.readFooter(new java.io.File(dir, part))
      val admitted = footer.blocks.count(_.stats.get("id").exists {
        case (mn, mx) => mx.toLong >= 100000L && mn.toLong < 101000L })
      val df = s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .filter(col("id") >= 100000L && col("id") < 101000L)
      df.agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .select(col("n"), col("sum_v"), col("min_id"), col("max_id"),
          lit(admitted < footer.blocks.size && admitted > 0)
            .as("blocks_skipped"))
    }),

    "sql_tvf_series" -> ((s, _) => {
      s.sql("""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(id) AS BIGINT) AS sum_id
        FROM graft_series(12345, 8)
        WHERE id >= 12000""")
    }),

    // Partition-grouped METADATA aggregate: GROUP BY the identity
    // partition column folds per-group COUNT/MIN/MAX from each value's
    // manifest entries — one row per partition, ZERO data files opened
    // (`metaGroups=` in the scan description, gated in the result).
    // The partition-level dashboard query every warehouse serves from
    // its catalog; at 100 TB the difference between a manifest read
    // and a full scan. Reuses the SPJ fact fixture (16 values).
    "sink_log_groupby_meta" -> ((s, d) => {
      val fa = graft.core.ArtifactCache.fixtureScratch("log_spj", d) + "/fact"
      ensureSpjFact(s, fa)
      val g = s.read.format("graft.sources.GraftLogSource")
        .option("path", fa).load()
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
      val metaOnly = g.queryExecution.executedPlan.toString
        .contains("metaGroups=16")
      g.select(col("k"), col("n"), col("min_id"), col("max_id"),
        lit(metaOnly).as("meta_only"))
    }),

    // CAPSTONE composition — the corpus pipeline TO the lakehouse
    // format: quality-filter documents, exact-dedup on text (keep the
    // lowest doc_id, count the duplicates), ingest the curated set
    // into a range-layout graft-log table ONCE, then serve an
    // analytical read whose doc_id predicate skips files on manifest
    // stats (kept/total gated inside the result) and whose per-lang
    // rollup the oracle replays from the raw parquet. This is the
    // shape of a real training-data refinery: curation writes a
    // governed, time-travelable table; consumers read pruned slices,
    // never the raw corpus. Ingest runs once per session+fixture;
    // repeat trials measure the pruned read.
    "corpus_lakehouse_e2e" -> ((s, d) => {
      val dir = graft.core.ArtifactCache.fixtureScratch("lakehouse", d)
      if (GraftLog.committedFiles(dir).isEmpty)
        Tables.documents(s, d)
          .filter(length(col("text")) >= 100)
          .groupBy(col("text"))
          .agg(min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_dups"),
            min(col("lang")).as("lang"))
          .select(col("doc_id"), col("lang"), col("n_dups"),
            length(col("text")).cast("bigint").as("n_chars"))
          .repartitionByRange(8, col("doc_id"))
          .write.format("graft.sources.GraftLogSource")
          .option("path", dir).mode("overwrite").save()
      // the cut is a fixture constant: derive it ONCE per session
      // (an eager full-scan MAX per trial would sit inside the timed
      // region the comment above promises is "the pruned read")
      val cut = lakehouseCut.getOrElseUpdate(d,
        Tables.documents(s, d)
          .agg(max(col("doc_id"))).head.getLong(0) / 4)
      val slice = s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .filter(col("doc_id") <= cut)
      val pruned = "files=(\\d+)/(\\d+)".r
        .findFirstMatchIn(slice.queryExecution.executedPlan.toString)
        .exists(m => m.group(1).toInt < m.group(2).toInt)
      slice.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_dups")).as("n_raw_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .select(col("lang"), col("n_docs"), col("n_raw_docs"),
          col("sum_chars"), lit(pruned).as("slice_pruned"))
    }),

    // OPTIMIZE ZORDER as MAINTENANCE on live data (Delta `OPTIMIZE ...
    // ZORDER BY` in miniature): the table ingests in id order, so
    // every part file carries the full x range and scattered y values
    // — a 2-D tile predicate must read all 16 files (before_full
    // gate). One optimizeZorder pass rewrites the same rows
    // range-partitioned by the Morton interleave, published with
    // dataChange=false (CDF-invisible, history intact), after which
    // the identical predicate plans <= 4 of 16 files (tile_pruned
    // gate, parsed from the scan's own description). Values against
    // the closed form catch any row the rewrite loses or doubles. At
    // 100 TB this is the nightly layout job that turns exploratory
    // 2-D slicing from full scans into tile reads.
    "sink_log_optimize_zorder" -> ((s, d) => {
      val dir = graft.core.ArtifactCache.fixtureScratch("log_optz", d)
      def tileScan() = s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .filter(col("x") >= 64L && col("x") < 96L &&
          col("y") >= 64L && col("y") < 96L)
      def kept(): Int = "files=(\\d+)/(\\d+)".r
        .findFirstMatchIn(tileScan().queryExecution.executedPlan.toString)
        .map(_.group(1).toInt).getOrElse(-1)
      val (before, after) = rebuildOnce(zorderStats, dir) {
        s.range(0, 65536)
          .selectExpr("id", "id % 256 AS x",
            "((id DIV 256) * 177) % 256 AS y")
          .repartitionByRange(16, col("id"))
          .write.format("graft.sources.GraftLogSource")
          .option("path", dir).mode("overwrite").save()
        val before = kept()
        GraftLog.optimizeZorder(s, dir, "x", "y", bits = 8, nFiles = 16)
        (before, kept())
      }
      tileScan().agg(count(lit(1)).as("n_rows"),
          sum(col("id")).as("sum_id"))
        .select(col("n_rows"), col("sum_id"),
          lit(before == 16).as("before_full"),
          lit(after >= 0 && after * 4 <= 16).as("tile_pruned"))
    }),

    // Per-file BLOOM pruning for string equality — the index numeric
    // min/max can't provide: the ingest hash-partitions by `tag`, so
    // each of the 7 tag values lands wholly in one part file and every
    // file's manifest bloom provably lacks the other six. A
    // `tag = 't3'` scan then plans ~1 of 7 files (gated <= 2 inside
    // the result, parsed from the scan's own description); values are
    // oracle-checked against the closed form, so a wrongly-pruned file
    // is a hash miss. At 100 TB this turns point lookups on
    // dictionary-ish string columns (language, source, shard) from
    // full scans into single-file reads.
    "sink_log_bloom_pruned" -> ((s, d) => {
      val dir = graft.core.ArtifactCache.fixtureScratch("log_bloom", d)
      if (GraftLog.committedFiles(dir).isEmpty)
        s.range(0, 70000)
          .selectExpr("id", "concat('t', id % 7) AS tag")
          .repartition(7, col("tag"))
          .write.format("graft.sources.GraftLogSource")
          .option("path", dir).mode("overwrite").save()
      val scan = s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .filter(col("tag") === "t3")
      val pruned = "files=(\\d+)/(\\d+)".r
        .findFirstMatchIn(scan.queryExecution.executedPlan.toString)
        .exists(m => m.group(2).toInt == 7 && m.group(1).toInt <= 2)
      scan.agg(count(lit(1)).as("n_rows"), sum(col("id")).as("sum_id"))
        .select(col("n_rows"), col("sum_id"),
          lit(pruned).as("bloom_pruned"))
    }),

    // Copy-on-write DELETE: drop a key range by rewriting only the
    // stats-affected file subset — files outside the predicate's reach
    // survive byte-identical (zero write amplification beyond the
    // touched range). Closed-form oracle over the surviving rows; the
    // bounded_rewrite gate pins the file-targeting behavior that makes
    // GDPR-style deletes affordable on a 100 TB table.
    "sink_log_delete_cow" -> ((s, d) => {
      val dir = graft.core.ArtifactCache.fixtureScratch("log_delete", d)
      val (r, t) = rebuildOnce(deleteStats, dir) {
        s.range(0, 40000).selectExpr("id", "id AS v")
          .repartitionByRange(8, col("id"))
          .write.format("graft.sources.GraftLogSource")
          .option("path", dir).mode("overwrite").save()
        GraftLog.deleteRange(s, dir, "id", 5000, 7000)
      }
      s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .agg(count(lit(1)).as("n_rows"), sum(col("id")).as("sum_id"))
        .select(col("n_rows"), col("sum_id"),
          lit(r > 0 && r * 2 <= t).as("bounded_rewrite"))
    }),

    // Merge-on-read DELETE via deletion vectors (Delta DV / Iceberg v2
    // position deletes): two stacked deletes record deleted row
    // POSITIONS in sidecar DVs and commit metadata-only versions —
    // ZERO part files rewrite (gated on the live file set being
    // bit-identical), both decode paths skip DV'd ordinals, and the
    // stacked deletes merge into one DV per touched file. COUNT stays
    // manifest-exact (rows minus DV cardinality). At 100 TB this is
    // what makes frequent small erasure deletes affordable: write
    // cost O(deleted positions), not O(affected file bytes). The
    // oracle recomputes the surviving rows from closed form.
    "sink_log_delete_dv" -> ((s, d) => {
      val dir = graft.core.ArtifactCache.fixtureScratch("log_dv", d)
      val (dv1, dv2, noRewrite, dvFiles) = rebuildOnce(dvStats, dir) {
        s.range(0, 40000).selectExpr("id", "id AS v")
          .repartitionByRange(8, col("id"))
          .write.format("graft.sources.GraftLogSource")
          .option("path", dir).mode("overwrite").save()
        val before = GraftLog.entriesAsOf(dir, Long.MaxValue)
          .map(_.file).toSet
        val (_, _, a) = GraftLog.deleteWhereMoR(s, dir, Array(
          org.apache.spark.sql.sources.And(
            org.apache.spark.sql.sources.GreaterThanOrEqual("id", 5000L),
            org.apache.spark.sql.sources.LessThan("id", 6000L))))
        val (_, _, b) = GraftLog.deleteWhereMoR(s, dir, Array(
          org.apache.spark.sql.sources.And(
            org.apache.spark.sql.sources.GreaterThanOrEqual("id", 5500L),
            org.apache.spark.sql.sources.LessThan("id", 7000L))))
        val after = GraftLog.entriesAsOf(dir, Long.MaxValue)
        (a, b, after.map(_.file).toSet == before,
          after.count(e => GraftLog.dvOf(e).isDefined))
      }
      s.read.format("graft.sources.GraftLogSource")
        .option("path", dir).load()
        .agg(count(lit(1)).as("n_rows"), sum(col("id")).as("sum_id"))
        .select(col("n_rows"), col("sum_id"),
          lit(dv1 && dv2).as("used_dv"),
          lit(noRewrite).as("zero_files_rewritten"),
          lit(dvFiles >= 1 && dvFiles <= 2).as("dv_bounded"))
    })
  )

  /** Session-lifetime build markers for the maintenance fixtures: the
    * rewrite sequence must run exactly once per session (its observable
    * stats feed the result), so a stale /tmp table from a previous
    * session is wiped and rebuilt rather than trusted. */
  private val streamBuilt =
    new scala.collection.concurrent.TrieMap[String, Unit]()
  private val cdcBuilt =
    new scala.collection.concurrent.TrieMap[String, Unit]()
  // (deltaBounded, mergeBounded, noopSkipped)
  private val mvStats =
    new scala.collection.concurrent.TrieMap[
      String, (Boolean, Boolean, Boolean)]()
  private val txnsBuilt =
    new scala.collection.concurrent.TrieMap[String, Unit]()
  // (incrementalBounded, sketchLossless)
  private val mvDistinctStats =
    new scala.collection.concurrent.TrieMap[
      String, (Boolean, Boolean)]()
  private val cdcMetaBuilt =
    new scala.collection.concurrent.TrieMap[String, Boolean]()
  private val partEvoBuilt =
    new scala.collection.concurrent.TrieMap[String, Boolean]()
  private val insertOverwriteBuilt =
    new scala.collection.concurrent.TrieMap[String, Boolean]()
  private val truncateBuilt =
    new scala.collection.concurrent.TrieMap[String, (Boolean, Boolean)]()
  private val widenColBuilt =
    new scala.collection.concurrent.TrieMap[String, Boolean]()
  private val renameColBuilt =
    new scala.collection.concurrent.TrieMap[String, Boolean]()
  private val dropColBuilt =
    new scala.collection.concurrent.TrieMap[String, (Boolean, Boolean)]()
  private val cdfStreamBuilt =
    new scala.collection.concurrent.TrieMap[String, Boolean]()
  private val cdfTypedBuilt =
    new scala.collection.concurrent.TrieMap[String, Unit]()

  /** Shared CDC fixture: a 3000-row table (v0), a merge updating ids
    * 0..99 and inserting 10000..10049 (v1), a range delete of
    * [200, 300) (v2) — sidecars on, each key touched at most once. */
  private def ensureCdfTypedFixture(s: SparkSession, d: String): String = {
    val base = graft.core.ArtifactCache.fixtureScratch("log_cdft", d)
    val dir = s"$base/t"
    rebuildOnce(cdfTypedBuilt, base) {
      s.range(0, 3000).selectExpr("id",
          "CAST(id % 10 AS BIGINT) AS bucket", "id AS v")
        .coalesce(2)
        .write.format("graft.sources.GraftLogSource")
        .option("path", dir).mode("append").save()
      GraftLog.setProperties(dir, Map("graft.cdf.enabled" -> "true"))
      val batch = s.range(0, 100).selectExpr("id",
          "CAST(id % 10 AS BIGINT) AS bucket",
          "id + 100000 AS v")
        .union(s.range(10000, 10050).selectExpr("id",
          "CAST(id % 10 AS BIGINT) AS bucket", "id AS v"))
      GraftLog.mergeUpsert(s, dir, batch, "id")
      GraftLog.deleteRange(s, dir, "id", 200L, 300L)
      ()
    }
    dir
  }
  // (modesOk, mirrorIdentical)
  private val replStats =
    new scala.collection.concurrent.TrieMap[
      String, (Boolean, Boolean)]()
  // (branchInvisibleToMain, fastForwardPublished)
  private val branchStats =
    new scala.collection.concurrent.TrieMap[
      String, (Boolean, Boolean)]()

  /** Once-per-session fixture rebuild: the maintenance sequence's
    * observable stats feed the driver-checked result, so a stale /tmp
    * table from a previous session (possibly an older format) is wiped
    * — recursively, scratch subdirectories included — and rebuilt
    * rather than trusted. One code path for all four fixtures. */
  private def rebuildOnce[T](
      cache: scala.collection.concurrent.TrieMap[String, T],
      dir: String)(build: => T): T =
    cache.getOrElseUpdate(dir, { wipeDir(dir); build })
  // (filesRewrittenByUpdate, filesTotal, filesRewrittenByPureInsert)
  private val mergeStats =
    new scala.collection.concurrent.TrieMap[String, (Int, Int, Int)]()
  // (tagReadRows, logExpired, horizonFailsLoudly)
  private val refStats =
    new scala.collection.concurrent.TrieMap[
      String, (Long, Boolean, Boolean)]()
  private val partsMetaBuilt =
    new scala.collection.concurrent.TrieMap[String, Boolean]()
  // (failedCtasStrandedNothing, failedRtasKeptOldTable)
  private val ctasStats =
    new scala.collection.concurrent.TrieMap[String, (Boolean, Boolean)]()
  // (auditRowsSeen, baseRowsWhileStaged, secondPublishFailedLoudly)
  private val wapStats =
    new scala.collection.concurrent.TrieMap[
      String, (Long, Long, Boolean)]()
  // (usedDv1, usedDv2, zeroFilesRewritten, dvFileCount)
  private val dvStats =
    new scala.collection.concurrent.TrieMap[
      String, (Boolean, Boolean, Boolean, Int)]()
  // (filesRewritten, filesTotal)
  private val deleteStats =
    new scala.collection.concurrent.TrieMap[String, (Int, Int)]()
  // (tileFilesKeptBeforeOptimize, tileFilesKeptAfter)
  private val zorderStats =
    new scala.collection.concurrent.TrieMap[String, (Int, Int)]()
  // (filesCompacted, restoreRemoved, restoreReadded, vacuumDeleted)
  private val callStats =
    new scala.collection.concurrent.TrieMap[String, (Int, Int, Int, Int)]()
  // violating insert rejected by the CHECK constraint?
  private val ckStats =
    new scala.collection.concurrent.TrieMap[String, Boolean]()

  /** A cached SPJ fixture table is trusted only if EVERY live file
    * carries its partition record — a stale /tmp table from a
    * pre-partitioning session would silently disable grouping and
    * fail the metaGroups/spj gates. */
  private def spjReady(dir: String): Boolean = {
    val live = GraftLog.entriesAsOf(dir, Long.MaxValue)
    live.nonEmpty &&
      live.forall(e => GraftLogPartValue.of(e, "k").isDefined)
  }

  /** The k-partitioned 50k-row fact table two queries share
    * (sink_log_spj_join, sink_log_groupby_meta) — each ensures it
    * independently, so query execution order can't matter. */
  private def ensureSpjFact(s: SparkSession, fa: String): Unit =
    if (!spjReady(fa))
      s.range(0, 50000).selectExpr("id", "id % 16 AS k")
        .write.format("graft.sources.GraftLogSource")
        .option("path", fa).option("partitionCol", "k")
        .mode("overwrite").save()

  /** The single big multi-block gcol part two queries share
    * (sink_log_split_parallel, sink_log_block_skip): 500k rows,
    * ~64 KB raw blocks, coalesced to ONE part file so split fan-out
    * and block skipping are attributable to the format, not the file
    * count. Built once per session+fixture. */
  private def ensureGcolBigPart(s: SparkSession, d: String): String = {
    // version suffix mirrors the SQL warehouse-root convention: bump
    // it with any on-disk gcol format change, else a cached part from
    // an older layout (indistinguishable to the readiness probe)
    // would be read by the new code. v2 = typed-dict encodings (r11).
    val dir = graft.core.ArtifactCache.fixtureScratch("gcol_big_v2", d)
    val live = GraftLog.entriesAsOf(dir, Long.MaxValue)
    val ready = live.size == 1 && GraftColFile.isCol(live.head.file) &&
      live.head.rows == 500000L && live.head.cols.contains("tag")
    if (!ready) {
      val prior = s.conf.getOption("spark.graft.log.blockBytes")
      s.conf.set("spark.graft.log.blockBytes", (64L << 10).toString)
      // tag: 7 distinct values — every block dictionary-encodes it,
      // so the dict decode path sits under the DuckDB oracle too
      try s.range(0, 500000).selectExpr("id", "id * 3 AS v",
          "concat('t', id % 7) AS tag")
        .coalesce(1)
        .write.format("graft.sources.GraftLogSource")
        .option("path", dir).mode("overwrite").save()
      finally prior match {
        case Some(v) => s.conf.set("spark.graft.log.blockBytes", v)
        case None => s.conf.unset("spark.graft.log.blockBytes")
      }
    }
    dir
  }

  /** Runs `body` with one session conf temporarily set and EAGERLY
    * materializes the returned frame before restoring, so the restored
    * conf can never re-plan it (frames are lazy; returning one after a
    * finally-restore would plan it under the restored value). The two
    * callers return a partition-grouped aggregate — ≤16 rows — so the
    * collect is O(partition values), not O(data); the local frame that
    * goes back to the driver carries identical schema and values.
    * Closes ADVICE r9: no query fixture may leak a planner conf into
    * the shared bench/verify session (order-independence). */
  private def withConfMaterialized(s: SparkSession, key: String,
      value: String)(body: => DataFrame): DataFrame = {
    val prior = s.conf.getOption(key)
    s.conf.set(key, value)
    try {
      val df = body
      val rows = df.collect().toIndexedSeq
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        df.schema)
    } finally prior match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** Shared catalog warehouse root for the SQL fixtures (conf set as a
    * side effect). The version suffix is bumped whenever the on-disk
    * format changes shape — a stale /tmp cache from an older format
    * must be ignored, and every fixture must agree on the suffix. */
  private def catalogWarehouse(s: SparkSession, d: String): String = {
    // v5: part files before the NDV/null-count manifest sketches lack
    // the `#ndv`/`#nulls` stats keys sql_catalog_stats asserts on
    val wh = graft.core.ArtifactCache.fixtureScratch("cat_wh_v5", d)
    s.conf.set("spark.sql.catalog.graftq", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graftq.warehouse", wh)
    wh
  }

  /** The shared 50k-row range-layout graft-log fixture
    * (the per-user `log_pruned/<fixture>` scratch) used by three queries
    * (sink_custom_dsv2_pruned, sink_log_count_meta,
    * sink_log_file_meta): one definition so a layout change cannot
    * leave two queries building one shape and the third expecting
    * another. Single atomic overwrite commit, so the committedFiles
    * gate is exact. */
  private def ensurePrunedSeries(s: SparkSession, d: String): String = {
    val dir = graft.core.ArtifactCache.fixtureScratch("log_pruned", d)
    if (GraftLog.committedFiles(dir).isEmpty)
      s.read.format("graft.sources.SeriesSource")
        .option("n", "50000").option("slices", "8").load()
        .repartitionByRange(8, col("id"))
        .write.format("graft.sources.GraftLogSource")
        .option("path", dir).mode("overwrite").save()
    dir
  }

  // corpus_lakehouse_e2e's doc_id cut, once per session+fixture
  private val lakehouseCut =
    new scala.collection.concurrent.TrieMap[String, Long]()

  /** Recursive fixture wipe: plain `listFiles().foreach(_.delete())`
    * silently no-ops on non-empty SUBDIRECTORIES (a crashed merge or
    * compaction from a prior session leaves `__rewrite-*`/`__cdc-*`
    * scratch dirs behind), so the "wiped" fixture would keep stale
    * litter across every rebuild. */
  private def wipeDir(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    val root = new java.io.File(dir)
    if (root.exists())
      Option(root.listFiles()).getOrElse(Array.empty).foreach(rm)
  }

  /** Cross-session fixture gate for MULTI-STATEMENT builds: a
    * completion marker in the table's properties, stamped only after
    * the LAST statement. `committedFiles(dir).isEmpty` is the right
    * gate for single-overwrite fixtures (one atomic commit — either
    * the table exists complete or not at all), but a build of several
    * SQL statements can be killed between them, and trusting "some
    * files committed" would then serve the half-built table to every
    * later session — a permanent oracle miss until /tmp is wiped by
    * hand. Each guarded build starts with DROP TABLE IF EXISTS, so a
    * detected partial state self-cleans on the rebuild. */
  private def ensureBuilt(dir: String)(build: => Unit): Unit =
    if (!GraftLog.propertiesOf(dir).contains("graft.fixture.complete")) {
      build
      GraftLog.setProperties(dir, Map("graft.fixture.complete" -> "1"))
    }

  /** Shared ensure-block for the catalog-backed queries: CREATE TABLE +
    * two INSERTs (REPARTITION-hinted so the per-version file counts are
    * deterministic: 1 file then 2), once per session+fixture. */
  private def ensureCatalogSeries(s: SparkSession, d: String): String = {
    val wh = catalogWarehouse(s, d)
    val dir = s"$wh/ns/series"
    ensureBuilt(dir) {
      s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.ns")
      s.sql("DROP TABLE IF EXISTS graftq.ns.series")
      s.sql("CREATE TABLE graftq.ns.series (id BIGINT, bucket INT)")
      s.sql("""INSERT INTO graftq.ns.series
               SELECT /*+ REPARTITION(1) */ id, CAST(id % 97 AS INT)
               FROM range(0, 4000)""")
      s.sql("""INSERT INTO graftq.ns.series
               SELECT /*+ REPARTITION(2) */ id, CAST(id % 97 AS INT)
               FROM range(4000, 10000)""")
    }
    dir
  }

  val oracles: Map[String, String] = Map(
    "sink_log_split_parallel" ->
      """SELECT CAST(id % 13 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id * 3) AS BIGINT) AS sum_v,
           TRUE AS fanned_out
         FROM range(0, 500000) t(id)
         GROUP BY bucket""",
    "sink_log_dict_groupby" ->
      """SELECT 't' || CAST(id % 7 AS VARCHAR) AS tag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id * 3) AS BIGINT) AS sum_v,
           TRUE AS dict_encoded
         FROM range(0, 500000) t(id)
         GROUP BY tag""",
    "sink_log_block_skip" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id * 3) AS BIGINT) AS sum_v,
           CAST(MIN(id) AS BIGINT) AS min_id,
           CAST(MAX(id) AS BIGINT) AS max_id,
           TRUE AS blocks_skipped
         FROM range(0, 500000) t(id)
         WHERE id >= 100000 AND id < 101000""",
    "join_bucketed_colocated" ->
      """SELECT o_orderpriority,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(18,10))) AS DOUBLE) AS revenue,
         CAST(COUNT(*) AS BIGINT) AS n_items
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority""",
    "source_custom_dsv2" ->
      """SELECT CAST(id % 97 AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(((id * 2654435761) % 100000) / 100.0
             AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM range(25000, 75000) t(id)
         GROUP BY bucket""",
    "sink_custom_dsv2_roundtrip" ->
      """SELECT 't' || CAST(id % 7 AS VARCHAR) AS tag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(((id * 2654435761) % 100000) / 100.0
             AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM range(0, 50000) t(id)
         GROUP BY tag""",
    "sql_catalog_versioned" ->
      """SELECT CAST(id % 97 AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_v0,
           CAST(10000 AS BIGINT) AS n_total
         FROM range(0, 4000) t(id)
         GROUP BY bucket""",
    "sink_custom_dsv2_pruned" ->
      """SELECT CAST(id % 97 AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(((id * 2654435761) % 100000) / 100.0
             AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM range(40000, 45000) t(id)
         GROUP BY bucket""",
    "sql_catalog_cdf" ->
      """SELECT CAST(id % 97 AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_changed,
           CAST(MIN(id) AS BIGINT) AS min_id,
           CAST(MAX(id) AS BIGINT) AS max_id
         FROM range(4000, 10000) t(id)
         GROUP BY bucket""",
    "sql_catalog_files" ->
      """SELECT CAST(version AS BIGINT) AS version,
           CAST(n_files AS BIGINT) AS n_files,
           CAST(n_rows AS BIGINT) AS n_rows
         FROM (VALUES (0, 1, 4000), (1, 2, 6000))
           AS t(version, n_files, n_rows)""",
    // ids 0..9999 all distinct, 97 buckets; the sketch-tolerance
    // booleans are gated Spark-side.
    "sql_catalog_stats" ->
      """SELECT CAST(COUNT(DISTINCT id) AS BIGINT) AS exact_id_ndv,
           CAST(COUNT(DISTINCT id % 97) AS BIGINT) AS exact_bucket_ndv,
           TRUE AS id_ndv_ok,
           TRUE AS bucket_ndv_ok,
           TRUE AS nulls_exact
         FROM range(0, 10000) t(id)""",
    // 2000 rows of (id, 3*id): sum_v = 3 * sum(0..1999).
    "sql_catalog_ctas_atomic" ->
      """SELECT CAST(2000 AS BIGINT) AS n_rows,
           CAST(3 * (SELECT SUM(id) FROM range(0, 2000) t(id))
             AS BIGINT) AS sum_v,
           TRUE AS failed_ctas_strands_nothing,
           TRUE AS failed_rtas_keeps_old_table""",
    // 4000 committed rows (v = id) + 1000 published-after-audit rows
    // (v = 1): sum_v = sum(0..3999) + 1000.
    "sql_catalog_wap" ->
      """SELECT CAST(4000 + 1000 AS BIGINT) AS n_rows,
           CAST((SELECT SUM(id) FROM range(0, 4000) t(id)) + 1000
             AS BIGINT) AS sum_v,
           TRUE AS audit_saw_staged,
           TRUE AS staged_invisible,
           TRUE AS publish_exactly_once""",
    // a: 1000 + 500 rows in 2 files, b: 1000 + 500 in 2, c: 1000 in 1;
    // the [0, 300) MoR delete removes 100 rows from each of a/b/c.
    "sql_catalog_partitions_meta" ->
      """SELECT part_value, CAST(n_files AS BIGINT) AS n_files,
           CAST(n_rows AS BIGINT) AS n_rows
         FROM (VALUES ('a', 2, 1400), ('b', 2, 1400), ('c', 1, 900))
           AS t(part_value, n_files, n_rows)""",
    // 3000 original rows + 12 single-row appends of (10000+i, 0).
    "sql_catalog_refs" ->
      """SELECT CAST(3012 AS BIGINT) AS n_rows,
           CAST((SELECT SUM(id) FROM range(0, 3000) t(id)) +
                (SELECT SUM(id + 10000) FROM range(0, 12) t(id))
             AS BIGINT) AS sum_id,
           TRUE AS tag_read_pinned_v0,
           TRUE AS log_expired,
           TRUE AS horizon_fails_loudly""",
    // 3 identical commits of ids 0..1499: 4500 rows, 3x the range sum.
    "sink_log_compact_target" ->
      """SELECT CAST(4500 AS BIGINT) AS n_rows,
           CAST(3 * (SELECT SUM(id) FROM range(0, 1500) t(id))
             AS BIGINT) AS sum_id,
           CAST(0 AS BIGINT) AS min_id,
           CAST(1499 AS BIGINT) AS max_id,
           TRUE AS rolled_multiple_files,
           TRUE AS manifest_rows_exact""",
    "sink_log_compact_vacuum" ->
      """SELECT CAST(7000 AS BIGINT) AS n_rows,
           CAST(24496500 AS BIGINT) AS sum_id,
           CAST(1 AS BIGINT) AS n_live_files,
           CAST(1 AS BIGINT) AS n_disk_parts,
           CAST(3 AS BIGINT) AS current_version""",
    // Full recompute over both batches — equality proves the
    // CDF-driven partial-aggregate merge.
    "sink_log_incremental_agg" ->
      """SELECT id % 10 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id) AS BIGINT) AS sum_id
         FROM range(0, 6000) t(id)
         GROUP BY bucket""",
    // The 32x32 tile at (64,64): 1024 cells, sum of id = y*256+x over
    // the tile = 2544*(8192+32); tile_pruned gates that the z-layout
    // let the scan skip >= 75% of the files.
    "sink_log_zorder_pruned" ->
      """SELECT CAST(1024 AS BIGINT) AS n_rows,
           CAST(20921856 AS BIGINT) AS sum_id,
           TRUE AS tile_pruned""",
    // 1500 rows; score exists only for ids 1000..1499 (x3); the
    // >= 3750 scan matches ids >= 1250 and must have skipped the
    // pre-evolution file at planning time.
    "sink_log_schema_evolution" ->
      """SELECT CAST(1500 AS BIGINT) AS n_rows,
           CAST(1124250 AS BIGINT) AS sum_id,
           CAST(1000 AS BIGINT) AS n_null_score,
           CAST(1874250 AS BIGINT) AS sum_score,
           CAST(250 AS BIGINT) AS n_hi_score,
           TRUE AS old_file_skipped""",
    // Destination of the two-run log-to-log stream: 5000 drained rows
    // + 1000 resumed-delta rows, each delivered exactly once (the
    // compaction between runs must contribute nothing).
    "sink_log_stream_source" ->
      """SELECT id % 10 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id) AS BIGINT) AS sum_id
         FROM range(0, 6000) t(id)
         GROUP BY bucket""",
    "sink_log_count_meta" ->
      """SELECT CAST(50000 AS BIGINT) AS n_rows,
           CAST(0 AS BIGINT) AS min_id,
           CAST(49999 AS BIGINT) AS max_id,
           TRUE AS meta_only""",
    // Final table after both merges: updates negate v on [10000,12000),
    // inserts add [40000,41000) with negative v; ids are untouched.
    "sink_log_merge_cow" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN (id >= 10000 AND id < 12000) OR id >= 40000
             THEN -id ELSE id END) AS BIGINT) AS sum_v,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           TRUE AS bounded_rewrite,
           TRUE AS pure_insert_rewrites_zero
         FROM range(0, 41000) t(id)""",
    "sink_log_delete_cow" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           TRUE AS bounded_rewrite
         FROM range(0, 40000) t(id)
         WHERE id < 5000 OR id >= 7000""",
    // Stacked MoR deletes remove [5000, 6000) then [5500, 7000):
    // survivors are ids outside [5000, 7000).
    "sink_log_delete_dv" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           TRUE AS used_dv,
           TRUE AS zero_files_rewritten,
           TRUE AS dv_bounded
         FROM range(0, 40000) t(id)
         WHERE id < 5000 OR id >= 7000""",
    "sql_catalog_delete" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(SUM(id * 2) AS BIGINT) AS sum_v,
           TRUE AS bounded_rewrite
         FROM range(0, 20000) t(id)
         WHERE id < 2000 OR id >= 3000""",
    // Updates negate v (= 2*id) exactly on [2000, 3000).
    "sql_catalog_update" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(SUM(CASE WHEN id >= 2000 AND id < 3000
             THEN -id * 2 ELSE id * 2 END) AS BIGINT) AS sum_v,
           TRUE AS bounded_rewrite
         FROM range(0, 20000) t(id)""",
    // Post-merge: [0,500) deleted by the by-source clause; [9000,10000)
    // updated to v=-id; [10000,11000) inserted with v=-id.
    "sql_catalog_merge" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(SUM(CASE WHEN id >= 9000 THEN -id ELSE id END)
             AS BIGINT) AS sum_v
         FROM range(0, 11000) t(id) WHERE id >= 500""",
    // per-b rollups of the fact x dim join, recomputed by the oracle.
    "sql_catalog_partition_evolution" ->
      """WITH f AS (SELECT id, id % 8 AS b FROM range(0, 4000) t(id)),
            dd AS (SELECT id * 2 AS w, id % 8 AS b
                   FROM range(0, 800) t(id))
         SELECT f.b AS b, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(f.id) AS BIGINT) AS sum_id,
           CAST(SUM(dd.w) AS BIGINT) AS sum_w,
           TRUE AS spj_resumed_on_new_key
         FROM f JOIN dd ON f.b = dd.b
         GROUP BY f.b""",
    // closed forms: the overwrite's 200 rows (v=9*id) + the 50-row
    // follow-up append.
    "sql_catalog_insert_overwrite" ->
      """SELECT CAST(250 AS BIGINT) AS n_rows,
           CAST(9 * 250 * 249 / 2 AS BIGINT) AS sum_v,
           TRUE AS atomic_single_commit""",
    // closed forms: the post-truncate insert alone (300 rows, v=5*id);
    // history and CDF wipe-coverage gated as booleans.
    "sql_catalog_truncate" ->
      """SELECT CAST(300 AS BIGINT) AS n_rows,
           CAST(5 * 300 * 299 / 2 AS BIGINT) AS sum_v,
           TRUE AS history_time_travelable,
           TRUE AS cdf_records_wipe""",
    // closed forms: 2000 int-vintage rows (n = id) + 500 post-widen
    // rows (n = id * 1e7, beyond the old INT range).
    "sql_catalog_widen_col" ->
      """SELECT CAST(2500 AS BIGINT) AS n_rows,
           (SELECT CAST(SUM(id) AS BIGINT) FROM range(0, 2000) t(id)) +
           (SELECT CAST(SUM(id * 10000000) AS BIGINT)
            FROM range(2000, 2500) t(id)) AS sum_n,
           TRUE AS meta_agg_spans_vintages""",
    // closed forms: 2000 pre-rename + 500 post-rename rows, score =
    // 3*id throughout; pruning gated as a boolean.
    "sql_catalog_rename_col" ->
      """SELECT CAST(2500 AS BIGINT) AS n_rows,
           CAST(3 * 2500 * 2499 / 2 AS BIGINT) AS sum_score,
           TRUE AS former_name_stats_prune""",
    // closed forms: 2000 rows, keep = 2*id; the tombstone and the
    // compaction purge gated as booleans.
    "sql_catalog_drop_col" ->
      """SELECT CAST(2000 AS BIGINT) AS n_rows,
           CAST(2 * 2000 * 1999 / 2 AS BIGINT) AS sum_keep,
           TRUE AS tombstone_rejects_readd,
           TRUE AS compaction_purges_cells""",
    // closed forms: version 0 = the 1000-row seed append (no
    // sidecars); version 1 = the CDF-enabled DELETE of ids [0,50).
    "sql_catalog_cdc_meta" ->
      """SELECT CAST(2 AS BIGINT) AS n_versions,
           CAST(1 AS BIGINT) AS n_cdc_versions,
           CAST(50 AS BIGINT) AS total_cdc_rows,
           CAST(1000 AS BIGINT) AS plain_add_rows""",
    "sink_log_file_meta" ->
      """SELECT CAST(8 AS BIGINT) AS n_files,
           CAST(50000 AS BIGINT) AS n_rows,
           TRUE AS files_disjoint""",
    "sink_log_spj_join" ->
      """WITH f AS (SELECT id, id % 16 AS k FROM range(0, 50000) t(id)),
            d AS (SELECT id * 2 AS w, id % 16 AS k
                  FROM range(0, 1600) t(id))
         SELECT f.k AS k, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(f.id) AS BIGINT) AS sum_id,
           CAST(SUM(d.w) AS BIGINT) AS sum_w,
           TRUE AS spj_no_shuffle
         FROM f JOIN d ON f.k = d.k
         GROUP BY f.k""",
    "sql_tvf_series" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id
         FROM range(0, 12345) t(id) WHERE id >= 12000""",
    // Derived table after both runs: ids 0..2500, v = -id on the
    // updated range [500,700) and on the inserted range [2000,2500).
    "sink_log_stream_cdc_apply" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(SUM(CASE WHEN (id >= 500 AND id < 700) OR id >= 2000
             THEN -id ELSE id END) AS BIGINT) AS sum_v
         FROM range(0, 2500) t(id)""",
    // The final table after the branch lands: 2000 mainline rows plus
    // the 500-row branch line, published by fast_forward.
    "sql_catalog_branch" ->
      """WITH src AS (
           SELECT id, id AS v FROM range(0, 2000) t(id)
           UNION ALL
           SELECT id + 2000 AS id, id AS v FROM range(0, 500) t(id))
         SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(SUM(v) AS BIGINT) AS sum_v,
           TRUE AS branch_invisible, TRUE AS ff_published
         FROM src""",
    // The exactly-once watermark after bootstrap + one incremental
    // refresh: applied through source v1, marker riding view commit 2.
    "sql_catalog_txns" ->
      """SELECT 'materialized-agg' AS app_id,
           CAST(1 AS BIGINT) AS applied_through,
           CAST(2 AS BIGINT) AS committed_version""",
    // The view state after both batches: seed buckets id%50, delta
    // buckets id%10 — closed form over the union.
    // mirror final state: ids 0..999 minus [100,140) with v = id
    // (+50000 for ids < 20), plus inserts 5000..5029 with v = id.
    "sink_log_replica_sync" ->
      """WITH final AS (
           SELECT id, CASE WHEN id < 20 THEN id + 50000 ELSE id END
             AS v
           FROM range(0, 1000) t(id)
           WHERE id < 100 OR id >= 140
           UNION ALL
           SELECT id, id AS v FROM range(5000, 5030) t(id))
         SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(SUM(v) AS BIGINT) AS sum_v,
           TRUE AS modes_ok,
           TRUE AS mirror_identical
         FROM final""",
    // same closed forms as sink_log_cdf_typed: on this fixture the
    // key-net diff equals the per-version sidecar feed.
    "sink_log_changelog_diff" ->
      """SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(SUM(v) AS BIGINT) AS sum_v
         FROM (
           SELECT 'update_preimage' AS change_type, id, id AS v
             FROM range(0, 100) t(id)
           UNION ALL
           SELECT 'update_postimage', id, id + 100000
             FROM range(0, 100) t(id)
           UNION ALL
           SELECT 'insert', id, id FROM range(10000, 10050) t(id)
           UNION ALL
           SELECT 'delete', id, id FROM range(200, 300) t(id))
         GROUP BY change_type""",
    // stream == batch: the drained typed stream carries the same
    // closed forms as the batch feed on the shared fixture.
    "sink_log_stream_cdf_typed" ->
      """SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(SUM(v) AS BIGINT) AS sum_v
         FROM (
           SELECT 'update_preimage' AS change_type, id, id AS v
             FROM range(0, 100) t(id)
           UNION ALL
           SELECT 'update_postimage', id, id + 100000
             FROM range(0, 100) t(id)
           UNION ALL
           SELECT 'insert', id, id FROM range(10000, 10050) t(id)
           UNION ALL
           SELECT 'delete', id, id FROM range(200, 300) t(id))
         GROUP BY change_type""",
    // closed forms: updates touch ids 0..99 (v was id, becomes
    // id+100000), inserts add ids 10000..10049 (v=id), the range
    // delete removes ids 200..299 (v=id).
    "sink_log_cdf_typed" ->
      """SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(SUM(v) AS BIGINT) AS sum_v
         FROM (
           SELECT 'update_preimage' AS change_type, id, id AS v
             FROM range(0, 100) t(id)
           UNION ALL
           SELECT 'update_postimage', id, id + 100000
             FROM range(0, 100) t(id)
           UNION ALL
           SELECT 'insert', id, id FROM range(10000, 10050) t(id)
           UNION ALL
           SELECT 'delete', id, id FROM range(200, 300) t(id))
         GROUP BY change_type""",
    // bucket rollups over both ranges; u = (id*7)%400 per bucket.
    "sink_log_mv_distinct" ->
      """WITH src AS (
           SELECT id % 20 AS bucket, (id * 7) % 400 AS u, id AS v
           FROM range(0, 3500) t(id))
         SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(v) AS BIGINT) AS sum_v,
           CAST(COUNT(DISTINCT u) AS BIGINT) AS n_users_exact,
           TRUE AS ndv_in_bound,
           TRUE AS delta_bounded,
           TRUE AS sketch_lossless
         FROM src GROUP BY bucket""",
    "sink_log_mv_incremental" ->
      """WITH src AS (
           SELECT id % 50 AS bucket, id AS v FROM range(0, 3000) t(id)
           UNION ALL
           SELECT id % 10 AS bucket, id AS v
           FROM range(3000, 3500) t(id))
         SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(v) AS BIGINT) AS sum_v,
           CAST(MIN(v) AS BIGINT) AS min_v,
           CAST(MAX(v) AS BIGINT) AS max_v,
           TRUE AS delta_bounded, TRUE AS merge_bounded,
           TRUE AS noop_skipped
         FROM src GROUP BY bucket""",
    "sink_log_groupby_meta" ->
      """SELECT id % 16 AS k, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(id) AS BIGINT) AS min_id,
           CAST(MAX(id) AS BIGINT) AS max_id,
           TRUE AS meta_only
         FROM range(0, 50000) t(id)
         GROUP BY 1""",
    // The view filters to even ids over ALL 5000 rows (the post-view
    // insert shows through), v = 3*id.
    "sql_catalog_view" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(SUM(id * 3) AS BIGINT) AS sum_v
         FROM range(0, 5000) t(id) WHERE id % 2 = 0""",
    // 3500 conforming rows (v = id); the 10-row violating insert must
    // have been rejected wholesale.
    "sql_catalog_constraint" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(SUM(id) AS BIGINT) AS sum_v,
           TRUE AS violation_rejected
         FROM range(0, 3500) t(id)""",
    // 2000 defaulted rows (v=42) + 500 explicit (v=5*id) + one
    // explicit-DEFAULT row (id=9000, v=42).
    "sql_catalog_default" ->
      """SELECT CAST(2501 AS BIGINT) AS n_rows,
           CAST((SELECT SUM(id) FROM range(0, 2500) t(id)) + 9000
             AS BIGINT) AS sum_id,
           CAST(2000 * 42 +
             (SELECT SUM(id * 5) FROM range(2000, 2500) t(id)) + 42
             AS BIGINT) AS sum_v,
           CAST(2001 AS BIGINT) AS n_default""",
    "sql_catalog_call_maintenance" ->
      """SELECT CAST(3000 AS BIGINT) AS n_rows,
           CAST(4498500 AS BIGINT) AS sum_id,
           3 AS files_compacted, 1 AS restore_removed,
           3 AS restore_readded, 1 AS vacuum_deleted""",
    "sql_catalog_alter_add_col" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           CAST(COUNT(CASE WHEN id < 1000 THEN 1 END) AS BIGINT)
             AS n_null_score,
           CAST(SUM(CASE WHEN id >= 1000 THEN id * 3 END) AS BIGINT)
             AS sum_score
         FROM range(0, 1500) t(id)""",
    "sql_catalog_history" ->
      """SELECT CAST(version AS BIGINT) AS version,
           CAST(n_adds AS BIGINT) AS n_adds,
           CAST(rows_added AS BIGINT) AS rows_added,
           ts_monotone, ts_travel_v0
         FROM (VALUES (0, 1, 4000, TRUE, TRUE),
                      (1, 2, 6000, TRUE, TRUE))
           AS t(version, n_adds, rows_added, ts_monotone, ts_travel_v0)""",
    "sql_catalog_restore" ->
      """SELECT CAST(2000 AS BIGINT) AS n_rows,
           CAST(1999000 AS BIGINT) AS sum_id,
           CAST(5000 AS BIGINT) AS n_v1""",
    "sink_log_bloom_pruned" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           TRUE AS bloom_pruned
         FROM range(0, 70000) t(id)
         WHERE id % 7 = 3""",
    // Every nationkey 0..24 exists in the dim, so the join keeps all
    // customers and grp = c_nationkey % 5.
    "sink_log_broadcast_join" ->
      """SELECT c_nationkey % 5 AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_bal,
           TRUE AS auto_broadcast
         FROM customer
         GROUP BY 1""",
    "corpus_lakehouse_e2e" ->
      """WITH dd AS (
           SELECT MIN(doc_id) AS doc_id, MIN(lang) AS lang,
             COUNT(*) AS n_dups, LENGTH(text) AS n_chars
           FROM documents WHERE LENGTH(text) >= 100
           GROUP BY text)
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_dups) AS BIGINT) AS n_raw_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           TRUE AS slice_pruned
         FROM dd
         WHERE doc_id <= (SELECT MAX(doc_id) // 4 FROM documents)
         GROUP BY lang""",
    "sink_log_optimize_zorder" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(id) AS BIGINT) AS sum_id,
           TRUE AS before_full,
           TRUE AS tile_pruned
         FROM range(0, 65536) t(id)
         WHERE (id % 256) >= 64 AND (id % 256) < 96
           AND (((id // 256) * 177) % 256) >= 64
           AND (((id // 256) * 177) % 256) < 96"""
  )
}
