package graft

import org.apache.spark.sql.functions._

/** SQL DDL against the custom catalog: create/insert/select/time-travel
  * /rename/drop, all through `spark.sql` with no DataFrame-API escape
  * hatch — the full metastore-shaped lifecycle over the graft-log
  * format. */
class GraftCatalogSpec extends SparkSpec {
  private val wh =
    java.nio.file.Files.createTempDirectory("graft-cat-wh").toString

  private def withCatalog[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.graftcat",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", wh)
    try body
    finally {
      spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
      spark.conf.unset("spark.sql.catalog.graftcat")
    }
  }

  test("full SQL lifecycle: create, insert, select, rename, drop") {
    withCatalog {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
      spark.sql("CREATE TABLE graftcat.db.t (id BIGINT, v DOUBLE)")
      spark.sql(
        "INSERT INTO graftcat.db.t SELECT id, CAST(id AS DOUBLE)/2 FROM range(100)")
      assert(spark.sql("SELECT COUNT(*) AS n FROM graftcat.db.t")
        .head.getLong(0) == 100)
      spark.sql(
        "INSERT INTO graftcat.db.t SELECT id, 0.0 FROM range(50)")
      assert(spark.table("graftcat.db.t").count() == 150)
      assert(spark.sql("SELECT SUM(v) FROM graftcat.db.t")
        .head.getDouble(0) == (0 until 100).map(_ / 2.0).sum)
      // catalog listing sees it
      val tables = spark.sql("SHOW TABLES IN graftcat.db")
        .select("tableName").collect().map(_.getString(0))
      assert(tables.contains("t"))
      // the rename target resolves WITHIN the table's catalog
      spark.sql("ALTER TABLE graftcat.db.t RENAME TO db.t2")
      assert(spark.table("graftcat.db.t2").count() == 150)
      spark.sql("DROP TABLE graftcat.db.t2")
      val after = spark.sql("SHOW TABLES IN graftcat.db")
        .select("tableName").collect().map(_.getString(0))
      assert(!after.contains("t2") && !after.contains("t"))
    }
  }

  test("insert commits are manifest-versioned snapshots") {
    withCatalog {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db2")
      spark.sql("CREATE TABLE graftcat.db2.s (id BIGINT, tag STRING)")
      spark.sql(
        "INSERT INTO graftcat.db2.s SELECT id, 'a' FROM range(10)")
      spark.sql(
        "INSERT INTO graftcat.db2.s SELECT id, 'b' FROM range(20)")
      val dir = s"$wh/db2/s"
      // CREATE's manifest carries no entries, so the first INSERT is
      // version 0 — its snapshot holds that insert alone
      val v0 = spark.read.format("graft.sources.GraftLogSource")
        .option("path", dir).option("asOfVersion", "0").load()
      assert(v0.count() == 10)
      assert(spark.table("graftcat.db2.s").count() == 30)
      // the same snapshot through SQL time-travel syntax
      assert(spark.sql(
        "SELECT COUNT(*) FROM graftcat.db2.s VERSION AS OF 0")
        .head.getLong(0) == 10)
      // change data feed: only the second insert's rows
      val cdf = spark.read.format("graft.sources.GraftLogSource")
        .option("path", dir).option("changesFromVersion", "0").load()
      assert(cdf.count() == 20,
        "the change feed from version 0 must hold insert 2 alone")
      // metadata table: one manifest row per committed file, versions 0/1
      val files = spark.sql(
        "SELECT version, file FROM graftcat.db2.`s$files`")
      val versions = files.select("version").collect()
        .map(_.getLong(0)).toSet
      assert(versions == Set(0L, 1L), s"got $versions")
      assert(files.count() ==
        graft.sources.GraftLog.committedFiles(dir).size)
    }
  }

  test("SQL DELETE FROM rewrites only stats-affected files") {
    withCatalog {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db3")
      spark.sql("CREATE TABLE graftcat.db3.d (id BIGINT, v BIGINT)")
      spark.sql("""INSERT INTO graftcat.db3.d
        SELECT /*+ REPARTITION_BY_RANGE(4, id) */ id, id * 2
        FROM range(0, 4000)""")
      spark.sql("DELETE FROM graftcat.db3.d WHERE id >= 500 AND id < 700")
      val t = spark.table("graftcat.db3.d")
      assert(t.count() == 3800)
      assert(t.filter(col("id") >= 500 && col("id") < 700).count() == 0)
      assert(t.agg(sum(col("v"))).head.getLong(0) ==
        2 * ((0L until 4000L).sum - (500L until 700L).sum))
      // stats targeting: of the 4 range files, at most 2 retired
      val removes = spark.sql(
        """SELECT COUNT(*) FROM graftcat.db3.`d$files`
           WHERE action = 'remove'""").head.getLong(0)
      assert(removes >= 1 && removes <= 2, s"removes=$removes")
      // NULL-predicate rows survive (DELETE drops only TRUE rows)
      spark.sql("ALTER TABLE graftcat.db3.d ADD COLUMN w BIGINT")
      spark.sql("DELETE FROM graftcat.db3.d WHERE w > 0")
      assert(spark.table("graftcat.db3.d").count() == 3800,
        "rows where the predicate is NULL must survive a DELETE")
    }
  }

  test("SQL ALTER TABLE ADD COLUMN: old rows read NULL, new insert fills") {
    withCatalog {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db4")
      spark.sql("CREATE TABLE graftcat.db4.a (id BIGINT)")
      spark.sql("INSERT INTO graftcat.db4.a SELECT id FROM range(100)")
      spark.sql("ALTER TABLE graftcat.db4.a ADD COLUMN score BIGINT")
      spark.sql(
        "INSERT INTO graftcat.db4.a SELECT id, id * 3 FROM range(100, 150)")
      val t = spark.table("graftcat.db4.a")
      assert(t.columns.toSeq == Seq("id", "score"))
      assert(t.count() == 150)
      assert(t.filter(col("score").isNull).count() == 100)
      assert(t.agg(sum(col("score"))).head.getLong(0) ==
        (100L until 150L).map(_ * 3).sum)
      // non-additive changes reject loudly
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE graftcat.db4.a DROP COLUMN score")
      }
      assert(e.getMessage.contains("ADD COLUMN") ||
        e.getMessage.toLowerCase.contains("unsupported"))
      // NOT NULL on an added column would be instantly violated by
      // every pre-alter row — reject, never silently downgrade
      val e2 = intercept[Exception] {
        spark.sql(
          "ALTER TABLE graftcat.db4.a ADD COLUMN strict BIGINT NOT NULL")
      }
      assert(e2.getMessage.contains("nullable"))
    }
  }

  test("TIMESTAMP AS OF resolves commit stamps; $history lists versions") {
    withCatalog {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db5")
      spark.sql("CREATE TABLE graftcat.db5.h (id BIGINT)")
      spark.sql("INSERT INTO graftcat.db5.h SELECT id FROM range(10)")
      spark.sql("INSERT INTO graftcat.db5.h SELECT id FROM range(25)")
      val hist = spark.sql(
        """SELECT version, ts_millis, rows_added
           FROM graftcat.db5.`h$history` ORDER BY version""").collect()
      assert(hist.map(_.getLong(0)).toSeq == Seq(0L, 1L))
      assert(hist.map(_.getLong(2)).toSeq == Seq(10L, 25L))
      val Seq(ts0, ts1) = hist.map(_.getLong(1)).toSeq
      assert(ts0 < ts1, "stamps must be strictly monotone")
      val zone = java.time.ZoneId.of(
        spark.conf.get("spark.sql.session.timeZone"))
      def fmt(ms: Long): String =
        java.time.Instant.ofEpochMilli(ms).atZone(zone)
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      assert(spark.sql(
        s"SELECT COUNT(*) FROM graftcat.db5.h TIMESTAMP AS OF '${fmt(ts0)}'")
        .head.getLong(0) == 10)
      assert(spark.sql(
        s"SELECT COUNT(*) FROM graftcat.db5.h TIMESTAMP AS OF '${fmt(ts1)}'")
        .head.getLong(0) == 35)
      // a timestamp before the first commit fails loudly
      val e = intercept[Exception] {
        spark.sql(
          s"SELECT COUNT(*) FROM graftcat.db5.h TIMESTAMP AS OF '${fmt(ts0 - 1)}'")
          .collect()
      }
      assert(e.getMessage.contains("predates"))
    }
  }
}
