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
}
