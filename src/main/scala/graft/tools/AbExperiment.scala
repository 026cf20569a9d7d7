package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Same-JVM interleaved A/B of this session's query rewrites: each rep
  * times the OLD form (copied verbatim from the pre-rewrite HEAD) and
  * the NEW form (whatever SparkEntry now ships) back to back under the
  * bench's own `.count()` action, bracketed by the control scan —
  * host-steal phases hit both forms equally, unlike cross-JVM repeats.
  * Odd reps run old first, even reps run new first (order debias).
  * Row counts are asserted equal every rep.
  *
  * Usage: runMain graft.tools.AbExperiment <sfDir> <reps> [<name>...]
  */
object AbExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val only = args.drop(2).toSet
    val spark = graft.functions.GraftExtensions
      .builder("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]",
        "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def control(): Double = time(
      li.filter(col("l_quantity") <= 25.0).select(col("l_orderkey")).count())
    control()

    // ---- OLD forms, verbatim from the pre-rewrite HEAD ----
    def oldQ4(s: SparkSession, d: String): DataFrame = {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    }
    // middle form: keep the semi join but shuffle it + implied filter
    def semiQ4(s: SparkSession, d: String): DataFrame = {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT /*+ SHUFFLE_MERGE(lineitem) */
               o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAYS
                        AND l_shipdate > TIMESTAMP '1996-03-01 00:00:00')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    }
    def oldQ22(s: SparkSession, d: String): DataFrame = {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql("""
        SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                 AS totacctbal
        FROM (SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, c_acctbal
              FROM customer
              WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
                AND CAST(c_acctbal AS DECIMAL(18,6)) *
                      (SELECT COUNT(*) FROM customer
                       WHERE c_acctbal > 0.0
                         AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7))
                    > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                       FROM customer
                       WHERE c_acctbal > 0.0
                         AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7))
                AND NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey
                                  AND o_orderdate >=
                                        TIMESTAMP '2000-01-01 00:00:00')
             ) custsale
        GROUP BY cntrycode
        ORDER BY cntrycode""")
    }
    def oldScd2(s: SparkSession, d: String): DataFrame = {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val changes = Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey").as("custkey"),
          to_date(col("o_orderdate")).as("change_date"),
          col("o_totalprice").as("new_bal"))
      Tables.customer(s, d)
        .select(col("c_custkey").as("custkey"), col("c_acctbal"))
        .join(changes, Seq("custkey"), "left")
        .withColumn("v", explode(
          when(col("change_date").isNotNull, array(
            struct(col("c_acctbal").as("bal"),
              lit("2023-01-01").cast("date").as("valid_from"),
              col("change_date").as("valid_to"),
              lit(false).as("is_current")),
            struct(col("new_bal").as("bal"),
              col("change_date").as("valid_from"),
              lit(null).cast("date").as("valid_to"),
              lit(true).as("is_current"))))
          .otherwise(array(
            struct(col("c_acctbal").as("bal"),
              lit("2023-01-01").cast("date").as("valid_from"),
              lit(null).cast("date").as("valid_to"),
              lit(true).as("is_current"))))))
        .select(col("custkey"), col("v.bal").as("bal"),
          col("v.valid_from").as("valid_from"),
          col("v.valid_to").as("valid_to"),
          col("v.is_current").as("is_current"))
    }
    def oldSwda(s: SparkSession, d: String): DataFrame = {
      val ev = Tables.events(s, d)
      val approx = graft.streaming.EventWindows.windowDistinctApprox(ev)
      val exact = ev
        .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users_exact"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n_users_exact"))
      approx.join(exact, Seq("w_start", "event_type"))
        .select(col("w_start"), col("event_type"), col("n_events"),
          col("n_users_exact"),
          (abs(graft.functions.HllSketchStr.estimate(col("sk")) -
              col("n_users_exact")) <=
            greatest(lit(2.0), col("n_users_exact") * 0.15))
            .as("est_in_bound"))
    }
    def oldResample(s: SparkSession, d: String): DataFrame = {
      val e = Tables.events(s, d).select(col("user_id"),
        date_trunc("DAY", col("ts")).as("day"), col("ts"),
        col("event_id"), col("value"))
      val daily = e.groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("day_value"))
      val rn = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val closing = e.withColumn("rn", row_number().over(rn))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("day"), col("value").as("close_value"))
      val grid = e.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"),
            expr("INTERVAL 1 DAY"))).as("day"))
      val ffill = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .join(closing, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("day_value"), lit(0.0)).as("day_value"),
          last(col("close_value"), ignoreNulls = true).over(ffill)
            .as("ffill_value"))
    }
    def oldInterval(s: SparkSession, d: String): DataFrame = {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("value").as("purchase_value"))
      clicks.join(purchases,
          col("user_id") === col("p_user") &&
            col("p_ts") <= col("ts") &&
            col("p_ts") >= col("ts") - expr("INTERVAL 30 MINUTES"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("p_ts").as("purchase_ts"), col("purchase_value"))
    }
    def oldSstream(s: SparkSession, d: String): DataFrame = {
      val events = Tables.events(s, d)
      val views = events.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      graft.streaming.EventWindows.attribution(views, purchases)
        .groupBy(window(col("p_ts"), "1 hour"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("view_event")).as("n_views"),
          sum(col("p_value").cast("decimal(18,2)")).cast("double")
            .as("purchase_value"))
        .select(col("window.start").as("w_start"), col("n_pairs"),
          col("n_views"), col("purchase_value"))
    }

    // variant forms compared against the SHIPPED new query
    def resampleNoCkpt(s: SparkSession, d: String): DataFrame = {
      val e = Tables.events(s, d).select(col("user_id"),
        date_trunc("DAY", col("ts")).as("day"), col("ts"),
        col("event_id"), col("value"))
      val daily = e.groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("day_value"),
          max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("day"), col("n_events"),
          col("day_value"), col("m.value").as("close_value"))
      val grid = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"),
            expr("INTERVAL 1 DAY"))).as("day"))
      val ffill = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("day_value"), lit(0.0)).as("day_value"),
          last(col("close_value"), ignoreNulls = true).over(ffill)
            .as("ffill_value"))
    }
    def intervalShj(s: SparkSession, d: String): DataFrame = {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("value").as("purchase_value"))
      clicks.join(purchases.hint("shuffle_hash"),
          col("user_id") === col("p_user") &&
            col("p_ts") <= col("ts") &&
            col("p_ts") >= col("ts") - expr("INTERVAL 30 MINUTES"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("p_ts").as("purchase_ts"), col("purchase_value"))
    }
    def sstreamShj(s: SparkSession, d: String): DataFrame = {
      val events = Tables.events(s, d)
      val views = events.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      graft.streaming.EventWindows.attribution(views,
          purchases.hint("shuffle_hash"))
        .groupBy(window(col("p_ts"), "1 hour"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("view_event")).as("n_views"),
          sum(col("p_value").cast("decimal(18,2)")).cast("double")
            .as("purchase_value"))
        .select(col("window.start").as("w_start"), col("n_pairs"),
          col("n_views"), col("purchase_value"))
    }

    // q10 variant: pre-aggregate revenue per custkey BELOW the customer
    // join (the windowed orders ⋈ R-lineitem join keeps its orderkey
    // shuffle; the customer join then carries one decimal partial per
    // buying customer instead of every joined line, and the final
    // GROUP BY rides the custkey partitioning with no wide exchange).
    def q10Preagg(s: SparkSession, d: String): DataFrame = {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql("""
        SELECT /*+ BROADCAST(nation), SHUFFLE_MERGE(rc) */
               c_custkey, c_name,
               CAST(SUM(rev_dec) AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN (SELECT /*+ SHUFFLE_MERGE(lineitem, orders) */
                     o_custkey,
                     SUM(CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(18,10))) AS rev_dec
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              WHERE o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
                AND l_returnflag = 'R'
              GROUP BY o_custkey) rc
          ON c_custkey = o_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")
    }

    // (corpus_decontaminate_bloom's shuffle-vs-broadcast verification
    // join was A/B'd through a since-removed -Dgraft.decontBloomJoin
    // toggle: SMJ 0.72–1.71 s vs planned broadcast 0.77–0.87 — kept
    // the broadcast; see the comment at the query site.)

    // bm25 variant: tokenize ONCE — the shipped form's `stats` and
    // `nAvg` each re-tokenize every document (duplicated CPU-heavy
    // subtree with no exchange for reuse, the spans-checkpoint class);
    // here the narrow per-doc (dl, matched-terms) frame materializes
    // via localCheckpoint and feeds both consumers.
    def bm25OneScan(s: SparkSession, d: String): DataFrame = {
      import graft.operators.Corpus.toksOf
      val qterms = Seq("spark", "join", "window")
      val tk = toksOf(col("text"))
      val perDoc = Tables.documents(s, d)
        .select(col("doc_id"), size(tk).cast("long").as("dl"),
          filter(tk, t => t.isin(qterms: _*)).as("qtk"))
        .localCheckpoint()
      val stats = perDoc
        .select(col("doc_id"), col("dl"), explode(col("qtk")).as("term"))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val nAvg = perDoc.agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val dfreq = stats.groupBy(col("term")).agg(count(lit(1)).as("df"))
      stats.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(nAvg))
        .withColumn("idf", log(lit(1.0) +
          (col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))))
        .withColumn("tscore", col("idf") *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) *
            col("dl").cast("double") / col("avgdl"))))
        .groupBy(col("doc_id"))
        .agg(sum(col("tscore").cast("decimal(18,10)")).cast("double")
          .as("score"),
          count(lit(1)).as("n_matched"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }

    val pairs: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("corpus_bm25_retrieval_1scan", bm25OneScan _),
      ("sql_tpch_q10_preagg", q10Preagg _),
      ("ts_resample_ffill_nockpt", resampleNoCkpt _),
      ("join_interval_shj", intervalShj _),
      ("stream_stream_join_shj", sstreamShj _),
      ("sql_tpch_q4", oldQ4 _),
      ("sql_tpch_q4_semi", semiQ4 _),
      ("sql_tpch_q22", oldQ22 _),
      ("warehouse_scd2_upsert", oldScd2 _),
      ("stream_window_distinct_approx", oldSwda _),
      ("ts_resample_ffill", oldResample _),
      ("join_interval", oldInterval _),
      ("stream_stream_join", oldSstream _)
    ).filter(p => only.isEmpty || only.contains(p._1))

    for (r <- 1 to reps; (name, oldFn) <- pairs) {
      val newName = if (name.endsWith("_semi")) name.stripSuffix("_semi")
        else if (name.endsWith("_nockpt")) name.stripSuffix("_nockpt")
        else if (name.endsWith("_shj")) name.stripSuffix("_shj")
        else if (name.endsWith("_preagg")) name.stripSuffix("_preagg")
        else if (name.endsWith("_smj")) name.stripSuffix("_smj")
        else if (name.endsWith("_1scan")) name.stripSuffix("_1scan")
        else name
      val newFn = graft.SparkEntry.queries(newName)
      var oT = 0.0; var nT = 0.0; var oC = 0L; var nC = 0L
      val c0 = control()
      if (r % 2 == 1) {
        oT = time { oC = oldFn(spark, sfDir).count() }
        nT = time { nC = newFn(spark, sfDir).count() }
      } else {
        nT = time { nC = newFn(spark, sfDir).count() }
        oT = time { oC = oldFn(spark, sfDir).count() }
      }
      val c1 = control()
      spark.catalog.clearCache()
      val ok = if (oC == nC) "rows_eq" else s"ROWS_DIFFER old=$oC new=$nC"
      println(f"rep=$r $name%-34s old=$oT%.2f new=$nT%.2f " +
        f"ctrl=[$c0%.2f,$c1%.2f] $ok")
    }
    spark.stop()
  }
}
