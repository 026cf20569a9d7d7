package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The SQL entry point: the same engine driven through `spark.sql` over
  * registered views — a user of this library can run plain ANSI SQL and
  * get the identical Catalyst plans the DataFrame API produces.
  *
  * Skew handling: `join_skew_salted` demonstrates the salting pattern —
  * the build side is replicated S ways, the probe side scatters each row
  * to one of S salt buckets, so one hot key spreads over S reducers
  * instead of stalling a single one. Results are identical to the
  * unsalted join (the oracle proves it). */
object SqlInterface {
  type Q = (SparkSession, String) => DataFrame

  private val Salts = 8

  val queries: Map[String, Q] = Map(
    // TPC-H Q3 (shipping priority) through spark.sql over temp views.
    // Join-strategy hints pin the 100 TB-correct shape: broadcast the
    // filtered customer dim, SHUFFLE_MERGE the two fact tables on
    // orderkey. Unhinted, Catalyst's size estimates picked the filtered
    // LINEITEM as the broadcast build (fact-table broadcast — a
    // single-threaded multi-hundred-MB hash build here, an OOM at
    // scale). The shuffle join also co-locates the o_orderkey GROUP BY:
    // HashPartitioning(o_orderkey) satisfies the aggregate's clustered
    // distribution, so no further exchange follows the join.
    "sql_tpch_q3" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT /*+ BROADCAST(customer), SHUFFLE_MERGE(lineitem) */
               o_orderkey,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                 AS DECIMAL(18,10))) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 20""")
    }),

    // TPC-H Q5 (local supplier volume): the classic 6-table star —
    // region→nation→supplier chain broadcasts (each a small filtered
    // dim), the three fact-side joins (lineitem⋈orders⋈customer) shuffle
    // on their keys. Same hint rationale as Q3: unhinted, size
    // estimates can put a fact table on the build side.
    "sql_tpch_q5" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      Tables.region(s, d).createOrReplaceTempView("region")
      s.sql("""
        SELECT /*+ BROADCAST(region, nation, supplier),
                   SHUFFLE_MERGE(lineitem, orders, customer) */
               n_name,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                 AS DECIMAL(18,10))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name""")
    }),

    // TPC-H Q10 (returned item reporting): who returned the most revenue
    // in a quarter. Fact-fact join (lineitem R-flagged ⋈ orders in the
    // date window) shuffles on orderkey; the result shuffles once more
    // onto c_custkey for the customer join — which ALSO satisfies the
    // GROUP BY's clustering, so the aggregate rides the join exchange.
    // nation broadcasts. (Reference has no SQL at all; columns adapted
    // to the fixture schema — no c_address/c_phone/c_comment.)
    "sql_tpch_q10" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql("""
        SELECT /*+ BROADCAST(nation), SHUFFLE_MERGE(lineitem, orders) */
               c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                 AS DECIMAL(18,10))) AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")
    }),

    // TPC-H Q17 (small-quantity-order revenue): correlated scalar
    // subquery — Catalyst decorrelates it into an aggregate on
    // l_partkey joined back to the probe side, so the per-part average
    // is computed once per part in a distributed aggregate, never
    // re-executed per outer row (re-check with .explain: one
    // Aggregate + one join, no nested-loop). part is a filtered dim →
    // broadcast. Determinism note: l_quantity is integer-valued, so
    // the double SUM inside AVG is exact in any accumulation order —
    // 0.2*AVG compares bit-identically between Spark and DuckDB.
    "sql_tpch_q17" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT /*+ BROADCAST(part) */
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)""")
    }),

    // TPC-H Q18 (large-volume customer): IN-subquery over an aggregate
    // → Catalyst plans a left-semi join against the HAVING-filtered
    // per-order quantity rollup. Both the semi-join and the outer
    // lineitem join key on l_orderkey, so one HashPartitioning serves
    // the rollup, the semi join, the fact join, AND the final GROUP BY
    // (o_orderkey is in the grouping key) — a single shuffle of
    // lineitem end to end.
    "sql_tpch_q18" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT /*+ SHUFFLE_MERGE(lineitem, orders) */
               c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(l_quantity) > 300)
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100""")
    }),

    // TPC-H Q4 (order priority checking): correlated EXISTS — the one
    // subquery shape Q17/Q18 don't cover. Catalyst rewrites it to a
    // left SEMI join on o_orderkey (first match short-circuits; the
    // probe side never multiplies), keyed on the same partitioning the
    // GROUP BY then reuses. Condition adapted to the fixture schema
    // (no l_commitdate/l_receiptdate): a lineitem shipped > 60 days
    // after the order date marks the order late.
    "sql_tpch_q4" -> ((s, d) => {
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
    }),

    // TPC-H Q12 (shipping modes / priority classes): one orderkey
    // shuffle join, CASE-conditional counts ride the aggregate —
    // conditional aggregation costs nothing extra at scale (same scan,
    // same exchange, two codegen'd counters).
    "sql_tpch_q12" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT /*+ SHUFFLE_MERGE(lineitem, orders) */
               l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN
                      ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                 AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN
                      ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                 AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_linestatus
        ORDER BY l_linestatus""")
    }),

    // TPC-H Q14 (promotion effect): conditional revenue share — a
    // broadcast part-dim join with both the conditional and total sums
    // in one pass; the final percentage is one driver-side division of
    // two exact decimals.
    "sql_tpch_q14" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT /*+ BROADCAST(part) */
               CAST(100.00 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice * (1.0 - l_discount)
                   AS DECIMAL(18,10)) ELSE CAST(0.0 AS DECIMAL(18,10))
                 END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                   AS DECIMAL(18,10))) AS DOUBLE) AS DOUBLE)
                 AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""")
    }),

    // Salted skew join — textbook pattern: the build side is replicated
    // once per salt value; the probe side scatters each row to a salt
    // bucket derived from a NON-key column, so all lineitems of one hot
    // orderkey spread across `Salts` reducers instead of stalling one.
    // Join on (key, salt) then aggregate — answer identical to the plain
    // join, which the oracle proves. (AQE skew-join does this adaptively
    // in Spark 4; the explicit form is for pre-committed partitionings.)
    "join_skew_salted" -> ((s, d) => {
      val salts = s.range(Salts).select(col("id").cast("int").as("o_salt"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .crossJoin(broadcast(salts))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .withColumn("l_salt", pmod(col("l_linenumber"), lit(Salts)).cast("int"))
      li.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_salt") === col("o_salt"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("total_qty"))
    })
  )

  val oracles: Map[String, String] = Map(
    "sql_tpch_q3" ->
      """SELECT o_orderkey,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(18,10))) AS DOUBLE) AS revenue,
         o_orderdate, o_orderpriority
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
           AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
         GROUP BY o_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, o_orderkey
         LIMIT 20""",
    "sql_tpch_q5" ->
      """SELECT n_name,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(18,10))) AS DOUBLE) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
           AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",
    "sql_tpch_q10" ->
      """SELECT c_custkey, c_name,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(18,10))) AS DOUBLE) AS revenue,
         c_acctbal, n_name
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
           AND l_returnflag = 'R'
         GROUP BY c_custkey, c_name, c_acctbal, n_name
         ORDER BY revenue DESC, c_custkey
         LIMIT 20""",
    "sql_tpch_q17" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
           AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_brand = 'Brand#1'
           AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                             FROM lineitem l2
                             WHERE l2.l_partkey = p_partkey)""",
    "sql_tpch_q18" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS total_qty
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                              GROUP BY l_orderkey
                              HAVING SUM(l_quantity) > 300)
         GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 100""",
    "sql_tpch_q4" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",
    "sql_tpch_q12" ->
      """SELECT l_linestatus,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY l_linestatus
         ORDER BY l_linestatus""",
    "sql_tpch_q14" ->
      """SELECT CAST(100.00 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
           THEN CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(18,10)) ELSE CAST(0.0 AS DECIMAL(18,10)) END)
           AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(18,10))) AS DOUBLE) AS DOUBLE) AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""",
    "join_skew_salted" ->
      """SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority"""
  )
}
