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

  /** The fixture has no partsupp table; TPC-H Q2/Q11/Q16/Q20 run over a
    * DERIVED partsupp — the distinct (partkey, suppkey) pairs actually
    * traded in lineitem, with supplycost/availqty as deterministic
    * integer functions of the keys so the DuckDB oracle rebuilds the
    * identical table (the oracles keep the WITH-ps form). Built ONCE per
    * session+fixture via the ingest-time ArtifactCache convention —
    * previously each of the four queries re-ran the distinct-aggregate
    * over the fact per execution, making q2/q11 the two slowest TPC-H
    * entries (3.98 s + 3.06 s healthy at sf0.1, VERDICT r6 #5). */
  private def derivedPartsupp(s: SparkSession, d: String): DataFrame =
    graft.core.ArtifactCache.persisted(s, d, "tpch_partsupp", "v1") {
      Tables.lineitem(s, d)
        .select(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .distinct()
        .select(col("ps_partkey"), col("ps_suppkey"),
          ((col("ps_partkey") * 31 + col("ps_suppkey") * 7) % 10000)
            .cast("double").divide(lit(100.0)).as("ps_supplycost"),
          ((col("ps_partkey") % 100) * 10 + (col("ps_suppkey") % 50))
            .as("ps_availqty"))
    }

  /** Materialize the derived-partsupp artifact for `d` — the bench
    * drive's build phase calls this directly instead of running a full
    * TPC-H query to reach it. */
  def warmArtifacts(s: SparkSession, d: String): Unit = {
    derivedPartsupp(s, d)
    ()
  }

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
    // r16 note: a pre-aggregated form (revenue summed per orderkey
    // BELOW the join, guide §2.3) was built, oracle-verified, and
    // MEASURED WORSE here — 0.96 s vs 0.70 s bench, 1.15 vs 0.93
    // QRepeat — because the per-order decimal hash aggregate combines
    // only ~2:1 in the shipdate window, so two extra aggregate passes
    // cost more than the ~35% shuffle-byte saving; the canonical form
    // also needs no exchange beyond the join (the GROUP BY rides the
    // orderkey partitioning). Kept canonical; see OPTIMIZATION_r16.md.
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
      // r16: the region/nation dims joined ABOVE supplier, so the ASIA
      // restriction (1/5 of rows) reached customer and supplier only
      // after the fact joins — both shuffled in full. The query's own
      // equalities (s_nationkey = n_nationkey ∈ ASIA via region, and
      // c_nationkey = s_nationkey) imply BOTH dims are ASIA-only, so
      // each side's subquery joins its nation/region dims with the
      // filter inside: supplier and customer prefilter to ASIA before
      // any exchange, and the group key n_name rides the supplier
      // side. Pure join reassociation — identical results, oracle
      // unchanged.
      // Fixture caveat (ADVICE r16): the fixture's o_orderdate range
      // starts 1995-01-01, so q5's canonical [1994,1995) window selects
      // ZERO orders at every SF — the oracle match is real but vacuous
      // (0 rows = 0 rows) and the bench times a short-circuited
      // pipeline. The r16 advisor independently confirmed the rewrite's
      // equivalence in DuckDB on a shifted 1995–1997 window. The window
      // itself stays: this round's contract forbids changing what a
      // declared query computes, and shifting the dates would change
      // the declared result set.
      s.sql("""
        SELECT /*+ BROADCAST(sup),
                   SHUFFLE_MERGE(lineitem, orders, asiacust) */
               n_name,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                 AS DECIMAL(18,10))) AS DOUBLE) AS revenue
        FROM (SELECT /*+ BROADCAST(nation, region) */
                     c_custkey, c_nationkey
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA') asiacust
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN (SELECT /*+ BROADCAST(nation, region) */
                     s_suppkey, s_nationkey, n_name
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA') sup
          ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
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

    // TPC-H Q17 (small-quantity-order revenue): the canonical form is a
    // correlated scalar subquery; Catalyst decorrelates it into an
    // aggregate joined back — which still SCANS LINEITEM TWICE (probe +
    // subquery side, verified in explain). This uses the equivalent
    // one-scan form: broadcast the brand-filtered part dim, then a
    // per-partkey AVG window over the joined frame — one fact scan, one
    // shuffle of only the brand's ~4% of rows. The oracle keeps the
    // canonical correlated form, proving the rewrite is semantics-
    // preserving. Determinism: l_quantity is integer-valued, so the
    // double SUM inside AVG is exact in any accumulation order —
    // 0.2*AVG compares bit-identically between Spark and DuckDB.
    "sql_tpch_q17" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                 AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
        FROM (SELECT /*+ BROADCAST(part) */
                     l_extendedprice, l_quantity,
                     AVG(l_quantity) OVER (PARTITION BY l_partkey)
                       AS avg_qty
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE p_brand = 'Brand#1') t
        WHERE l_quantity < 0.2 * avg_qty""")
    }),

    // TPC-H Q18 (large-volume customer): IN-subquery over an aggregate
    // → Catalyst plans a left-semi join against the HAVING-filtered
    // per-order quantity rollup. Both the semi-join and the outer
    // lineitem join key on l_orderkey, so one HashPartitioning serves
    // the rollup, the semi join, the fact join, AND the final GROUP BY
    // (o_orderkey is in the grouping key) — a single shuffle of
    // lineitem end to end.
    // One-pass form (r16): the canonical IN-subquery shape scanned
    // lineitem TWICE (once for the HAVING aggregate, once joined into
    // the outer block) and shuffled orders on custkey plus customer
    // fully — 5 exchanges, 2 SortMergeJoins (plans/r16/
    // sql_tpch_q18_before.txt). But the outer GROUP BY keys are all
    // functionally dependent on o_orderkey, and the outer
    // SUM(l_quantity) over the joined rows of one order is exactly the
    // subquery's own per-order aggregate — so compute the per-order
    // sum ONCE (both the HAVING probe and total_qty come from the same
    // aggregate rows) and join the >300 survivors to orders and
    // customer. The survivor set is tiny at every scale (TPC-H Q18
    // selects ~1e-5 of orders), so both joins broadcast the aggregated
    // side: lineitem is scanned once, and orders/customer are scanned
    // but never shuffled. 1 exchange (the map-side-combined per-order
    // aggregate) instead of 5; 0 sorts below the top-k. The oracle
    // keeps the canonical IN form, proving the rewrite.
    "sql_tpch_q18" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT /*+ BROADCAST(bo) */
               c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               total_qty
        FROM customer
        JOIN (SELECT /*+ BROADCAST(big) */
                     o_orderkey, o_custkey, o_orderdate, o_totalprice,
                     total_qty
              FROM (SELECT l_orderkey,
                           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                             AS DOUBLE) AS total_qty
                    FROM lineitem
                    GROUP BY l_orderkey
                    HAVING SUM(l_quantity) > 300) big
              JOIN orders ON o_orderkey = l_orderkey) bo
          ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100""")
    }),

    // TPC-H Q4 (order priority checking): correlated EXISTS — the one
    // subquery shape Q17/Q18 don't cover. Condition adapted to the
    // fixture schema (no l_commitdate/l_receiptdate): a lineitem
    // shipped > 60 days after the order date marks the order late.
    //
    // One-aggregate form (r17 session 2): the canonical EXISTS
    // decorrelates to a LeftSemi join — and Catalyst's compile-time
    // size estimate put the 2-column lineitem PROJECTION under the
    // broadcast threshold, planning BroadcastHashJoin LeftSemi
    // BuildRight over the ENTIRE projected fact (plans/r17/
    // sql_tpch_q4_before.txt) — a driver-built hashed relation of
    // every lineitem row: slow locally, an OOM at any real scale, and
    // the defect class the (fixed) PlanAudit FACT_BROADCAST detector
    // now catches. Rather than just hint the semi join to shuffle,
    // use the aggregate identity EXISTS(line: l_shipdate > t) ⟺
    // MAX(l_shipdate) > t over the order's lines: pre-aggregate
    // lineitem per orderkey (map-side combined — the exchange carries
    // one (orderkey, max_shipdate) row per order instead of every
    // line), join to the date-windowed orders, and count. The window
    // also implies a pushable fact filter: o_orderdate >= 1996-01-01
    // means the late threshold is >= 1996-03-01, so lines with
    // l_shipdate <= 1996-03-01 can never witness the EXISTS — the
    // conjunct reaches the parquet scan as a PushedFilter. Identical
    // results (orders are unique per orderkey, so the inner join
    // never multiplies); the oracle keeps the canonical EXISTS form,
    // proving the rewrite.
    "sql_tpch_q4" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT /*+ SHUFFLE_MERGE(late) */
               o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        JOIN (SELECT l_orderkey, MAX(l_shipdate) AS max_ship
              FROM lineitem
              WHERE l_shipdate > TIMESTAMP '1996-03-01 00:00:00'
              GROUP BY l_orderkey) late
          ON o_orderkey = l_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND max_ship > o_orderdate + INTERVAL 60 DAYS
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

    // TPC-H Q6 (forecasting revenue change): the pure scan showcase —
    // no join at all. All three predicates and the 2-column projection
    // reach the parquet scan (PushedFilters + ReadSchema), so at 100 TB
    // this reads only the row groups whose shipdate min/max straddle the
    // year and decodes 4 columns, not 11. One partial-agg per split, one
    // single-row exchange.
    "sql_tpch_q6" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount
                 AS DECIMAL(18,10))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24.0""")
    }),

    // TPC-H Q7 (volume shipping between two nations): the two nation
    // dims broadcast under DIFFERENT aliases (n1 keyed by supplier, n2
    // by customer) — the nation-pair disjunction is a post-broadcast
    // filter, so the fact path is still one lineitem⋈orders shuffle on
    // orderkey plus one customer shuffle on custkey. Year extraction is
    // cast BIGINT on both engines (Spark EXTRACT yields INT, DuckDB
    // BIGINT — the cast unifies the gate's schema check).
    "sql_tpch_q7" -> ((s, d) => {
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      // r16: the OR-of-nation-pairs predicate could only evaluate
      // after the LAST join (n2 sat above the custkey SortMergeJoin),
      // so CUSTOMER shuffled in full — the disjunction implies
      // n_name IN (N1, N2) on each side, but Catalyst cannot infer a
      // disjunct's projection across joins. Joining each nation dim
      // inside its own side's subquery with the implied IN filter
      // spelled out lets the broadcast n1/n2 joins prefilter supplier
      // AND customer to the two nations (2/25 of rows) BEFORE any
      // exchange; the OR then references only the two carried name
      // columns. Identical results — the IN predicates are logically
      // implied by the OR the oracle keeps.
      s.sql("""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(volume_dec) AS DOUBLE) AS revenue
        FROM (SELECT /*+ BROADCAST(sup), SHUFFLE_MERGE(lineitem, orders) */
                     sup.supp_nation, cust.cust_nation,
                     CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT)
                       AS l_year,
                     CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(18,10)) AS volume_dec
              FROM (SELECT /*+ BROADCAST(n1) */
                           s_suppkey, n1.n_name AS supp_nation
                    FROM supplier JOIN nation n1
                      ON s_nationkey = n1.n_nationkey
                    WHERE n1.n_name IN ('NATION_1', 'NATION_2')) sup
              JOIN lineitem ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN (SELECT /*+ BROADCAST(n2) */
                           c_custkey, n2.n_name AS cust_nation
                    FROM customer JOIN nation n2
                      ON c_nationkey = n2.n_nationkey
                    WHERE n2.n_name IN ('NATION_1', 'NATION_2')) cust
                ON c_custkey = o_custkey
              WHERE ((supp_nation = 'NATION_1'
                      AND cust_nation = 'NATION_2')
                  OR (supp_nation = 'NATION_2'
                      AND cust_nation = 'NATION_1'))
                AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year""")
    }),

    // TPC-H Q8 (national market share): the full 8-table join. Every
    // dim (part, supplier, both nations, region) broadcasts; only the
    // three fact-ish tables shuffle. The market-share division happens
    // AFTER both sums aggregate as exact decimals — one double division
    // per output year, bit-identical in any engine.
    "sql_tpch_q8" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part")
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      Tables.region(s, d).createOrReplaceTempView("region")
      // r16: as written (left-deep, customer joined before n1/region),
      // the ASIA restriction could only apply ABOVE the custkey
      // SortMergeJoin, so customer shuffled in full. Reassociating the
      // inner joins so customer⋈n1⋈region sits in its own subquery
      // lets the two broadcast dims prefilter customer to the ASIA
      // rows (1/5) before its exchange; the supplier⋈n2 pair likewise
      // rides one broadcast build. Pure join reassociation of inner
      // equi-joins — identical results, oracle unchanged.
      s.sql("""
        SELECT o_year,
               CAST(CAST(SUM(CASE WHEN nation = 'NATION_3'
                       THEN volume_dec
                       ELSE CAST(0.0 AS DECIMAL(18,10)) END) AS DOUBLE)
                 / CAST(SUM(volume_dec) AS DOUBLE) AS DOUBLE)
                 AS mkt_share
        FROM (SELECT /*+ BROADCAST(part, sup),
                         SHUFFLE_MERGE(lineitem, orders, asiacust) */
                     CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
                       AS o_year,
                     CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(18,10)) AS volume_dec,
                     sup.nation
              FROM part JOIN lineitem ON p_partkey = l_partkey
              JOIN (SELECT /*+ BROADCAST(n2) */
                           s_suppkey, n2.n_name AS nation
                    FROM supplier JOIN nation n2
                      ON s_nationkey = n2.n_nationkey) sup
                ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN (SELECT /*+ BROADCAST(n1, region) */ c_custkey
                    FROM customer JOIN nation n1
                      ON c_nationkey = n1.n_nationkey
                    JOIN region ON n1.n_regionkey = r_regionkey
                    WHERE r_name = 'ASIA') asiacust
                ON c_custkey = o_custkey
              WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
                AND p_type = 'PROMO'
             ) all_nations
        GROUP BY o_year
        ORDER BY o_year""")
    }),

    // TPC-H Q9 (product type profit), adapted: the fixture has no
    // partsupp table, so profit omits the ps_supplycost*l_quantity term
    // (amount = extendedprice net of discount). Shape is intact: a LIKE
    // filter on the part dim, 5-way join, group by (nation, year).
    "sql_tpch_q9" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part")
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql("""
        SELECT nation, o_year, CAST(SUM(amount_dec) AS DOUBLE)
                 AS sum_profit
        FROM (SELECT /*+ BROADCAST(part, supplier, nation),
                         SHUFFLE_MERGE(lineitem, orders) */
                     n_name AS nation,
                     CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
                       AS o_year,
                     CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(18,10)) AS amount_dec
              FROM part JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE p_name LIKE '%gear%'
             ) profit
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC""")
    }),

    // TPC-H Q13 (customer order-count distribution): LEFT OUTER join
    // with an extra non-key predicate IN the join condition (orders
    // dropped by the filter still leave their customer with count 0 —
    // a WHERE would delete the customer row instead; the oracle proves
    // the distinction). Two cascaded aggregations: custkey → count,
    // then count → histogram. The first rides the join's custkey
    // partitioning; only the tiny histogram re-shuffles.
    "sql_tpch_q13" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql("""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (SELECT /*+ SHUFFLE_MERGE(orders) */
                     c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey
                AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""")
    }),

    // TPC-H Q15 (top supplier): the canonical form compares against a
    // scalar-subquery MAX over the same revenue view — and Spark plans
    // that subquery as a SECOND full scan+aggregate of lineitem
    // (verified in explain: Subquery:1 re-scans the fact). At 100 TB
    // that doubles the dominant cost. The official query defines
    // `revenue` as a VIEW; here that view — the per-supplier aggregate,
    // catalog-bounded at one row per supplier — is cached, so the fact
    // is scanned once and both the 1-row MAX probe and the final join
    // read the materialization (Catalyst's ReuseExchange does NOT match
    // the two aggregate branches of the unre-used CTE form — verified —
    // hence the explicit cache). An earlier MAX() OVER () form was
    // also one-scan but forced a deliberate single-partition WindowExec
    // whose "No Partition Defined" warning drowned real signals in
    // every bench log (VERDICT r6 #7). Revenue stays decimal through
    // the MAX comparison so ties and the max itself are exact.
    "sql_tpch_q15" -> ((s, d) => {
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice * (1.0 - l_discount)
                 AS DECIMAL(18,10))) AS total_revenue_dec
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey""").cache()
        .createOrReplaceTempView("revenue")
      s.sql("""
        SELECT /*+ BROADCAST(supplier) */
               s_suppkey, s_name,
               CAST(total_revenue_dec AS DOUBLE) AS total_revenue
        FROM revenue
        JOIN (SELECT MAX(total_revenue_dec) AS max_revenue_dec
              FROM revenue) mx
          ON total_revenue_dec = max_revenue_dec
        JOIN supplier ON s_suppkey = supplier_no
        ORDER BY s_suppkey""")
    }),

    // TPC-H Q19 (discounted revenue), adapted: the fixture part table
    // has no p_container and lineitem no l_shipmode/l_shipinstruct, so
    // the three disjunct arms use (brand, size, quantity) only. The
    // point of the query survives: Catalyst must keep the partkey
    // equi-join and evaluate the OR-of-ANDs as a post-join filter
    // (naively distributing the OR into the join condition forces a
    // nested loop). part broadcasts.
    "sql_tpch_q19" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT /*+ BROADCAST(part) */
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                 AS DECIMAL(18,10))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1.0 AND 11.0)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10.0 AND 20.0)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20.0 AND 30.0)""")
    }),

    // TPC-H Q21 (suppliers who kept orders waiting), adapted: no
    // l_commitdate/l_receiptdate in the fixture, so "late" = shipped
    // more than 60 days after the order date (the Q4 convention). The
    // canonical EXISTS + NOT EXISTS pair decorrelates to a semi and an
    // anti join — THREE lineitem scans (verified in explain). This is
    // the equivalent one-scan form: per (order, supplier) late-line
    // counts, then per order the distinct-supplier and late-supplier
    // tallies — a supplier qualifies iff the order has >= 2 suppliers
    // and they are its ONLY late one. Both aggregates ride the
    // orderkey partitioning of the single join (grouping keys contain
    // the join key, so no further exchange). The oracle keeps the
    // canonical subquery form, proving the rewrite is semantics-
    // preserving.
    "sql_tpch_q21" -> ((s, d) => {
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql("""
        WITH j AS (
          SELECT /*+ SHUFFLE_MERGE(lineitem, orders) */
                 l_orderkey, l_suppkey,
                 CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAYS
                      THEN 1 ELSE 0 END AS late
          FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          WHERE o_orderstatus = 'F'),
        per_supp AS (
          SELECT l_orderkey, l_suppkey, SUM(late) AS late_lines
          FROM j GROUP BY l_orderkey, l_suppkey),
        per_order AS (
          SELECT l_orderkey,
                 COUNT(*) AS n_supp,
                 SUM(CASE WHEN late_lines > 0 THEN 1 ELSE 0 END)
                   AS n_late_supp,
                 MAX(CASE WHEN late_lines > 0 THEN l_suppkey END)
                   AS late_supp,
                 MAX(CASE WHEN late_lines > 0 THEN late_lines END)
                   AS late_lines
          FROM per_supp GROUP BY l_orderkey)
        SELECT /*+ BROADCAST(supplier, nation) */
               s_name, CAST(SUM(late_lines) AS BIGINT) AS numwait
        FROM per_order JOIN supplier ON s_suppkey = late_supp
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_supp >= 2 AND n_late_supp = 1 AND n_name = 'NATION_1'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100""")
    }),

    // TPC-H Q22 (global sales opportunity), adapted: no c_phone in the
    // fixture → country code is the nation key; "no orders at all"
    // never happens in the fixture (every customer has orders) → the
    // anti-join condition is "no order since 2000-01-01" (lapsed
    // customers). The threshold comparison avoids AVG-over-double
    // (order-dependent): acctbal*count > sum compares exact decimals,
    // identically in both engines. The NOT EXISTS is a left-anti join
    // on custkey.
    // One-pass threshold (r17 session 2): the canonical form runs the
    // COUNT and SUM threshold probes as TWO separate scalar
    // subqueries — two extra full customer scans and two extra jobs
    // per execution (guide §1.2: don't compute things twice). Both
    // probes aggregate the SAME filtered rows, so one 1-row aggregate
    // computes (count, sum) together and cross-joins in as a
    // broadcast literal — one threshold scan instead of two.
    // Identical values feed the identical comparison; the oracle
    // keeps the canonical two-subquery form, proving the fusion.
    "sql_tpch_q22" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql("""
        SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                 AS totacctbal
        FROM (SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, c_acctbal
              FROM customer
              CROSS JOIN (SELECT COUNT(*) AS th_cnt,
                                 SUM(CAST(c_acctbal AS DECIMAL(18,6)))
                                   AS th_sum
                          FROM customer
                          WHERE c_acctbal > 0.0
                            AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7)) th
              WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
                AND CAST(c_acctbal AS DECIMAL(18,6)) * th_cnt > th_sum
                AND NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey
                                  AND o_orderdate >=
                                        TIMESTAMP '2000-01-01 00:00:00')
             ) custsale
        GROUP BY cntrycode
        ORDER BY cntrycode""")
    }),

    // TPC-H Q2 (minimum-cost supplier) over the cached derived partsupp
    // (see `derivedPartsupp`): canonical form correlates a MIN subquery
    // per part — and like Q17 that re-derives/re-scans the big side.
    // One-scan form: MIN(cost) OVER (PARTITION BY partkey) on the
    // region-filtered join, then keep the rows at the minimum. The
    // oracle keeps the correlated form.
    "sql_tpch_q2" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part")
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      Tables.region(s, d).createOrReplaceTempView("region")
      derivedPartsupp(s, d).createOrReplaceTempView("ps")
      s.sql("""
        WITH eur AS (
          SELECT /*+ BROADCAST(supplier, nation, region, part) */
                 s_acctbal, s_name, n_name, p_partkey, p_brand,
                 ps_supplycost,
                 MIN(ps_supplycost) OVER (PARTITION BY p_partkey)
                   AS min_cost
          FROM ps JOIN part ON p_partkey = ps_partkey
          JOIN supplier ON s_suppkey = ps_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'LARGE')
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
        FROM eur
        WHERE ps_supplycost = min_cost
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100""")
    }),

    // TPC-H Q11 (important stock): per-part inventory value in one
    // nation vs a fraction-of-total threshold from an uncorrelated
    // scalar subquery (a 1-row broadcast). Value sums aggregate as
    // exact decimals; the threshold multiply happens once on the
    // aggregated scalar. The ps view is referenced twice — as the
    // cached derived-partsupp artifact each reference is a scan of the
    // materialized table, exactly as a real partsupp would be.
    "sql_tpch_q11" -> ((s, d) => {
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      derivedPartsupp(s, d).createOrReplaceTempView("ps")
      s.sql("""
        SELECT /*+ BROADCAST(supplier, nation) */
               ps_partkey,
               CAST(SUM(CAST(ps_supplycost * ps_availqty
                 AS DECIMAL(18,6))) AS DOUBLE) AS value
        FROM ps JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY ps_partkey
        HAVING CAST(SUM(CAST(ps_supplycost * ps_availqty
                 AS DECIMAL(18,6))) AS DOUBLE) >
               (SELECT CAST(SUM(CAST(ps_supplycost * ps_availqty
                  AS DECIMAL(18,6))) AS DOUBLE) * 0.001
                FROM ps JOIN supplier ON ps_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_5')
        ORDER BY value DESC, ps_partkey""")
    }),

    // TPC-H Q16 (parts/supplier relationship): supplier counts per
    // (brand, type, size) bucket, excluding a supplier blocklist via
    // NOT IN — the anti-join decorrelation Q21-era rewrites removed
    // from this suite, kept here in its canonical shape. COUNT
    // (DISTINCT suppkey) is the two-phase distinct aggregate: partial
    // (key, suppkey) dedup before the exchange, so the shuffle carries
    // distinct pairs, not raw rows.
    "sql_tpch_q16" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part")
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      derivedPartsupp(s, d).createOrReplaceTempView("ps")
      s.sql("""
        SELECT /*+ BROADCAST(part) */
               p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT)
                 AS supplier_cnt
        FROM ps JOIN part ON p_partkey = ps_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
          AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0.0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
    }),

    // TPC-H Q20 (potential part promotion): the double-nested
    // subquery — suppliers IN (partsupp rows whose part is IN a name
    // filter AND whose stock exceeds half the year's correlated
    // shipment sum). Catalyst turns the outer IN into a semi join,
    // the inner IN into a semi join, and the correlated sum into a
    // decorrelated per-(part, supp) aggregate. l_quantity is
    // integer-valued so 0.5*SUM is exact in any order.
    "sql_tpch_q20" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part")
      Tables.supplier(s, d).createOrReplaceTempView("supplier")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      derivedPartsupp(s, d).createOrReplaceTempView("ps")
      s.sql("""
        SELECT /*+ BROADCAST(nation) */ s_name, s_suppkey
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_2'
          AND s_suppkey IN (
            SELECT ps_suppkey FROM ps
            WHERE ps_partkey IN (SELECT p_partkey FROM part
                                 WHERE p_name LIKE '%bolt%')
              AND ps_availqty >
                  (SELECT 0.5 * SUM(l_quantity) FROM lineitem
                   WHERE l_partkey = ps_partkey
                     AND l_suppkey = ps_suppkey
                     AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                     AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
        ORDER BY s_name""")
    }),

    // Salted skew join — textbook pattern: the build side is replicated
    // once per salt value; the probe side scatters each row to a salt
    // bucket derived from a NON-key column, so all lineitems of one hot
    // orderkey spread across `Salts` reducers instead of stalling one.
    // Join on (key, salt) then aggregate — answer identical to the plain
    // join, which the oracle proves. (AQE skew-join does this adaptively
    // in Spark 4; the explicit form is for pre-committed partitionings.)
    // The shuffle_hash hint (r17): unhinted, Catalyst's size estimate
    // put the projected LINEITEM fact under the broadcast threshold and
    // built it as a driver-side hashed relation (plans/r17/
    // join_skew_salted_before.txt) — the exact shape salting exists to
    // avoid, and the single-threaded build dominated the wall. Hinted,
    // both sides shuffle on (key, salt) and the replicated orders side
    // hash-builds per partition: 0.80–0.88 s vs 1.09 (BHJ) vs 0.84–0.94
    // (shuffle_merge), min-of-5 under the bench action. Per-partition
    // build memory is (|orders|×Salts)/shuffle-partitions — bounded at
    // any scale by the same partition sizing that bounds the salt
    // pattern itself.
    "join_skew_salted" -> ((s, d) => {
      val salts = s.range(Salts).select(col("id").cast("int").as("o_salt"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .crossJoin(broadcast(salts))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .withColumn("l_salt", pmod(col("l_linenumber"), lit(Salts)).cast("int"))
      li.join(o.hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey") &&
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
    "sql_tpch_q2" ->
      """WITH ps AS (
           SELECT DISTINCT l_partkey AS ps_partkey,
                  l_suppkey AS ps_suppkey,
                  CAST((l_partkey * 31 + l_suppkey * 7) % 10000
                    AS DOUBLE) / 100.0 AS ps_supplycost
           FROM lineitem)
         SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
         FROM ps JOIN supplier ON s_suppkey = ps_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         JOIN part ON p_partkey = ps_partkey
         WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'LARGE'
           AND ps_supplycost =
               (SELECT MIN(ps2.ps_supplycost)
                FROM ps ps2
                JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
                JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                WHERE ps2.ps_partkey = p_partkey
                  AND r2.r_name = 'EUROPE')
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         LIMIT 100""",
    "sql_tpch_q11" ->
      """WITH ps AS (
           SELECT DISTINCT l_partkey AS ps_partkey,
                  l_suppkey AS ps_suppkey,
                  CAST((l_partkey * 31 + l_suppkey * 7) % 10000
                    AS DOUBLE) / 100.0 AS ps_supplycost,
                  (l_partkey % 100) * 10 + (l_suppkey % 50)
                    AS ps_availqty
           FROM lineitem)
         SELECT ps_partkey,
           CAST(SUM(CAST(ps_supplycost * ps_availqty
             AS DECIMAL(18,6))) AS DOUBLE) AS value
         FROM ps JOIN supplier ON ps_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name = 'NATION_5'
         GROUP BY ps_partkey
         HAVING CAST(SUM(CAST(ps_supplycost * ps_availqty
                  AS DECIMAL(18,6))) AS DOUBLE) >
                (SELECT CAST(SUM(CAST(ps_supplycost * ps_availqty
                   AS DECIMAL(18,6))) AS DOUBLE) * 0.001
                 FROM ps JOIN supplier ON ps_suppkey = s_suppkey
                 JOIN nation ON s_nationkey = n_nationkey
                 WHERE n_name = 'NATION_5')
         ORDER BY value DESC, ps_partkey""",
    "sql_tpch_q16" ->
      """WITH ps AS (
           SELECT DISTINCT l_partkey AS ps_partkey,
                  l_suppkey AS ps_suppkey
           FROM lineitem)
         SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
         FROM ps JOIN part ON p_partkey = ps_partkey
         WHERE p_brand <> 'Brand#5'
           AND p_type NOT LIKE 'PROMO%'
           AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
           AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_acctbal < 0.0)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "sql_tpch_q20" ->
      """WITH ps AS (
           SELECT DISTINCT l_partkey AS ps_partkey,
                  l_suppkey AS ps_suppkey,
                  (l_partkey % 100) * 10 + (l_suppkey % 50)
                    AS ps_availqty
           FROM lineitem)
         SELECT s_name, s_suppkey
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name = 'NATION_2'
           AND s_suppkey IN (
             SELECT ps_suppkey FROM ps
             WHERE ps_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE '%bolt%')
               AND ps_availqty >
                   (SELECT 0.5 * SUM(l_quantity) FROM lineitem
                    WHERE l_partkey = ps_partkey
                      AND l_suppkey = ps_suppkey
                      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
         ORDER BY s_name""",
    "sql_tpch_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount
           AS DECIMAL(18,10))) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24.0""",
    "sql_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
         CAST(SUM(volume_dec) AS DOUBLE) AS revenue
         FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                      CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT)
                        AS l_year,
                      CAST(l_extendedprice * (1.0 - l_discount)
                        AS DECIMAL(18,10)) AS volume_dec
               FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN customer ON c_custkey = o_custkey
               JOIN nation n1 ON s_nationkey = n1.n_nationkey
               JOIN nation n2 ON c_nationkey = n2.n_nationkey
               WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                 AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
                 AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              ) shipping
         GROUP BY supp_nation, cust_nation, l_year
         ORDER BY supp_nation, cust_nation, l_year""",
    "sql_tpch_q8" ->
      """SELECT o_year,
         CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume_dec
                 ELSE CAST(0.0 AS DECIMAL(18,10)) END) AS DOUBLE)
           / CAST(SUM(volume_dec) AS DOUBLE) AS DOUBLE) AS mkt_share
         FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
                        AS o_year,
                      CAST(l_extendedprice * (1.0 - l_discount)
                        AS DECIMAL(18,10)) AS volume_dec,
                      n2.n_name AS nation
               FROM part JOIN lineitem ON p_partkey = l_partkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN customer ON c_custkey = o_custkey
               JOIN nation n1 ON c_nationkey = n1.n_nationkey
               JOIN region ON n1.n_regionkey = r_regionkey
               JOIN nation n2 ON s_nationkey = n2.n_nationkey
               WHERE r_name = 'ASIA'
                 AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                 AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
                 AND p_type = 'PROMO'
              ) all_nations
         GROUP BY o_year
         ORDER BY o_year""",
    "sql_tpch_q9" ->
      """SELECT nation, o_year, CAST(SUM(amount_dec) AS DOUBLE)
           AS sum_profit
         FROM (SELECT n_name AS nation,
                      CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
                        AS o_year,
                      CAST(l_extendedprice * (1.0 - l_discount)
                        AS DECIMAL(18,10)) AS amount_dec
               FROM part JOIN lineitem ON p_partkey = l_partkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN nation ON s_nationkey = n_nationkey
               WHERE p_name LIKE '%gear%'
              ) profit
         GROUP BY nation, o_year
         ORDER BY nation, o_year DESC""",
    "sql_tpch_q13" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
         FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
               FROM customer LEFT OUTER JOIN orders
                 ON c_custkey = o_custkey
                 AND o_orderpriority <> '1-URGENT'
               GROUP BY c_custkey) c_orders
         GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",
    "sql_tpch_q15" ->
      """SELECT s_suppkey, s_name,
                CAST(total_revenue_dec AS DOUBLE) AS total_revenue
         FROM supplier JOIN (
           SELECT supplier_no, total_revenue_dec,
                  MAX(total_revenue_dec) OVER () AS max_revenue_dec
           FROM (SELECT l_suppkey AS supplier_no,
                        SUM(CAST(l_extendedprice * (1.0 - l_discount)
                          AS DECIMAL(18,10))) AS total_revenue_dec
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
                 GROUP BY l_suppkey) r
         ) revenue ON s_suppkey = supplier_no
         WHERE total_revenue_dec = max_revenue_dec
         ORDER BY s_suppkey""",
    "sql_tpch_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(18,10))) AS DOUBLE) AS revenue
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1.0 AND 11.0)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10.0 AND 20.0)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20.0 AND 30.0)""",
    "sql_tpch_q21" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
         FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders ON o_orderkey = l1.l_orderkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE o_orderstatus = 'F'
           AND n_name = 'NATION_1'
           AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate >
                                   o_orderdate + INTERVAL 60 DAY)
         GROUP BY s_name
         ORDER BY numwait DESC, s_name
         LIMIT 100""",
    "sql_tpch_q22" ->
      """SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
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
         ORDER BY cntrycode""",
    "join_skew_salted" ->
      """SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority"""
  )
}
