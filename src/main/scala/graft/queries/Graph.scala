package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Distributed graph analytics over a co-purchase graph derived from
  * lineitem (parts are nodes; an edge connects two parts that appear in
  * the same order). Absent from the reference surface — built Spark-first
  * as part of the [EXT] analytics layer.
  *
  * Scale notes (the whole point of these queries): naive triangle
  * counting joins edges three ways and its wedge intermediate is
  * sum_v deg(v)^2 — quadratic in the hottest node's degree, which is the
  * thing that kills you at 100 TB (one celebrity node = one task with a
  * billion-row join input). The classic distributed fix (Suri &
  * Vassilvitskii, WWW'11 "Counting Triangles and the Curse of the Last
  * Reducer") is DEGREE ORIENTATION: direct every edge from its
  * lower-(degree, id) endpoint to its higher one. Every triangle then has
  * exactly one node with out-degree 2 within it, so enumerating wedges
  * only from out-edges bounds the intermediate by sum_v outdeg(v)^2 ≤
  * O(m^1.5) REGARDLESS of the degree distribution — a celebrity node has
  * huge in-degree but small out-degree. The DuckDB oracle counts the same
  * triangles the canonical way (a<b<c three-way self-join), proving the
  * oriented algorithm exact, not approximate. */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  /** Distinct undirected edges (pa < pb) of the co-purchase graph.
    * Within-order pair generation is a self-equi-join on l_orderkey —
    * shuffle-partitioned by order, per-order group size is bounded by the
    * schema (an order has few lines), so no group explodes. */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("pa"), col("b.p").as("pb"))
      .distinct()
  }

  val queries: Map[String, Q] = Map(
    // Per-node triangle participation counts via degree orientation.
    "graph_triangles" -> ((s, d) => {
      val e = edges(s, d).localCheckpoint()
      // degree of every endpoint (explode both ends, one hash-agg)
      val deg = e.select(col("pa").as("v"))
        .union(e.select(col("pb").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      // total order: rank = (deg, id); orient each edge low→high
      val ranked = e
        .join(deg.withColumnRenamed("v", "pa").withColumnRenamed("deg", "da"), "pa")
        .join(deg.withColumnRenamed("v", "pb").withColumnRenamed("deg", "db"), "pb")
      val oriented = ranked.select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("pa") < col("pb")),
          struct(col("pa").as("src"), col("pb").as("dst")))
          .otherwise(struct(col("pb").as("src"), col("pa").as("dst")))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        // carry dst rank so wedge pairs can be emitted in rank order
        .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("deg", "ddst"), "dst")
        .localCheckpoint()
      // wedges from out-edges only: (a→b, a→c), emit (lo, hi) by rank so
      // the closing edge is probed with ONE equi-join on (src, dst)
      val wedges = oriented.as("x").join(oriented.as("y"),
          col("x.src") === col("y.src") &&
          (col("x.ddst") < col("y.ddst") ||
            (col("x.ddst") === col("y.ddst") && col("x.dst") < col("y.dst"))))
        .select(col("x.src").as("a"), col("x.dst").as("lo"),
          col("y.dst").as("hi"))
      val tris = wedges.join(oriented.select(col("src").as("lo"),
          col("dst").as("hi")), Seq("lo", "hi"))
      // credit each triangle to all three corners
      tris.select(explode(array(col("a"), col("lo"), col("hi"))).as("part"))
        .groupBy(col("part")).agg(count(lit(1)).as("tri_count"))
    }),

    // Global census: nodes, edges, triangles, max degree — one row.
    "graph_census" -> ((s, d) => {
      val e = edges(s, d).localCheckpoint()
      val deg = e.select(col("pa").as("v"))
        .union(e.select(col("pb").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val ranked = e
        .join(deg.withColumnRenamed("v", "pa").withColumnRenamed("deg", "da"), "pa")
        .join(deg.withColumnRenamed("v", "pb").withColumnRenamed("deg", "db"), "pb")
      val oriented = ranked.select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("pa") < col("pb")),
          struct(col("pa").as("src"), col("pb").as("dst")))
          .otherwise(struct(col("pb").as("src"), col("pa").as("dst")))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("deg", "ddst"), "dst")
        .localCheckpoint()
      val wedges = oriented.as("x").join(oriented.as("y"),
          col("x.src") === col("y.src") &&
          (col("x.ddst") < col("y.ddst") ||
            (col("x.ddst") === col("y.ddst") && col("x.dst") < col("y.dst"))))
        .select(col("x.dst").as("lo"), col("y.dst").as("hi"))
      val tri = wedges.join(oriented.select(col("src").as("lo"),
          col("dst").as("hi")), Seq("lo", "hi"))
        .agg(count(lit(1)).as("n_triangles"))
      val nv = deg.agg(count(lit(1)).as("n_nodes"),
        max(col("deg")).as("max_degree"))
      val ne = e.agg(count(lit(1)).as("n_edges"))
      nv.crossJoin(ne).crossJoin(tri)
        .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
          col("max_degree"))
    }))

  private val edgeCte =
    """op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e AS (SELECT DISTINCT a.p AS pa, b.p AS pb
      |      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p)""".stripMargin

  val oracles: Map[String, String] = Map(
    "graph_triangles" ->
      s"""WITH $edgeCte,
         |t AS (SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
         |      FROM e e1 JOIN e e2 ON e1.pb = e2.pa
         |                JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
         |SELECT part, CAST(COUNT(*) AS BIGINT) AS tri_count
         |FROM (SELECT a AS part FROM t UNION ALL
         |      SELECT b FROM t UNION ALL
         |      SELECT c FROM t)
         |GROUP BY part""".stripMargin,
    "graph_census" ->
      s"""WITH $edgeCte,
         |deg AS (SELECT v, COUNT(*) AS deg FROM
         |        (SELECT pa AS v FROM e UNION ALL SELECT pb FROM e)
         |        GROUP BY v)
         |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
         |       (SELECT CAST(COUNT(*) AS BIGINT)
         |        FROM e e1 JOIN e e2 ON e1.pb = e2.pa
         |                  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
         |         AS n_triangles,
         |       (SELECT CAST(MAX(deg) AS BIGINT) FROM deg) AS max_degree"""
        .stripMargin)
}
