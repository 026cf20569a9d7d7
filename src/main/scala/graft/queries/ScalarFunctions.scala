package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scalar function library — string / date / math / JSON / array — absent
  * from the reference (SURVEY.md §2.6). Everything is a built-in codegen'd
  * function (`org.apache.spark.sql.functions._`): no UDFs anywhere, so all
  * of these run inside WholeStageCodegen and never break column pruning
  * or predicate pushdown around them.
  *
  * Oracle notes: every function chosen here is bit-deterministic across
  * engines (string ops, exact double ops like abs/sqrt/x*x, date part
  * extraction). Engine-variable transcendentals (exp/ln libm last-ulp)
  * are deliberately avoided in oracle-checked queries. */
object ScalarFunctions {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "str_functions" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        substring(col("c_name"), 1, 8).as("prefix"),
        length(col("c_name")).as("name_len"),
        concat(col("c_mktsegment"), lit("_"), col("c_name")).as("tagged"),
        regexp_replace(col("c_name"), lit("Customer#0+"), lit("C")).as("short_name"),
        col("c_name").like("%7").as("ends_in_7"),
        lpad(col("c_mktsegment"), 12, "*").as("padded"),
        trim(lit("  x  ")).as("trimmed"))),

    "date_functions" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        quarter(col("o_orderdate")).as("qtr"),
        datediff(
          lit(java.sql.Date.valueOf("2002-01-01")),
          col("o_orderdate").cast("date")).as("days_to_2002"))),

    "math_functions" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - lit(25.0)).as("abs_dev"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        (col("l_discount") * col("l_discount")).as("disc_sq"),
        greatest(col("l_quantity"), col("l_discount") * lit(100.0)).as("g"),
        least(col("l_tax"), col("l_discount")).as("l"),
        signum(col("l_quantity") - lit(25.0)).cast("int").as("dev_sign"))),

    "json_functions" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"),
        col("event_type"))),

    "array_functions" -> ((s, d) =>
      Tables.embeddings(s, d).select(
        col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_val"),
        element_at(col("embedding"), -1).as("last_val"),
        array_max(col("embedding")).as("max_val"),
        array_min(col("embedding")).as("min_val"),
        // slice() is the op under test; the checked output folds it to a
        // scalar because the driver's pandas hasher can't sort raw list
        // columns. Strict left fold = bit-identical to DuckDB LIST_REDUCE.
        aggregate(slice(col("embedding"), 1, 4), lit(0.0),
          (acc, x) => acc + x.cast("double")).as("head4_sum"))),

    "map_functions" -> ((s, d) =>
      Tables.nation(s, d).select(
        col("n_nationkey"),
        map_from_arrays(array(lit("region"), lit("nation")),
          array(col("n_regionkey").cast("string"), col("n_name"))).as("m"))
      .select(col("n_nationkey"),
        size(col("m")).as("m_size"),
        element_at(col("m"), "region").as("region_str"),
        element_at(col("m"), "nation").as("nation_str"),
        array_join(map_keys(col("m")), ",").as("keys_csv"))),

    // Higher-order array functions (the 100 TB-friendly way to compute
    // over embeddings without ever exploding rows).
    // The transform/filter arrays are built as real intermediate columns
    // (the op under test), then folded to scalars for the checked output —
    // the driver's pandas hasher can't sort raw list columns.
    "array_higher_order" -> ((s, d) =>
      Tables.embeddings(s, d).select(
        col("vec_id"),
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")).as("vec_sum"),
        transform(col("embedding"), x => x.cast("double") * 2.0)
          .as("scaled2"),
        filter(col("embedding"), x => x > lit(0.0f)).as("positives"))
      .select(
        col("vec_id"), col("vec_sum"),
        aggregate(col("scaled2"), lit(0.0), (acc, x) => acc + x)
          .as("scaled2_sum"),
        size(col("positives")).as("positives_n"),
        aggregate(col("positives"), lit(0.0),
          (acc, x) => acc + x.cast("double")).as("positives_sum")))
  )

  val oracles: Map[String, String] = Map(
    "str_functions" ->
      """SELECT c_custkey,
         UPPER(c_name) AS uname,
         LOWER(c_mktsegment) AS lseg,
         SUBSTR(c_name, 1, 8) AS prefix,
         CAST(LENGTH(c_name) AS INTEGER) AS name_len,
         CONCAT(c_mktsegment, '_', c_name) AS tagged,
         REGEXP_REPLACE(c_name, 'Customer#0+', 'C') AS short_name,
         (c_name LIKE '%7') AS ends_in_7,
         LPAD(c_mktsegment, 12, '*') AS padded,
         TRIM('  x  ') AS trimmed
         FROM customer""",
    "date_functions" ->
      """SELECT o_orderkey,
         CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
         CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
         CAST(DAY(o_orderdate) AS INTEGER) AS dom,
         DATE_TRUNC('month', o_orderdate) AS month_start,
         CAST(QUARTER(o_orderdate) AS INTEGER) AS qtr,
         CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
           AS INTEGER) AS days_to_2002
         FROM orders""",
    "math_functions" ->
      """SELECT l_orderkey, l_linenumber,
         ABS(l_quantity - 25.0) AS abs_dev,
         CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
         CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
         SQRT(l_quantity) AS qty_sqrt,
         l_discount * l_discount AS disc_sq,
         GREATEST(l_quantity, l_discount * 100.0) AS g,
         LEAST(l_tax, l_discount) AS l,
         CAST(SIGN(l_quantity - 25.0) AS INTEGER) AS dev_sign
         FROM lineitem""",
    "json_functions" ->
      """SELECT event_id,
         JSON_EXTRACT_STRING(props, '$.k') AS k_str,
         CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k_int,
         event_type
         FROM events""",
    "array_functions" ->
      """SELECT vec_id, label,
         CAST(LEN(embedding) AS INTEGER) AS dim,
         embedding[1] AS first_val,
         embedding[-1] AS last_val,
         LIST_AGGREGATE(embedding, 'max') AS max_val,
         LIST_AGGREGATE(embedding, 'min') AS min_val,
         LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
           LIST_TRANSFORM(embedding[1:4], x -> CAST(x AS DOUBLE))),
           (acc, x) -> acc + x) AS head4_sum
         FROM embeddings""",
    // The oracle reproduces the extracted VALUES directly — it doesn't
    // need DuckDB's map type, since only scalars leave the query.
    "map_functions" ->
      """SELECT n_nationkey,
         CAST(2 AS INTEGER) AS m_size,
         CAST(n_regionkey AS VARCHAR) AS region_str,
         n_name AS nation_str,
         'region,nation' AS keys_csv
         FROM nation""",
    "array_higher_order" ->
      """SELECT vec_id,
         LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
           LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))),
           (acc, x) -> acc + x) AS vec_sum,
         LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
           LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * 2.0)),
           (acc, x) -> acc + x) AS scaled2_sum,
         CAST(LEN(LIST_FILTER(embedding, x -> x > 0.0)) AS INTEGER)
           AS positives_n,
         LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
           LIST_TRANSFORM(LIST_FILTER(embedding, x -> x > 0.0),
             x -> CAST(x AS DOUBLE))),
           (acc, x) -> acc + x) AS positives_sum
         FROM embeddings"""
  )
}
