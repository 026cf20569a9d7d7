package graft.core

import org.apache.spark.sql.DataFrame

/** Parallelism utilities. */
object Par {
  /** Spread a CPU-heavy per-row pipeline across all cores.
    *
    * The driver fixtures are single-row-group parquet files, so every
    * scan yields exactly one task; signature/feature computation
    * downstream of the scan would serialize on one core without an
    * explicit exchange. At cluster scale the same call is the standard
    * remedy for a CPU-bound stage with too few input splits (the
    * shuffled bytes are tiny relative to the compute they unlock — and
    * AQE can coalesce but never split a scan stage). Use AFTER filters
    * so predicate pushdown still reaches the scan. */
  def fanout(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
