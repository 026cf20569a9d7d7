package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics,
  SupportsPushDownFilters, SupportsPushDownLimit,
  SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full Data Source V2 connector [EXT]: a deterministic series
  * generator table with REAL pushdown — the ingest behaviors that
  * matter at 100 TB, demonstrated end to end:
  *
  *  - **Filter pushdown → partition pruning**: range predicates on `id`
  *    narrow the generated span at PLANNING time, and whole input
  *    partitions outside the span are never created — the DSv2
  *    equivalent of parquet row-group pruning. The scan description
  *    reports `slices=kept/total`, asserted in SeriesSourceSpec.
  *  - **Column pruning**: `pruneColumns` hands the reader the narrowed
  *    schema; readers materialize ONLY requested fields (a pruned `tag`
  *    is never even formatted). `ReadSchema` in explain shows the cut.
  *  - **Deterministic content**: every field is a pure integer function
  *    of `id` (Knuth multiplicative hash), so the DuckDB oracle rebuilds
  *    the identical table from `range()` — the source's correctness is
  *    gated exactly like every operator.
  *
  * Row shape: id BIGINT, bucket INT = id % 97, value DOUBLE =
  * ((id * 2654435761) % 100000) / 100.0, tag STRING = 't' || id % 7.
  *
  * Usage: spark.read.format("graft.sources.SeriesSource")
  *   .option("n", rows).option("slices", partitions).load()
  */
class SeriesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeriesTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SeriesTable(
      Option(properties.get("n")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("slices")).map(_.toInt).getOrElse(8))
  override def supportsExternalMetadata(): Boolean = false
}

object SeriesTable {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  def bucketOf(id: Long): Int = (id % 97).toInt
  def valueOf(id: Long): Double = ((id * 2654435761L) % 100000L) / 100.0
  def tagOf(id: Long): String = "t" + (id % 7)
}

class SeriesTable(n: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_series(n=$n)"
  override def schema(): StructType = SeriesTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeriesScanBuilder(n, slices)
}

/** Pushdown happens here, at planning: range filters on `id` tighten
  * [lo, hi) and are CONSUMED (returned array = the residual Spark must
  * still evaluate — empty for the accepted shapes, so the plan carries
  * no duplicate Filter node for them). Everything else is left to
  * Spark unevaluated-residual style, exactly how a file source treats
  * non-pushable predicates. */
class SeriesScanBuilder(n: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {
  private var lo = 0L
  private var hi = n
  private var accepted = Array.empty[Filter]
  private var required: StructType = SeriesTable.Schema

  /** LIMIT pushes FULLY: the generator is ordered and deterministic, so
    * "any limit rows" is exactly the first `limit` ids of the (already
    * filter-narrowed) span — the scan then plans only the slices that
    * span those ids, the DSv2 analogue of a file source stopping after
    * the first row groups. `lo + limit` saturates instead of wrapping
    * (a span already near Long.MaxValue must not wrap to an empty
    * negative bound). */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, satAdd(lo, limit.toLong))
    true
  }
  override def isPartiallyPushed(): Boolean = false

  /** a + b clamped to Long.MaxValue — the exclusive-bound arithmetic
    * below turns `id > MaxValue` / `id <= MaxValue` into +1 on the
    * boundary value; a wrapping add would make the all-false filter
    * keep every row (it was CONSUMED, so Spark never re-checks) and
    * the all-true one prune to empty. */
  private def satAdd(a: Long, b: Long): Long = {
    val s = a + b
    if (((a ^ s) & (b ^ s)) < 0) Long.MaxValue else s
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case GreaterThan("id", _: java.lang.Long) => true
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case LessThan("id", _: java.lang.Long) => true
      case LessThanOrEqual("id", _: java.lang.Long) => true
      case EqualTo("id", _: java.lang.Long) => true
      case _ => false
    }
    ok.foreach {
      case GreaterThan("id", v: java.lang.Long) =>
        // id > MaxValue is all-false: the saturated lo empties the span
        lo = math.max(lo,
          if (v.longValue() == Long.MaxValue) Long.MaxValue
          else v.longValue() + 1)
      case GreaterThanOrEqual("id", v: java.lang.Long) =>
        lo = math.max(lo, v.longValue())
      case LessThan("id", v: java.lang.Long) => hi = math.min(hi, v.longValue())
      case LessThanOrEqual("id", v: java.lang.Long) =>
        hi = math.min(hi, satAdd(v.longValue(), 1L))
      case EqualTo("id", v: java.lang.Long) =>
        lo = math.max(lo, v.longValue())
        hi = math.min(hi, satAdd(v.longValue(), 1L))
      case _ => ()
    }
    accepted = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SeriesScan(n, slices, lo, hi, required)
}

class SeriesScan(n: Long, slices: Int, lo: Long, hi: Long,
    required: StructType) extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType = required

  /** Pushdown-AWARE statistics: row count and bytes reflect the
    * narrowed [lo, hi) span and the pruned schema, not the full table —
    * so Catalyst/AQE sees a filtered read of this source as small and
    * can pick a broadcast join where the unfiltered table would
    * shuffle. File sources get this from footer metadata; a custom
    * source has to report it. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, hi - lo)
    // id 8B + bucket 4B + value 8B + tag ~2B, per surviving column
    private val perRow = required.fields.map(_.name).map {
      case "id" => 8L
      case "bucket" => 4L
      case "value" => 8L
      case _ => 2L
    }.sum.max(1L)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * perRow)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  /** Slice [0, n) evenly; keep only slices intersecting the pushed
    * [lo, hi) — pruning visible in `description()` and in the partition
    * count the executor sees. */
  private def kept: Seq[(Long, Long)] = {
    val per = math.max(1L, (n + slices - 1) / slices)
    (0L until n by per)
      .map(s => (math.max(s, lo), math.min(s + per, hi)))
      .filter { case (a, b) => a < b }
  }

  override def description(): String = {
    // Denominator computed the same way the partitioner slices (per =
    // ceil(n/slices) → ceil(n/per) slices), so kept/total never
    // misreports pruning when n is not divisible by `slices`.
    val per = math.max(1L, (n + slices - 1) / slices)
    val total = math.max(1L, (n + per - 1) / per)
    s"graft_series n=$n span=[$lo,$hi) slices=${kept.size}/$total"
  }
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    kept.map { case (a, b) => SeriesPartition(a, b) }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new SeriesReaderFactory(required)
}

case class SeriesPartition(start: Long, end: Long) extends InputPartition

class SeriesReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  /** Vectorized read path — the contract Parquet's vectorized reader
    * uses: rows are materialized 4096 at a time into column vectors
    * and handed to the engine as ColumnarBatch, so downstream
    * whole-stage codegen consumes columns without per-row iterator
    * overhead (the plan shows the BatchScan feeding ColumnarToRow).
    * This is the read shape that matters at 100 TB; the row reader
    * below remains as the API-required fallback. */
  override def supportColumnarReads(p: InputPartition): Boolean = true
  override def createColumnarReader(
      p: InputPartition): PartitionReader[
        org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.ColumnarBatch
    val part = p.asInstanceOf[SeriesPartition]
    new PartitionReader[ColumnarBatch] {
      private var id = part.start
      private var batch: ColumnarBatch = _
      override def next(): Boolean = {
        if (batch != null) { batch.close(); batch = null }
        if (id >= part.end) return false
        val n = math.min(4096L, part.end - id).toInt
        val vecs = required.fields.map(f =>
          new OnHeapColumnVector(n, f.dataType))
        var r = 0
        while (r < n) {
          val i = id + r
          var c = 0
          while (c < required.fields.length) {
            required.fields(c).name match {
              case "id" => vecs(c).putLong(r, i)
              case "bucket" => vecs(c).putInt(r, SeriesTable.bucketOf(i))
              case "value" => vecs(c).putDouble(r, SeriesTable.valueOf(i))
              case "tag" =>
                val b = SeriesTable.tagOf(i)
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8)
                vecs(c).putByteArray(r, b)
              case other => throw new IllegalArgumentException(
                s"unknown column $other")
            }
            c += 1
          }
          r += 1
        }
        id += n
        batch = new ColumnarBatch(
          vecs.toArray[org.apache.spark.sql.vectorized.ColumnVector], n)
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit =
        if (batch != null) { batch.close(); batch = null }
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[SeriesPartition]
    new PartitionReader[InternalRow] {
      private var id = part.start - 1
      // Field generators bound ONCE per reader from the pruned schema —
      // the per-row loop does no name lookups and skips pruned columns
      // entirely.
      private val gens: Array[Long => Any] = required.fields.map(_.name).map {
        case "id" => (i: Long) => i
        case "bucket" => (i: Long) => SeriesTable.bucketOf(i)
        case "value" => (i: Long) => SeriesTable.valueOf(i)
        case "tag" => (i: Long) => UTF8String.fromString(SeriesTable.tagOf(i))
        case other => throw new IllegalArgumentException(
          s"unknown column $other")
      }
      override def next(): Boolean = { id += 1; id < part.end }
      override def get(): InternalRow =
        new GenericInternalRow(gens.map(g => g(id)))
      override def close(): Unit = ()
    }
  }
}
