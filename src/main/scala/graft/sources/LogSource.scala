package graft.sources

import java.io.{BufferedReader, File, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.{Map => JMap, UUID}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite,
  Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A minimal TRANSACTIONAL table format over a directory [EXT] — the
  * write half of the DSv2 story (`SeriesSource` is the read half), built
  * on the same commit protocol Delta/Iceberg industrialize:
  *
  *  - Each task's `DataWriter` streams rows to an uncommitted
  *    `part-<uuid>.tsv.gz` file (gzip'd TSV) and hands back the file
  *    name, its row count, and per-column min/max stats as its commit
  *    message; a retried/aborted task deletes its file and its name
  *    never reaches the driver.
  *  - Visibility is ONLY through the `_manifest` file: each commit
  *    appends `add` entries tagged with the next table version (plus
  *    `remove` entries when compaction retires files) and atomically
  *    renames a temp manifest over `_manifest`. Readers list the
  *    manifest, never the directory — orphaned part files from failed
  *    jobs are invisible, which is exactly the atomicity contract a
  *    100 TB pipeline needs from object storage (rename → a metastore
  *    swap in production).
  *  - The READ path uses the manifest stats the way Delta/Iceberg do:
  *    a scan with pushed comparison predicates skips every file whose
  *    [min, max] range can't satisfy them (planning-time file
  *    skipping), and `SupportsPushDownRequiredColumns` prunes the
  *    decoded columns to the projection, so `SELECT one_col WHERE
  *    selective` reads a fraction of the files and decodes a fraction
  *    of each line. Pushed filters remain Spark-side residuals — file
  *    skipping is conservative, never row-exact.
  *  - `truncate()` (overwrite mode) commits a manifest containing only
  *    the new files (a fresh lineage at version 0).
  *
  * Values are tab-separated (long/int/double/string columns; strings
  * must not contain tabs/newlines — a demo codec, not a production
  * one). Stats cover the numeric columns (string min/max would need
  * escaping in the manifest; numeric stats carry the pruning weight
  * for the fact-table layouts this format targets).
  * Usage: df.write.format("graft.sources.GraftLogSource")
  *   .option("path", dir).mode("append"|"overwrite").save()
  */
class GraftLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = GraftLog.dirOf(options.get("path"))
    val f = new File(dir, GraftLog.SchemaFile)
    if (f.exists())
      DataType.fromJson(new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8)).asInstanceOf[StructType]
    else StructType(Nil) // write-side schema comes from the query
  }
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftLogTable(GraftLog.dirOf(properties.get("path")), schema)
}

/** One manifest line. `action` is add/remove; `dataChange=false` marks
  * a compaction add (same rows, new layout) so the change data feed
  * skips it; `stats` maps numeric column name → (min, max) in the TSV
  * cell encoding; `cols` is the file's OWN column list (its write
  * schema) — the per-file schema record that makes additive evolution
  * readable (a TSV line can't self-describe the way a parquet footer
  * does). Empty `cols` = pre-evolution entry: the file carries the
  * full current table schema. Serialized as
  * `version\taction\tfile\trows\tdataChange\tcol=min,max;...\tc1,c2`;
  * legacy 2-field `version\tfile` lines parse as stat-less adds and
  * 6-field lines as cols-less ones. */
case class LogEntry(version: Long, action: String, file: String,
    rows: Long, dataChange: Boolean,
    stats: Map[String, (String, String)],
    cols: Seq[String] = Seq.empty) {
  def isAdd: Boolean = action == "add"
  def serialize: String = {
    val st = stats.toSeq.sortBy(_._1)
      .map { case (c, (mn, mx)) => s"$c=$mn,$mx" }.mkString(";")
    s"$version\t$action\t$file\t$rows\t${if (dataChange) 1 else 0}\t$st" +
      s"\t${cols.mkString(",")}"
  }
}

object LogEntry {
  def add(version: Long, file: String, rows: Long,
      stats: Map[String, (String, String)],
      dataChange: Boolean = true,
      cols: Seq[String] = Seq.empty): LogEntry =
    LogEntry(version, "add", file, rows, dataChange, stats, cols)
  def remove(version: Long, file: String): LogEntry =
    LogEntry(version, "remove", file, -1L, dataChange = false, Map.empty)

  def parse(line: String): LogEntry = {
    def parseStats(st: String): Map[String, (String, String)] =
      st.split(";").filter(_.nonEmpty).map { kv =>
        val eq = kv.indexOf('=')
        val Array(mn, mx) = kv.substring(eq + 1).split(",", 2)
        kv.substring(0, eq) -> (mn, mx)
      }.toMap
    line.split("\t", -1) match {
      case Array(v, f) => // legacy manifest: stat-less add
        LogEntry(v.toLong, "add", f, -1L, dataChange = true, Map.empty)
      case Array(v, act, f, rows, dc, st) =>
        LogEntry(v.toLong, act, f, rows.toLong, dc == "1", parseStats(st))
      case Array(v, act, f, rows, dc, st, cs) =>
        LogEntry(v.toLong, act, f, rows.toLong, dc == "1", parseStats(st),
          cs.split(",").filter(_.nonEmpty).toSeq)
      case _ => throw new IllegalArgumentException(
        s"unparseable graft-log manifest line: $line")
    }
  }
}

object GraftLog {
  val ManifestFile = "_manifest"
  val SchemaFile = "_schema"
  val EpochsFile = "_epochs"

  /** TSV cell encoding of SQL NULL — a control char no demo string
    * carries (the codec already bans tabs/newlines in strings). Needed
    * once schemas evolve: a compacted row may lack a value for a column
    * added after it was written. */
  val NullCell = "\u0000"

  /** The stored table schema, if the table exists. */
  def storedSchema(dir: String): Option[StructType] = {
    val f = new File(dir, SchemaFile)
    if (!f.exists()) None
    else Some(DataType.fromJson(new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8)).asInstanceOf[StructType])
  }

  /** Additive schema evolution (Delta `mergeSchema` in miniature):
    * existing columns keep their position and type — changing a
    * column's type is rejected loudly — and incoming columns not yet in
    * the table append AT THE END as nullable (rows in pre-evolution
    * files read NULL for them). An existing column absent from the
    * incoming write also flips nullable, since the new file's rows have
    * no value for it. Name-keyed, order-insensitive on the incoming
    * side; the table's column order only ever grows at the tail, so
    * positional appends from existing writers keep working. */
  def mergeSchemas(existing: StructType, incoming: StructType): StructType = {
    val incomingByName = incoming.fields.map(f => f.name -> f).toMap
    existing.fields.foreach { ef =>
      incomingByName.get(ef.name).foreach { inf =>
        require(inf.dataType == ef.dataType,
          s"graft-log schema evolution cannot change column '${ef.name}' " +
            s"from ${ef.dataType.simpleString} to ${inf.dataType.simpleString}")
      }
    }
    val existingNames = existing.fieldNames.toSet
    val kept = existing.fields.map(f =>
      if (incomingByName.contains(f.name)) f else f.copy(nullable = true))
    val added = incoming.fields.filter(f => !existingNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(kept ++ added)
  }

  /** Default vacuum retention: part files younger than this are never
    * deleted, so an in-flight concurrent writer's uncommitted parts
    * survive until its commit publishes them (the Delta/Iceberg
    * retention-horizon guard; an orphan from a genuinely failed job is
    * reclaimed by the next vacuum after the horizon passes). */
  val DefaultVacuumRetentionMs: Long = 10L * 60 * 1000

  def committedEpochs(dir: String): Set[Long] = {
    val f = new File(dir, EpochsFile)
    if (!f.exists()) Set.empty
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).map(_.toLong).toSet
  }

  /** Epoch-idempotent publish for streaming: a replayed micro-batch
    * (restart re-running an already-committed epoch) is a no-op, which
    * upgrades the sink to exactly-once under Structured Streaming's
    * epoch-replay recovery contract. */
  def publishEpoch(dir: String, epochId: Long, files: Seq[GraftLogCommit],
      schema: StructType): Unit = synchronized {
    if (!committedEpochs(dir).contains(epochId)) {
      val v = nextVersion(dir)
      val merged =
        storedSchema(dir).map(mergeSchemas(_, schema)).getOrElse(schema)
      publish(dir, entries(dir) ++
        files.map(c => LogEntry.add(v, c.file, c.rows, c.stats,
          cols = c.cols)), merged)
      val tmp = Paths.get(dir, s"$EpochsFile.tmp.${UUID.randomUUID()}")
      Files.write(tmp, (committedEpochs(dir) + epochId).toSeq.sorted
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, Paths.get(dir, EpochsFile),
        StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Path validation only — no side effects. A READ of a mistyped or
    * nonexistent table path must fail (or see an empty manifest), not
    * silently create the directory; writers create it via [[ensureDir]]
    * at part-file open and at publish. */
  def dirOf(path: String): String = {
    require(path != null && path.nonEmpty,
      "graft-log requires option(\"path\", dir)")
    path
  }

  def ensureDir(dir: String): String = { new File(dir).mkdirs(); dir }

  /** All manifest entries (adds and removes), oldest version first. */
  def entries(dir: String): Seq[LogEntry] = {
    val m = new File(dir, ManifestFile)
    if (!m.exists()) Seq.empty
    else new String(Files.readAllBytes(m.toPath), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).map(LogEntry.parse).toSeq
  }

  /** Live data files at the current version (removes applied). */
  def committedFiles(dir: String): Seq[String] =
    entriesAsOf(dir, Long.MaxValue).map(_.file)

  /** Live `add` entries visible at `version`: adds with ver ≤ version,
    * minus files removed at ver ≤ version (compaction retires files
    * from NEWER snapshots while older snapshots keep seeing them —
    * the Delta/Iceberg log-replay rule in miniature). */
  def entriesAsOf(dir: String, version: Long): Seq[LogEntry] = {
    val upTo = entries(dir).filter(_.version <= version)
    val removed = upTo.filter(!_.isAdd).map(_.file).toSet
    upTo.filter(e => e.isAdd && !removed.contains(e.file))
  }

  def filesAsOf(dir: String, version: Long): Seq[String] =
    entriesAsOf(dir, version).map(_.file)

  /** Change data feed on an append-only table: the data-changing files
    * committed AFTER `fromVersion` (exclusive) up to `toVersion`
    * (inclusive) ARE the delta — an incremental consumer reads exactly
    * the new rows, never rescanning history. Compaction adds carry
    * dataChange=false and are excluded (same rows, new layout), so a
    * feed spanning a compaction never double-counts. */
  def changedEntriesBetween(dir: String, fromVersion: Long,
      toVersion: Long): Seq[LogEntry] =
    entries(dir).filter(e => e.isAdd && e.dataChange &&
      e.version > fromVersion && e.version <= toVersion)

  def currentVersion(dir: String): Long =
    entries(dir).map(_.version).maxOption.getOrElse(-1L)

  def nextVersion(dir: String): Long = currentVersion(dir) + 1

  /** Vacuum: delete unreferenced part files — orphans from
    * failed/aborted jobs (invisible to readers, but they hold space).
    * Files younger than `minAgeMs` are always kept: an in-flight
    * concurrent writer's uncommitted parts look exactly like orphans
    * until its commit, and deleting them would publish a manifest of
    * missing files (the retention horizon Delta/Iceberg enforce; pass
    * 0 only when no write can be in progress). By default `referenced`
    * is every add in history, so time travel keeps working for every
    * committed version. With `expireHistory = true` only the CURRENT
    * snapshot's files are kept — reclaiming pre-compaction parts at
    * the documented price that time travel to versions needing the
    * deleted files now fails loudly (Delta's VACUUM semantics).
    * Returns the deleted names. */
  def vacuum(dir: String, minAgeMs: Long = DefaultVacuumRetentionMs,
      expireHistory: Boolean = false): Seq[String] = synchronized {
    val referenced =
      (if (expireHistory) entriesAsOf(dir, Long.MaxValue)
       else entries(dir).filter(_.isAdd)).map(_.file).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") &&
        !referenced.contains(f.getName) && f.lastModified() <= cutoff)
      .map { f => f.delete(); f.getName }.toSeq
  }

  /** Compaction (small-file OPTIMIZE): rewrite the current snapshot's
    * part files into ONE part, published as a new version that removes
    * the inputs and adds the compacted file with dataChange=false —
    * readers of the new snapshot open one file instead of N, older
    * snapshots still see the original parts (until an expireHistory
    * vacuum), and the change feed sees no new rows. Stats merge from
    * the input entries (min of mins, max of maxes) when every input
    * carries them. The maintenance pass a streaming sink needs run
    * daily: per-epoch commits accumulate unboundedly many small files
    * whose open/listing cost comes to dominate scans. Returns the
    * number of files compacted away (0 = nothing to do). */
  def compact(dir: String): Int = synchronized {
    val live = entriesAsOf(dir, Long.MaxValue)
    if (live.size <= 1) return 0
    val schema = DataType.fromJson(new String(
      Files.readAllBytes(Paths.get(dir, SchemaFile)),
      StandardCharsets.UTF_8)).asInstanceOf[StructType]
    val curCols = schema.fieldNames.toSeq
    val outName = s"part-${UUID.randomUUID()}.tsv.gz"
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      new GZIPOutputStream(Files.newOutputStream(Paths.get(dir, outName))),
      StandardCharsets.UTF_8))
    var rows = 0L
    // Rewrite every live row into the CURRENT column layout: a file
    // written before an evolution has fewer cells, so its rows pad the
    // later columns with the null sentinel. Files already in the
    // current layout stream through unmodified.
    try live.foreach { e =>
      val fileCols = if (e.cols.nonEmpty) e.cols else curCols
      val remap: Option[Array[Int]] =
        if (fileCols == curCols) None
        else Some(curCols.map(fileCols.indexOf).toArray)
      val in = GraftLogReaderFactory.openLines(dir, e.file)
      try {
        var line = in.readLine()
        while (line != null) {
          if (line.nonEmpty) {
            val outLine = remap match {
              case None => line
              case Some(idx) =>
                val cells = line.split("\t", -1)
                idx.map(i => if (i < 0) NullCell else cells(i))
                  .mkString("\t")
            }
            out.write(outLine); out.write("\n"); rows += 1
          }
          line = in.readLine()
        }
      } finally in.close()
    } finally out.close()
    val mergedStats =
      if (live.exists(_.stats.isEmpty)) Map.empty[String, (String, String)]
      else {
        val num = (s: String) => new java.math.BigDecimal(s)
        schema.fields.collect {
          case f if live.forall(_.stats.contains(f.name)) =>
            val mn = live.map(_.stats(f.name)._1)
              .reduce((a, b) => if (num(a).compareTo(num(b)) <= 0) a else b)
            val mx = live.map(_.stats(f.name)._2)
              .reduce((a, b) => if (num(a).compareTo(num(b)) >= 0) a else b)
            f.name -> (mn, mx)
        }.toMap
      }
    val v = nextVersion(dir)
    publish(dir, entries(dir) ++
      live.map(e => LogEntry.remove(v, e.file)) :+
      LogEntry.add(v, outName, rows, mergedStats, dataChange = false,
        cols = curCols),
      schema)
    live.size
  }

  /** Locked batch commit: read-modify-write of the manifest under the
    * same lock `publishEpoch` holds, so two concurrent same-JVM appends
    * to one table serialize instead of the second publish silently
    * dropping the first commit's files. (Cross-process writers need an
    * external lock or metastore CAS — single-writer-per-table is this
    * demo format's documented contract, as in early Delta.) */
  def append(dir: String, fresh: Seq[GraftLogCommit], schema: StructType,
      truncate: Boolean): Unit = synchronized {
    // Truncate resets history to version 0 — overwrite is a new table
    // lineage, not an addendum. An append with extra columns evolves
    // the stored schema additively (mergeSchemas); each entry records
    // its file's own column list so readers decode every vintage.
    val base = if (truncate) Seq.empty else entries(dir)
    val v = if (truncate) 0L else nextVersion(dir)
    val merged = if (truncate) schema
      else storedSchema(dir).map(mergeSchemas(_, schema)).getOrElse(schema)
    publish(dir, base ++
      fresh.map(c => LogEntry.add(v, c.file, c.rows, c.stats,
        cols = c.cols)), merged)
  }

  /** Atomic manifest swap: temp write + rename. The directory is the
    * unit of locking (single-writer per table, as in a metastore CAS). */
  def publish(dir: String, all: Seq[LogEntry],
      schema: StructType): Unit =
    synchronized {
      ensureDir(dir)
      Files.write(Paths.get(dir, SchemaFile),
        schema.json.getBytes(StandardCharsets.UTF_8))
      val tmp = Paths.get(dir, s"$ManifestFile.tmp.${UUID.randomUUID()}")
      Files.write(tmp, all.map(_.serialize).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, Paths.get(dir, ManifestFile),
        StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
}

class GraftLogTable(dir: String, writeSchema: StructType,
    asOfVersion: Long = Long.MaxValue)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_log($dir)"
  override def schema(): StructType = {
    // Reads see the stored schema; a write whose frame carries extra
    // columns sees the stored⊕incoming merge, so Spark's append
    // validation admits the widened frame and the commit then persists
    // the same merge (additive evolution; type changes reject loudly).
    val stored = GraftLog.storedSchema(dir)
    if (writeSchema.isEmpty) stored.getOrElse(writeSchema)
    else stored.map(GraftLog.mergeSchemas(_, writeSchema))
      .getOrElse(writeSchema)
  }
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(new File(dir, GraftLog.SchemaFile).exists(),
      s"graft-log table not found at $dir (no ${GraftLog.SchemaFile}; " +
        "reads never create tables — check the path)")
    val hi = Option(options.get("asOfVersion")).map(_.toLong)
      .getOrElse(asOfVersion)
    // change feed: rows appended in (changesFromVersion, hi]
    val lo = Option(options.get("changesFromVersion")).map(_.toLong)
      .getOrElse(-1L)
    new GraftLogScanBuilder(dir, schema(), hi, lo)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftLogWriteBuilder(dir, info.schema(), truncate = false)
}

/** Scan builder with the two pushdowns that make a table format usable
  * at scale: comparison filters (consumed for manifest-stats file
  * skipping, then returned to Spark as residuals — skipping is
  * file-conservative, not row-exact) and required-column pruning (the
  * reader decodes only projected cells). */
class GraftLogScanBuilder(dir: String, tableSchema: StructType,
    asOfVersion: Long, changesFromVersion: Long) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = tableSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GraftLogScan.usableForSkipping(tableSchema, _))
    filters // all residual: files are skipped, rows are Spark's job
  }
  override def pushedFilters(): Array[Filter] = pushed
  // An empty required schema (count-star) is fine: the reader streams
  // lines and emits zero-column rows without parsing a single cell.
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftLogScan(dir, tableSchema,
    required, pushed, asOfVersion, changesFromVersion)
}

/** Micro-batch writes through the same part-file + manifest protocol;
  * `commit(epochId, ...)` is idempotent per epoch, so a replayed batch
  * after restart publishes nothing twice. */
class GraftLogStreamingWrite(dir: String, schema: StructType)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new StreamingDataWriterFactory {
      private val inner = new GraftLogWriterFactory(dir, schema)
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] =
        inner.createWriter(partitionId, taskId)
    }
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    GraftLog.publishEpoch(dir, epochId,
      messages.collect { case c: GraftLogCommit => c }.toSeq, schema)
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case c: GraftLogCommit =>
      new File(dir, c.file).delete()
    }
}

case class GraftLogCommit(file: String, rows: Long,
    stats: Map[String, (String, String)] = Map.empty,
    cols: Seq[String] = Seq.empty)
    extends WriterCommitMessage

class GraftLogWriteBuilder(dir: String, schema: StructType,
    truncate: Boolean) extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new GraftLogWriteBuilder(dir, schema, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftLogBatchWrite(
      dir, schema, truncate)
    override def toStreaming: StreamingWrite =
      new GraftLogStreamingWrite(dir, schema)
  }
}

class GraftLogBatchWrite(dir: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftLogWriterFactory(dir, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftLog.append(dir,
      messages.collect { case c: GraftLogCommit => c }.toSeq,
      schema, truncate)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case c: GraftLogCommit =>
      new File(dir, c.file).delete()
    }
}

class GraftLogWriterFactory(dir: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val file = s"part-${UUID.randomUUID()}.tsv.gz"
      private val out = {
        GraftLog.ensureDir(dir)
        new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          new GZIPOutputStream(
            Files.newOutputStream(Paths.get(dir, file))),
          StandardCharsets.UTF_8))
      }
      private var rows = 0L
      // Per-column min/max over the numeric columns, tracked as the
      // rows stream through — the footer stats a columnar format
      // collects for free, here paid as two compares per cell.
      private val numericIdx = schema.fields.zipWithIndex.filter {
        case (f, _) => f.dataType match {
          case LongType | IntegerType | DoubleType => true
          case _ => false
        }
      }
      private val mins = Array.fill[Any](numericIdx.length)(null)
      private val maxs = Array.fill[Any](numericIdx.length)(null)
      override def write(row: InternalRow): Unit = {
        val cells = schema.fields.zipWithIndex.map { case (f, i) =>
          if (row.isNullAt(i)) GraftLog.NullCell
          else f.dataType match {
            case LongType => row.getLong(i).toString
            case IntegerType => row.getInt(i).toString
            case DoubleType =>
              java.lang.Double.toString(row.getDouble(i))
            case StringType => row.getUTF8String(i).toString
            case other => throw new IllegalArgumentException(
              s"graft-log does not encode $other")
          }
        }
        var s = 0
        while (s < numericIdx.length) {
          val (f, i) = numericIdx(s)
          val v: Any = if (row.isNullAt(i)) null else f.dataType match {
            case LongType => row.getLong(i)
            case IntegerType => row.getInt(i)
            case DoubleType => row.getDouble(i)
            case _ => null
          }
          def lt(a: Any, b: Any): Boolean = (a, b) match {
            case (x: Long, y: Long) => x < y
            case (x: Int, y: Int) => x < y
            case (x: Double, y: Double) => x < y
            case _ => false
          }
          if (mins(s) == null || lt(v, mins(s))) mins(s) = v
          if (maxs(s) == null || lt(maxs(s), v)) maxs(s) = v
          s += 1
        }
        out.write(cells.mkString("\t")); out.write("\n")
        rows += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        val stats = numericIdx.indices.collect {
          case s if mins(s) != null =>
            numericIdx(s)._1.name ->
              (mins(s).toString, maxs(s).toString)
        }.toMap
        GraftLogCommit(file, rows, stats, schema.fieldNames.toSeq)
      }
      override def abort(): Unit = {
        out.close()
        new File(dir, file).delete()
      }
      override def close(): Unit = ()
    }
}

/** Snapshot-isolated scan: the file list is fixed at PLANNING time from
  * the manifest as of `asOfVersion` (default: latest) — concurrent
  * commits after planning don't shift the read, and any historical
  * version stays reconstructible as long as its files aren't vacuumed
  * (the Delta/Iceberg time-travel contract in miniature). Files whose
  * manifest min/max stats refute a pushed predicate are skipped here,
  * before any I/O — `description()` reports `files=kept/total` and
  * GraftLogSpec asserts kept < total under a selective predicate. */
class GraftLogScan(dir: String, tableSchema: StructType,
    required: StructType, pushed: Array[Filter],
    asOfVersion: Long = Long.MaxValue,
    changesFromVersion: Long = -1L) extends Scan with Batch {
  private val candidates =
    if (changesFromVersion >= 0L)
      GraftLog.changedEntriesBetween(dir, changesFromVersion, asOfVersion)
    else GraftLog.entriesAsOf(dir, asOfVersion)
  private val files = candidates.filter(e =>
    pushed.forall(f => GraftLogScan.mayMatch(tableSchema, e, f)))
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_log $dir asOf=$asOfVersion from=$changesFromVersion " +
      s"files=${files.size}/${candidates.size} " +
      s"pushed=[${pushed.mkString(", ")}] " +
      s"columns=[${required.fieldNames.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(e => GraftLogPartition(dir, e.file, e.cols)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory(tableSchema, required)
}

object GraftLogScan {
  /** A filter is usable for file skipping when it is a comparison on a
    * stats-bearing (numeric) top-level column. */
  def usableForSkipping(schema: StructType, f: Filter): Boolean = {
    def numeric(name: String): Boolean =
      schema.fields.find(_.name == name).exists(_.dataType match {
        case LongType | IntegerType | DoubleType => true
        case _ => false
      })
    f match {
      case EqualTo(a, v) => numeric(a) && v.isInstanceOf[Number]
      case GreaterThan(a, v) => numeric(a) && v.isInstanceOf[Number]
      case GreaterThanOrEqual(a, v) => numeric(a) && v.isInstanceOf[Number]
      case LessThan(a, v) => numeric(a) && v.isInstanceOf[Number]
      case LessThanOrEqual(a, v) => numeric(a) && v.isInstanceOf[Number]
      case In(a, vs) => numeric(a) && vs.nonEmpty &&
        vs.forall(_.isInstanceOf[Number])
      case _ => false
    }
  }

  /** Conservative range check: false ONLY when the file's [min, max]
    * cannot contain a matching row. Entries without stats always may
    * match (legacy manifests). Comparison in BigDecimal so long stats
    * beyond 2^53 don't lose precision through a double detour. */
  def mayMatch(schema: StructType, e: LogEntry, f: Filter): Boolean = {
    def range(col: String): Option[(java.math.BigDecimal,
        java.math.BigDecimal)] =
      e.stats.get(col).map { case (mn, mx) =>
        (new java.math.BigDecimal(mn), new java.math.BigDecimal(mx)) }
    def dec(v: Any): java.math.BigDecimal =
      new java.math.BigDecimal(v.toString)
    // Evolution-aware skip: a comparison on a column the file PREDATES
    // can never match (every row reads NULL for it), so the file is
    // skipped outright — schema evolution gets stats-grade pruning for
    // free on the new column.
    val attr = f match {
      case EqualTo(a, _) => Some(a)
      case GreaterThan(a, _) => Some(a)
      case GreaterThanOrEqual(a, _) => Some(a)
      case LessThan(a, _) => Some(a)
      case LessThanOrEqual(a, _) => Some(a)
      case In(a, _) => Some(a)
      case _ => None
    }
    if (attr.exists(a => e.cols.nonEmpty && !e.cols.contains(a)))
      return false
    f match {
      case EqualTo(a, v) => range(a).forall { case (mn, mx) =>
        dec(v).compareTo(mn) >= 0 && dec(v).compareTo(mx) <= 0 }
      case GreaterThan(a, v) =>
        range(a).forall { case (_, mx) => mx.compareTo(dec(v)) > 0 }
      case GreaterThanOrEqual(a, v) =>
        range(a).forall { case (_, mx) => mx.compareTo(dec(v)) >= 0 }
      case LessThan(a, v) =>
        range(a).forall { case (mn, _) => mn.compareTo(dec(v)) < 0 }
      case LessThanOrEqual(a, v) =>
        range(a).forall { case (mn, _) => mn.compareTo(dec(v)) <= 0 }
      case In(a, vs) => range(a).forall { case (mn, mx) =>
        vs.exists(v => dec(v).compareTo(mn) >= 0 &&
          dec(v).compareTo(mx) <= 0) }
      case _ => true
    }
  }
}

/** `cols` = the file's own column list from its manifest entry (empty
  * for pre-evolution entries: the file carries the full table schema). */
case class GraftLogPartition(dir: String, file: String,
    cols: Seq[String] = Seq.empty)
    extends InputPartition

/** The `t$files` metadata table: one row per manifest entry —
  * (version, action, file, rows, data_change) — the introspection
  * surface maintenance jobs (vacuum planning, compaction policy, CDF
  * consumers) read. Entries are captured at PLANNING time — the
  * listing is as snapshot-consistent as any scan. */
class GraftLogFilesTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft_log_files($dir)"
  override def schema(): StructType = GraftLogFilesTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        private val entries = GraftLog.entries(dir)
        override def readSchema(): StructType = GraftLogFilesTable.Schema
        override def toBatch: Batch = this
        override def description(): String =
          s"graft_log_files $dir entries=${entries.size}"
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftLogFilesPartition(entries))
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(
                p: InputPartition): PartitionReader[InternalRow] = {
              val it = p.asInstanceOf[GraftLogFilesPartition]
                .entries.iterator
              new PartitionReader[InternalRow] {
                private var cur: InternalRow = _
                override def next(): Boolean = {
                  if (!it.hasNext) return false
                  val e = it.next()
                  cur = new GenericInternalRow(Array[Any](
                    e.version, UTF8String.fromString(e.action),
                    UTF8String.fromString(e.file), e.rows,
                    e.dataChange))
                  true
                }
                override def get(): InternalRow = cur
                override def close(): Unit = ()
              }
            }
          }
      }
    }
}

object GraftLogFilesTable {
  val Schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("action", StringType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("data_change", BooleanType, nullable = false)))
}

case class GraftLogFilesPartition(entries: Seq[LogEntry])
    extends InputPartition

class GraftLogReaderFactory(tableSchema: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftLogPartition]
    // Projection map: required field → cell index in THIS FILE's line
    // layout (the entry's own column list; pre-evolution entries carry
    // the full table schema). -1 = the column post-dates the file: its
    // rows read NULL, the schema-evolution contract.
    val fileCols: Seq[String] =
      if (part.cols.nonEmpty) part.cols else tableSchema.fieldNames.toSeq
    val cellIdx = required.fields.map(f => fileCols.indexOf(f.name))
    new PartitionReader[InternalRow] {
      private val in = GraftLogReaderFactory.openLines(part.dir, part.file)
      private var current: InternalRow = _
      override def next(): Boolean = {
        var line = in.readLine()
        while (line != null && line.isEmpty) line = in.readLine()
        if (line == null) return false
        val cells = line.split("\t", -1)
        // Decode ONLY the projected columns — column pruning's payoff
        // in a row format is skipped parsing (a columnar format would
        // skip the I/O too; the scan-level contract is the same).
        val vals = new Array[Any](required.fields.length)
        var j = 0
        while (j < vals.length) {
          val ci = cellIdx(j)
          val cell = if (ci < 0) GraftLog.NullCell else cells(ci)
          vals(j) =
            if (cell == GraftLog.NullCell) null
            else required.fields(j).dataType match {
              case LongType => cell.toLong
              case IntegerType => cell.toInt
              case DoubleType => cell.toDouble
              case StringType => UTF8String.fromString(cell)
              case other => throw new IllegalArgumentException(
                s"graft-log does not decode $other")
            }
          j += 1
        }
        current = new GenericInternalRow(vals)
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}

object GraftLogReaderFactory {
  /** Line reader dispatching on extension: `.gz` part files (current
    * writer) stream through GZIPInputStream; bare `.tsv` (legacy
    * tables) read plain. */
  def openLines(dir: String, file: String): BufferedReader = {
    val raw = Files.newInputStream(Paths.get(dir, file))
    val in = if (file.endsWith(".gz")) new GZIPInputStream(raw) else raw
    new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
  }
}
