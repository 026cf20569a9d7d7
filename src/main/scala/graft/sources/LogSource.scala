package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.{Map => JMap, UUID}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite,
  Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A minimal TRANSACTIONAL table format over a directory [EXT] — the
  * write half of the DSv2 story (`SeriesSource` is the read half), built
  * on the same commit protocol Delta/Iceberg industrialize:
  *
  *  - Each task's `DataWriter` streams rows to an uncommitted
  *    `part-<uuid>.tsv` file and hands the file name back as its commit
  *    message; a retried/aborted task deletes its file and its name
  *    never reaches the driver.
  *  - Visibility is ONLY through the `_manifest` file: `BatchWrite
  *    .commit` writes schema + old-manifest + new-files to a temp file
  *    and atomically renames it over `_manifest`. Readers list the
  *    manifest, never the directory — orphaned part files from failed
  *    jobs are invisible, which is exactly the atomicity contract a
  *    100 TB pipeline needs from object storage (rename → a metastore
  *    swap in production).
  *  - `truncate()` (overwrite mode) commits a manifest containing only
  *    the new files.
  *
  * Values are tab-separated (long/int/double/string columns; strings
  * must not contain tabs/newlines — a demo format, not a codec).
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

object GraftLog {
  val ManifestFile = "_manifest"
  val SchemaFile = "_schema"
  val EpochsFile = "_epochs"

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
  def publishEpoch(dir: String, epochId: Long, files: Seq[String],
      schema: StructType): Unit = synchronized {
    if (!committedEpochs(dir).contains(epochId)) {
      val v = nextVersion(dir)
      publish(dir, committedEntries(dir) ++ files.map(v -> _), schema)
      val tmp = Paths.get(dir, s"$EpochsFile.tmp.${UUID.randomUUID()}")
      Files.write(tmp, (committedEpochs(dir) + epochId).toSeq.sorted
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, Paths.get(dir, EpochsFile),
        StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def dirOf(path: String): String = {
    require(path != null && path.nonEmpty,
      "graft-log requires option(\"path\", dir)")
    new File(path).mkdirs()
    path
  }

  /** Manifest entries are `<version>\t<file>` — each commit tags its
    * files with the next table version, so any historical snapshot is
    * reconstructible (time travel, `asOfVersion` read option). */
  def committedEntries(dir: String): Seq[(Long, String)] = {
    val m = new File(dir, ManifestFile)
    if (!m.exists()) Seq.empty
    else new String(Files.readAllBytes(m.toPath), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).map { l =>
        val Array(v, f) = l.split("\t", 2)
        (v.toLong, f)
      }.toSeq
  }

  def committedFiles(dir: String): Seq[String] =
    committedEntries(dir).map(_._2)

  def filesAsOf(dir: String, version: Long): Seq[String] =
    committedEntries(dir).filter(_._1 <= version).map(_._2)

  /** Change data feed on an append-only table: the files committed
    * AFTER `fromVersion` (exclusive) up to `toVersion` (inclusive) ARE
    * the delta — an incremental consumer reads exactly the new rows,
    * never rescanning history. */
  def filesChangedBetween(dir: String, fromVersion: Long,
      toVersion: Long): Seq[String] =
    committedEntries(dir)
      .filter { case (v, _) => v > fromVersion && v <= toVersion }
      .map(_._2)

  def currentVersion(dir: String): Long =
    committedEntries(dir).map(_._1).maxOption.getOrElse(-1L)

  def nextVersion(dir: String): Long = currentVersion(dir) + 1

  /** Vacuum: delete part files no manifest version references —
    * orphans from failed/aborted jobs (invisible to readers, but they
    * hold space). Returns the deleted names. Deleting UNREFERENCED
    * files only means vacuum can never break a snapshot: time travel
    * keeps working for every committed version, exactly the
    * Delta/Iceberg retention contract (where dropping OLD versions,
    * not orphans, is the destructive variant). */
  def vacuum(dir: String): Seq[String] = synchronized {
    val referenced = committedFiles(dir).toSet
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") &&
        !referenced.contains(f.getName))
      .map { f => f.delete(); f.getName }.toSeq
  }

  /** Atomic manifest swap: temp write + rename. The directory is the
    * unit of locking (single-writer per table, as in a metastore CAS). */
  def publish(dir: String, entries: Seq[(Long, String)],
      schema: StructType): Unit =
    synchronized {
      Files.write(Paths.get(dir, SchemaFile),
        schema.json.getBytes(StandardCharsets.UTF_8))
      val tmp = Paths.get(dir, s"$ManifestFile.tmp.${UUID.randomUUID()}")
      Files.write(tmp,
        entries.map { case (v, f) => s"$v\t$f" }.mkString("\n")
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
    val f = new File(dir, GraftLog.SchemaFile)
    if (f.exists())
      DataType.fromJson(new String(Files.readAllBytes(f.toPath),
        StandardCharsets.UTF_8)).asInstanceOf[StructType]
    else writeSchema
  }
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = {
        val hi = Option(options.get("asOfVersion")).map(_.toLong)
          .getOrElse(asOfVersion)
        // change feed: rows appended in (changesFromVersion, hi]
        val lo = Option(options.get("changesFromVersion")).map(_.toLong)
          .getOrElse(-1L)
        new GraftLogScan(dir, schema(), hi, lo)
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftLogWriteBuilder(dir, info.schema(), truncate = false)
}

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
      messages.collect { case GraftLogCommit(f, _) => f }.toSeq, schema)
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case GraftLogCommit(f, _) =>
      new File(dir, f).delete()
    }
}

case class GraftLogCommit(file: String, rows: Long)
    extends WriterCommitMessage

class GraftLogBatchWrite(dir: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftLogWriterFactory(dir, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fresh = messages.collect { case GraftLogCommit(f, _) => f }.toSeq
    // Truncate resets history to version 0 — overwrite is a new table
    // lineage, not an addendum.
    val base = if (truncate) Seq.empty else GraftLog.committedEntries(dir)
    val v = if (truncate) 0L else GraftLog.nextVersion(dir)
    GraftLog.publish(dir, base ++ fresh.map(v -> _), schema)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case GraftLogCommit(f, _) =>
      new File(dir, f).delete()
    }
}

class GraftLogWriterFactory(dir: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val file = s"part-${UUID.randomUUID()}.tsv"
      private val out = Files.newBufferedWriter(
        Paths.get(dir, file), StandardCharsets.UTF_8)
      private var rows = 0L
      override def write(row: InternalRow): Unit = {
        val cells = schema.fields.zipWithIndex.map { case (f, i) =>
          f.dataType match {
            case LongType => row.getLong(i).toString
            case IntegerType => row.getInt(i).toString
            case DoubleType =>
              java.lang.Double.toString(row.getDouble(i))
            case StringType => row.getUTF8String(i).toString
            case other => throw new IllegalArgumentException(
              s"graft-log does not encode $other")
          }
        }
        out.write(cells.mkString("\t")); out.write("\n")
        rows += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        GraftLogCommit(file, rows)
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
  * (the Delta/Iceberg time-travel contract in miniature). */
class GraftLogScan(dir: String, schema: StructType,
    asOfVersion: Long = Long.MaxValue,
    changesFromVersion: Long = -1L) extends Scan with Batch {
  private val files = GraftLog.filesChangedBetween(
    dir, changesFromVersion, asOfVersion)
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_log $dir asOf=$asOfVersion from=$changesFromVersion " +
      s"files=${files.size}"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => GraftLogPartition(dir, f)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory(schema)
}

case class GraftLogPartition(dir: String, file: String)
    extends InputPartition

/** The `t$files` metadata table: one row per committed manifest entry,
  * (version BIGINT, file STRING). Entries are captured at PLANNING
  * time — the listing is as snapshot-consistent as any scan. */
class GraftLogFilesTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft_log_files($dir)"
  override def schema(): StructType = GraftLogFilesTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        private val entries = GraftLog.committedEntries(dir)
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
                  val (v, f) = it.next()
                  cur = new GenericInternalRow(
                    Array[Any](v, UTF8String.fromString(f)))
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
    StructField("file", StringType, nullable = false)))
}

case class GraftLogFilesPartition(entries: Seq[(Long, String)])
    extends InputPartition

class GraftLogReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftLogPartition]
    new PartitionReader[InternalRow] {
      private val lines = Files.readAllLines(
        Paths.get(part.dir, part.file), StandardCharsets.UTF_8).asScala
        .filter(_.nonEmpty).iterator
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!lines.hasNext) return false
        val cells = lines.next().split("\t", -1)
        val vals: Array[Any] = schema.fields.zipWithIndex.map {
          case (f, i) => f.dataType match {
            case LongType => cells(i).toLong
            case IntegerType => cells(i).toInt
            case DoubleType => cells(i).toDouble
            case StringType => UTF8String.fromString(cells(i))
            case other => throw new IllegalArgumentException(
              s"graft-log does not decode $other")
          }
        }
        current = new GenericInternalRow(vals)
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
