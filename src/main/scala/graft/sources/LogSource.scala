package graft.sources

import java.io.{BufferedReader, File, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.{Map => JMap, UUID}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn,
  SupportsDelete, SupportsMetadataColumns, SupportsRead,
  SupportsRowLevelOperations, SupportsWrite, Table, TableCapability,
  TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution,
  Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation,
  AggregateFunc, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  Statistics, SupportsPushDownAggregates, SupportsPushDownFilters,
  SupportsPushDownLimit, SupportsPushDownRequiredColumns,
  SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  SupportsTriggerAvailableNow, Offset => StreamOffset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter,
  DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo,
  RequiresDistributionAndOrdering, RowLevelOperation,
  RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{AlwaysFalse, AlwaysTrue, And,
  EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull,
  IsNull, LessThan, LessThanOrEqual, Not, Or}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A minimal TRANSACTIONAL table format over a directory [EXT] — the
  * write half of the DSv2 story (`SeriesSource` is the read half), built
  * on the same commit protocol Delta/Iceberg industrialize:
  *
  *  - Each task's `DataWriter` streams rows to an uncommitted
  *    `part-<uuid>.gcol` file ([[GraftColFile]]: row-group blocks of
  *    per-column gzip chunks + a footer index — splittable, columnar,
  *    block-stats-indexed; pre-r10 `.tsv.gz` parts keep reading) and
  *    hands back the file name, its row count, and per-column min/max
  *    stats as its commit message; a retried/aborted task deletes its
  *    file and its name never reaches the driver.
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
/** An optimistic rewrite lost its concurrency race: between planning
  * and publish, another commit touched a file the rewrite retires.
  * RETRYABLE — replan against the current snapshot and re-run; nothing
  * was committed and no orphan is left visible. (Delta's
  * ConcurrentModificationException family in miniature.) */
class GraftConcurrentModificationException(msg: String)
    extends RuntimeException(msg)

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
    new GraftLogTable(GraftLog.dirOf(properties.get("path")), schema,
      declaredPartitionCol =
        Option(properties.get("partitionCol")).filter(_.nonEmpty),
      typedCdf =
        Option(properties.get("readChangeFeed")).exists(_.toBoolean))
}

/** One manifest line. `action` is add/remove; `dataChange=false` marks
  * a compaction add (same rows, new layout) so the change data feed
  * skips it; `stats` maps numeric column name → (min, max) in the TSV
  * cell encoding; `cols` is the file's OWN column list (its write
  * schema) — the per-file schema record that makes additive evolution
  * readable (a TSV line can't self-describe the way a parquet footer
  * does). Empty `cols` = pre-evolution entry: the file carries the
  * full current table schema. `ts` is the commit wall-clock in epoch
  * millis, stamped at publish (strictly monotone per table — the axis
  * `TIMESTAMP AS OF` resolves against); -1 = unstamped/legacy.
  * Serialized as
  * `version\taction\tfile\trows\tdataChange\tcol=min,max;...\tc1,c2\tts`;
  * legacy 2-field `version\tfile` lines parse as stat-less adds,
  * 6-field as cols-less, 7-field as ts-less ones. */
case class LogEntry(version: Long, action: String, file: String,
    rows: Long, dataChange: Boolean,
    stats: Map[String, (String, String)],
    cols: Seq[String] = Seq.empty,
    ts: Long = -1L) {
  def isAdd: Boolean = action == "add"
  def serialize: String = {
    val st = stats.toSeq.sortBy(_._1)
      .map { case (c, (mn, mx)) => s"$c=$mn,$mx" }.mkString(";")
    s"$version\t$action\t$file\t$rows\t${if (dataChange) 1 else 0}\t$st" +
      s"\t${cols.mkString(",")}\t$ts"
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

  /** Deletion-vector (re)assignment for a live part file (Delta DV /
    * Iceberg position-delete shape): the log replay annotates the
    * file's current `add` with the descriptor instead of replacing it.
    * `descriptor` = (dv file name, deleted-position count); None
    * clears. `dataChange=false`: same layout, fewer visible rows —
    * the append-only change feed cannot express row deletes (the
    * documented CDF limit, as before). */
  def dv(version: Long, file: String,
      descriptor: Option[(String, Long)]): LogEntry =
    LogEntry(version, "dv", file,
      descriptor.map(_._2).getOrElse(0L), dataChange = false,
      Map(GraftLog.DvKey -> (descriptor.map(_._1).getOrElse(""),
        descriptor.map(_._2.toString).getOrElse("0"))))

  /** Application transaction marker (Delta's `SetTransaction` /
    * `txn` action): records that writer `appId` has applied its work
    * through SOURCE version `txnVersion`, in the SAME commit as the
    * data it wrote — which is what makes an incremental consumer
    * (streaming sink, materialized-view refresh) exactly-once across
    * crashes: a retry reads the marker back and skips the span it
    * already applied, because marker and data became visible
    * atomically. Keyed as `txn:<appId>` so log replay's
    * latest-action-per-key rule keeps exactly the newest marker per
    * writer and can never collide with a part-file name; snapshot
    * planning and the change feed ignore the action (not an add),
    * while checkpoints carry the latest marker forward so it
    * survives log expiration. */
  def txn(version: Long, appId: String, txnVersion: Long): LogEntry =
    LogEntry(version, "txn", s"txn:$appId", txnVersion,
      dataChange = false, Map.empty)

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
      case Array(v, act, f, rows, dc, st, cs, ts) =>
        LogEntry(v.toLong, act, f, rows.toLong, dc == "1", parseStats(st),
          cs.split(",").filter(_.nonEmpty).toSeq, ts.toLong)
      case _ => throw new IllegalArgumentException(
        s"unparseable graft-log manifest line: $line")
    }
  }
}

object GraftLog {
  val ManifestFile = "_manifest"
  val SchemaFile = "_schema"
  val EpochsFile = "_epochs"
  val PartitionFile = "_partition"

  /** Temp-file + atomic-rename publish for every metadata file (schema,
    * partition declaration, constraints, views) — the same contract the
    * manifest swap honors: a crash mid-write can never leave a
    * truncated metadata file that later fails to parse or silently
    * drops state. */
  def atomicWrite(path: java.nio.file.Path, bytes: Array[Byte]): Unit = {
    val tmp = path.resolveSibling(
      s"${path.getFileName}.tmp.${UUID.randomUUID()}")
    Files.write(tmp, bytes)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Identity partition column of the table, if declared (via
    * `CREATE TABLE ... PARTITIONED BY (col)` or
    * `option("partitionCol", col)` on the first write). */
  def partitionColOf(dir: String): Option[String] = {
    val f = new File(dir, PartitionFile)
    if (!f.exists()) None
    else Some(new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8).trim).filter(_.nonEmpty)
  }

  val ConstraintsFile = "_constraints"

  /** Stored CHECK constraints: (name, predicate SQL), one per line as
    * `name=base64(sql)`. Reported through `Table.constraints()`, which
    * is what makes Spark's own write path ENFORCE them — every INSERT
    * / UPDATE / MERGE write plan gains a violation check, the Delta
    * CHECK-constraint contract with the engine doing the work. */
  def constraintsOf(dir: String): Seq[(String, String)] = {
    val f = new File(dir, ConstraintsFile)
    if (!f.exists()) Seq.empty
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).map { l =>
        val i = l.indexOf('=')
        l.substring(0, i) -> new String(
          java.util.Base64.getDecoder.decode(l.substring(i + 1)),
          StandardCharsets.UTF_8)
      }.toSeq
  }

  private def writeConstraints(dir: String,
      cs: Seq[(String, String)]): Unit = {
    ensureDir(dir)
    atomicWrite(Paths.get(dir, ConstraintsFile),
      cs.map { case (n, sql) =>
        s"$n=${java.util.Base64.getEncoder.encodeToString(
          sql.getBytes(StandardCharsets.UTF_8))}"
      }.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  def addConstraint(dir: String, name: String, sql: String): Unit =
    synchronized {
      require(!constraintsOf(dir).exists(_._1 == name),
        s"constraint $name already exists on $dir")
      writeConstraints(dir, constraintsOf(dir) :+ (name -> sql))
    }

  def dropConstraint(dir: String, name: String,
      ifExists: Boolean): Unit = synchronized {
    val cs = constraintsOf(dir)
    require(ifExists || cs.exists(_._1 == name),
      s"no constraint $name on $dir")
    writeConstraints(dir, cs.filterNot(_._1 == name))
  }

  /** `allowChange` = an overwrite (truncate) commit: the table lineage
    * resets, so redeclaring a different partition column is legal — an
    * APPEND to an already-partitioned table must keep the layout. */
  def setPartitionCol(dir: String, col: String,
      allowChange: Boolean = false): Unit = {
    ensureDir(dir)
    val existing = partitionColOf(dir)
    require(allowChange || existing.forall(_ == col),
      s"table at $dir is already partitioned by ${existing.get}, " +
        s"cannot repartition by $col (overwrite the table to relayout)")
    atomicWrite(Paths.get(dir, PartitionFile),
      col.getBytes(StandardCharsets.UTF_8))
  }

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
        // an incoming NARROWER type is admitted after a widening
        // ALTER: the merge keeps the stored (wider) type and Spark's
        // store-assignment cast lifts the frame to it
        require(inf.dataType == ef.dataType ||
            SafeWidenings.contains(inf.dataType -> ef.dataType),
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

  // ---- column rename / drop (Delta column-mapping 'name' mode in
  // miniature) ------------------------------------------------------
  /** Field-metadata key listing the names this column was previously
    * written under, newest first. Part files are name-keyed, so
    * RENAME COLUMN is metadata-only: the trail recorded here lets
    * readers, stats skipping, and compaction resolve each file's
    * LOCAL name for the column — no data rewrite, and files written
    * after the rename carry the new name natively. */
  val FormerlyKey = "graft.formerly"
  /** Table property tombstoning every name DROP COLUMN retired
    * (including the dropped column's former names). A name-keyed
    * format can never re-admit such a name: old part files still
    * carry cells under it, and a re-added column would silently
    * resurrect their stale values — the exact hazard Iceberg's field
    * ids and Delta's physical names exist to prevent. Rejecting reuse
    * keeps name-keying sound without per-file id maps. */
  val DroppedColsProp = "graft.cols.dropped"

  /** The names this schema field was previously written under. */
  def formerNames(f: StructField): Seq[String] =
    if (f.metadata.contains(FormerlyKey))
      f.metadata.getStringArray(FormerlyKey).toSeq
    else Seq.empty

  /** Every name no NEW column may take: the former names of live
    * columns (their cells still exist in old files) and every
    * tombstoned dropped name. */
  def reservedNames(dir: String, schema: StructType): Set[String] =
    schema.fields.flatMap(formerNames).toSet ++ droppedNames(dir)

  /** Tombstoned names of DROPPED columns alone (no live trails). */
  def droppedNames(dir: String): Set[String] =
    propertiesOf(dir).get(DroppedColsProp)
      .map(_.split(",").filter(_.nonEmpty)
        .map(decodeColName).toSet)
      .getOrElse(Set.empty)

  // Tombstoned names travel through a comma-joined property value, so
  // each name is URL-encoded first — a (backtick-quoted) column name
  // containing a comma must not split into bogus entries and lose its
  // own reservation.
  private def encodeColName(n: String): String =
    java.net.URLEncoder.encode(n, "UTF-8")
  private def decodeColName(n: String): String =
    java.net.URLDecoder.decode(n, "UTF-8")

  /** Additive evolution must never claim a RESERVED name — the former
    * name of a renamed live column, or a dropped column's tombstone:
    * old files still carry cells under it, and a new column taking
    * the name would silently resurrect their stale values. Called by
    * every non-truncating write path that merges an incoming schema
    * (an overwrite replaces all data, so it frees the names). */
  def requireNoReservedAdds(dir: String, merged: StructType): Unit =
    storedSchema(dir).foreach { stored =>
      val fresh = merged.fieldNames.toSet -- stored.fieldNames.toSet
      if (fresh.nonEmpty) {
        val hit = fresh.intersect(reservedNames(dir, stored))
        require(hit.isEmpty,
          s"cannot add column(s) ${hit.mkString(", ")} at $dir: the " +
            "name was previously used by a renamed or dropped " +
            "column (old files still carry cells under it) — pick " +
            "a different name")
      }
    }

  /** The name under which the part file behind `e` wrote schema
    * column `name` — `name` itself unless the file predates a rename,
    * in which case the column's recorded former name that appears in
    * the file's own column list applies. Entries with no column
    * record wrote the then-current schema positionally; a rename
    * never changes position or count, so their positional mapping
    * under the CURRENT names stays correct. */
  def fileLocalName(schema: StructType, e: LogEntry,
      name: String): String =
    if (e.cols.isEmpty || e.cols.contains(name)) name
    else schema.fields.find(_.name == name)
      .flatMap(f => formerNames(f).find(e.cols.contains))
      .getOrElse(name)

  /** Shared guard for rename/drop: the column must not anchor the
    * table's identity partitioning (per-file partition-value records
    * and layout grouping are keyed by it) and must not be referenced
    * by a CHECK constraint (its stored SQL would silently stop
    * resolving). */
  private def requireUnanchored(dir: String, name: String,
      op: String): Unit = {
    require(!partitionColOf(dir).contains(name),
      s"cannot $op column '$name': it is the table's partition " +
        "column")
    // backtick is NOT excluded: a constraint may reference the column
    // as `name`, and the quoted form must trip the guard too
    val word = ("""(?i)(?<!\w)""" +
      java.util.regex.Pattern.quote(name) + """(?!\w)""").r
    constraintsOf(dir).foreach { case (cn, sql) =>
      require(word.findFirstIn(sql).isEmpty,
        s"cannot $op column '$name': CHECK constraint $cn " +
          s"references it ($sql) — drop the constraint first")
    }
  }

  /** RENAME COLUMN from → to: metadata-only (no part file changes).
    * The new field keeps its type, nullability, and metadata, and
    * records `from` at the head of its former-name trail so every
    * pre-rename file keeps serving its data. */
  def renameColumn(dir: String, from: String, to: String): Unit =
    synchronized {
      val schema = storedSchema(dir).getOrElse(
        throw new IllegalArgumentException(s"no graft-log table at $dir"))
      val f = schema.fields.find(_.name == from).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$from' at $dir"))
      require(!schema.fieldNames.contains(to),
        s"cannot rename '$from' to '$to': column already exists")
      // reserved by OTHERS only: renaming a column BACK to its own
      // former name is safe — the old cells under that name belong to
      // this very column, and the trail resolves every vintage
      val byOthers = schema.fields.filterNot(_.name == from)
        .flatMap(formerNames).toSet ++ droppedNames(dir)
      require(!byOthers.contains(to),
        s"cannot rename '$from' to '$to': the name was previously " +
          "used by another column (old files still carry cells " +
          "under it)")
      requireUnanchored(dir, from, "rename")
      val meta = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata)
        .putStringArray(FormerlyKey,
          (from +: formerNames(f)).toArray)
        .build()
      val updated = StructType(schema.fields.map(x =>
        if (x.name == from) x.copy(name = to, metadata = meta) else x))
      atomicWrite(Paths.get(dir, SchemaFile),
        updated.json.getBytes(StandardCharsets.UTF_8))
    }

  /** Safe type WIDENINGS (the Delta 4.0 type-widening feature, free
    * here by construction): part-file cells are decimal text, so a
    * reader decoding them at the wider type is exact — no rewrite, no
    * per-file conversion. Long→Double is deliberately absent: longs
    * beyond 2^53 would silently lose precision through the double
    * parse. */
  val SafeWidenings: Set[(DataType, DataType)] =
    Set(IntegerType -> LongType, IntegerType -> DoubleType)

  /** ALTER COLUMN type widening: metadata-only — the stored schema
    * re-types the field and every file (old and new) keeps decoding
    * exactly, because the on-disk cells are text. Narrowings and
    * lossy changes reject loudly. */
  def widenColumn(dir: String, name: String, to: DataType): Unit =
    synchronized {
      val schema = storedSchema(dir).getOrElse(
        throw new IllegalArgumentException(s"no graft-log table at $dir"))
      val f = schema.fields.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column '$name' at $dir"))
      if (f.dataType == to) return
      require(SafeWidenings.contains(f.dataType -> to),
        s"cannot change column '$name' from " +
          s"${f.dataType.simpleString} to ${to.simpleString}: only " +
          "lossless widenings (" + SafeWidenings.map { case (a, b) =>
            s"${a.simpleString}->${b.simpleString}" }.mkString(", ") +
          ") are metadata-safe on the text encoding")
      require(!partitionColOf(dir).contains(name),
        s"cannot widen column '$name': it is the table's partition " +
          "column (per-file partition-value records are typed)")
      val updated = StructType(schema.fields.map(x =>
        if (x.name == name) x.copy(dataType = to) else x))
      atomicWrite(Paths.get(dir, SchemaFile),
        updated.json.getBytes(StandardCharsets.UTF_8))
    }

  /** DROP COLUMN: metadata-only — the stored schema narrows, old
    * files keep their (now invisible) cells, and the name plus its
    * former-name trail tombstone so no later column can claim the
    * orphaned cells. Requires every file in retained history to carry
    * a column record: a pre-evolution file is read positionally under
    * the CURRENT schema, and narrowing it would shift every later
    * column's cells (compact() stamps records on such tables).
    * Reads — time travel included — always resolve against the
    * CURRENT schema, so a dropped column is invisible in historical
    * snapshots too (the single-schema contract; Iceberg keeps
    * per-snapshot schemas and shows the old column there). */
  def dropColumn(dir: String, name: String): Unit = synchronized {
    val schema = storedSchema(dir).getOrElse(
      throw new IllegalArgumentException(s"no graft-log table at $dir"))
    val f = schema.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no column '$name' at $dir"))
    require(schema.fields.length > 1,
      s"cannot drop '$name': it is the table's only column")
    requireUnanchored(dir, name, "drop")
    // ALL retained history, not just the live snapshot: a time-travel
    // read (or RESTORE) can resurrect an older cols-less add, and a
    // positional read under the narrowed schema would serve the WRONG
    // column's cells for every field past the dropped one. History
    // survives in TWO places once expireLog has run — the segment
    // files (legacy manifest + commit tail) AND the checkpoints the
    // expired commits were folded into — so the guard must scan both:
    // a live cols-less add can exist ONLY inside a checkpoint
    // (ADVICE r9), and entries() never reads checkpoints.
    val ckptLive = listVersioned(dir, CheckpointPrefix)
      .flatMap { case (v, f) => readCheckpoint(v, f).live }
    val colsless = (entries(dir) ++ ckptLive)
      .filter(e => e.isAdd && e.cols.isEmpty && e.rows != 0L)
    require(colsless.isEmpty,
      s"cannot drop '$name': ${colsless.size} file(s) in retained " +
        "history carry no column record and are read positionally — " +
        "compact() and expire the pre-compaction history first")
    val updated = StructType(schema.fields.filterNot(_.name == name))
    val dead = (name +: formerNames(f)).map(encodeColName) ++
      propertiesOf(dir).get(DroppedColsProp).toSeq
        .flatMap(_.split(",").filter(_.nonEmpty))
    setProperties(dir,
      Map(DroppedColsProp -> dead.distinct.mkString(",")))
    atomicWrite(Paths.get(dir, SchemaFile),
      updated.json.getBytes(StandardCharsets.UTF_8))
  }

  /** Default vacuum retention: part files younger than this are never
    * deleted, so an in-flight concurrent writer's uncommitted parts
    * survive until its commit publishes them (the Delta/Iceberg
    * retention-horizon guard; an orphan from a genuinely failed job is
    * reclaimed by the next vacuum after the horizon passes). */
  val DefaultVacuumRetentionMs: Long = 10L * 60 * 1000

  /** Cap on the driver-side distinct-key probe set a string-keyed
    * MERGE builds for bloom file-targeting — beyond it, the batch
    * rewrites conservatively (it would admit most files anyway). */
  val MaxMergeProbeKeys = 10000

  // ---- deletion vectors (merge-on-read DELETE) ---------------------
  /** Reserved stats key carrying a live add's deletion-vector
    * descriptor: (dv file name, deleted-position count). Snapshot
    * replay bakes it into the add entry, so checkpoints persist DV
    * state for free and every reader sees it on the entry it plans. */
  val DvKey = "__dv"

  /** Session conf as a byte count, parsed with Spark's own byte-string
    * parser — '128MB', '64k', and plain digits are all valid, exactly
    * like `spark.sql.files.maxPartitionBytes` itself (a naive digit
    * strip would read '128MB' as 128 BYTES and plan millions of
    * splits). Falls back to `default` when no active session, unset,
    * or unparseable. Driver-side only. */
  def byteConf(key: String, default: => Long): Long =
    scala.util.Try(org.apache.spark.sql.SparkSession.active).toOption
      .flatMap(s => Option(s.conf.get(key, null)))
      .flatMap(v => scala.util.Try(
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v))
        .toOption)
      .filter(_ > 0L)
      .getOrElse(default)

  /** Reserved stats key carrying the part file's exact UNCOMPRESSED
    * payload size (raw cell characters), stamped by the gcol writer —
    * the scan's CBO `sizeInBytes` reads it instead of guessing
    * on-disk × expansion, so auto-broadcast decisions near the
    * threshold are made on real numbers. Not a column stat (column
    * keys are `col#suffix`; this is file-level). */
  val RawBytesKey = "#raw"

  /** The entry's DV descriptor, if one is assigned (empty name =
    * cleared). */
  def dvOf(e: LogEntry): Option[(String, Long)] =
    e.stats.get(DvKey).filter(_._1.nonEmpty)
      .map { case (f, c) => (f, c.toLong) }

  /** Visible rows of a live entry: physical rows minus DV'd positions
    * (unknown counts stay unknown). */
  def effectiveRows(e: LogEntry): Long =
    if (e.rows < 0L) e.rows else e.rows - dvOf(e).map(_._2).getOrElse(0L)

  /** Cap on the driver-held position set a merge-on-read DELETE may
    * accumulate per call — beyond it the delete falls back to the
    * copy-on-write rewrite (a bigger delete rewrites less than it
    * would spend on oversized DVs; Delta bounds DV growth the same
    * way before compacting them away). */
  val MaxDvPositions = 100000

  def committedEpochs(dir: String): Set[Long] = {
    val f = new File(dir, EpochsFile)
    if (!f.exists()) Set.empty
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).map(_.toLong).toSet
  }

  /** Writer identity the streaming sink's epoch markers commit under
    * — epoch ids are monotone per query, so applied-through IS the
    * newest epoch. */
  val EpochAppId = "graft-epoch"

  /** Epoch-idempotent publish for streaming: a replayed micro-batch
    * (restart re-running an already-committed epoch) is a no-op, which
    * upgrades the sink to exactly-once under Structured Streaming's
    * epoch-replay recovery contract. The epoch id rides the commit as
    * a [[LogEntry.txn]] marker — data and idempotence record become
    * visible ATOMICALLY, so the crash window between a commit and a
    * post-commit ledger write cannot exist (the older side-ledger
    * file also lost epochs to concurrent read-modify-writes; it is
    * still read for tables written before the marker scheme). */
  def publishEpoch(dir: String, epochId: Long, files: Seq[GraftLogCommit],
      schema: StructType): Unit = synchronized {
    val seen = lastTxnVersion(dir, EpochAppId) >= epochId ||
      committedEpochs(dir).contains(epochId)
    if (!seen && files.nonEmpty) {
      val merged =
        storedSchema(dir).map(mergeSchemas(_, schema)).getOrElse(schema)
      requireNoReservedAdds(dir, merged)
      commitNew(dir, merged)(v =>
        files.map(c => LogEntry.add(v, c.file, c.rows, c.stats,
          cols = c.cols)) :+ LogEntry.txn(v, EpochAppId, epochId))
    }
    // an EMPTY epoch needs no record: its replay is empty too
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

  // ---- log storage: commit files + checkpoints ---------------------
  // The metadata plane is a sequence of per-version COMMIT files plus
  // periodic reconciled CHECKPOINTS — the Delta/Iceberg shape,
  // replacing the earlier single flat `_manifest` that was re-read and
  // re-written in full on every operation (O(history) planning, and a
  // read-modify-write race across processes):
  //
  //   _commit.<v>      that version's entries, one file per commit.
  //                    CLAIMED with a hard-link CAS — link(2) fails
  //                    EEXIST atomically, so of two PROCESSES racing
  //                    version v exactly one wins and the loser
  //                    retries at v+1; no commit can silently drop
  //                    another (optimistic concurrency without
  //                    conflict validation, the early-Delta level; a
  //                    production deployment swaps the link CAS for a
  //                    metastore compare-and-swap).
  //   _checkpoint.<v>  the reconciled live `add` set as of v, written
  //                    every [[CheckpointInterval]] commits (header
  //                    line carries the running max commit stamp).
  //                    Snapshot planning reads O(live + tail): the
  //                    newest checkpoint at-or-below the target
  //                    version plus the ≤interval commits after it —
  //                    never the full history. Checkpoints are KEPT,
  //                    so time travel to ANY version is also
  //                    O(live + interval).
  //   _manifest        the legacy flat file, read-only compatibility:
  //                    parsed as the base segment below every commit
  //                    file; new commits never rewrite it.

  val CommitPrefix = "_commit."
  val CheckpointPrefix = "_checkpoint."

  /** Commits between reconciled checkpoints (Delta checkpoints every
    * 10 commits for the same reason: bound the replay tail). */
  val CheckpointInterval = 10

  private def versionedName(prefix: String, v: Long): String =
    f"$prefix$v%020d"

  /** (version, file) pairs for a metadata prefix, version-ascending.
    * Listing only — no file content is read here, which is what keeps
    * [[currentVersion]] an O(1)-reads operation. */
  private def listVersioned(dir: String,
      prefix: String): Seq[(Long, File)] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(prefix) &&
        !f.getName.contains(".tmp."))
      .map(f => f.getName.substring(prefix.length).toLong -> f)
      .sortBy(_._1).toSeq

  private def readEntryLines(f: File): Seq[LogEntry] =
    new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .linesIterator.filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(LogEntry.parse).toSeq

  /** The legacy flat manifest, if present — the base history segment
    * of a table written before the commit-file layout. */
  private def legacyEntries(dir: String): Seq[LogEntry] = {
    val m = new File(dir, ManifestFile)
    if (!m.exists()) Seq.empty else readEntryLines(m)
  }

  private case class Checkpoint(version: Long, maxTs: Long,
      live: Seq[LogEntry])

  private def readCheckpoint(v: Long, f: File): Checkpoint = {
    val text = new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8)
    val lines = text.linesIterator.toSeq
    // header: `#checkpoint v=<v> maxTs=<t>` — maxTs is the max commit
    // stamp across ALL history at-or-below v (including entries the
    // reconciliation dropped): the clamp base that keeps the
    // version→timestamp map strictly monotone across checkpoints
    val maxTs = lines.headOption.filter(_.startsWith("#checkpoint"))
      .flatMap(_.split("maxTs=").lift(1)).map(_.trim.toLong)
      .getOrElse(-1L)
    Checkpoint(v, maxTs,
      lines.filter(l => l.nonEmpty && !l.startsWith("#"))
        .map(LogEntry.parse))
  }

  /** FULL history (every add and remove, oldest version first) — the
    * introspection path: `t$files`, `t$history`, TIMESTAMP-AS-OF
    * resolution, vacuum's referenced set. Snapshot PLANNING never
    * calls this; it goes through [[snapshotAsOf]]'s checkpoint+tail
    * read. */
  def entries(dir: String): Seq[LogEntry] =
    legacyEntries(dir) ++ listVersioned(dir, CommitPrefix)
      .flatMap { case (_, f) => readEntryLines(f) }

  /** Live data files at the current version (removes applied). */
  def committedFiles(dir: String): Seq[String] =
    entriesAsOf(dir, Long.MaxValue).map(_.file)

  /** A snapshot plan plus its read provenance — which checkpoint
    * seeded it and how many segment files (legacy manifest + commit
    * files) were parsed. GraftLogSpec asserts planning stays
    * O(live + tail) once checkpoints exist, whatever the table's
    * commit count. */
  case class SnapshotPlan(entries: Seq[LogEntry],
      checkpointVersion: Option[Long], segmentsRead: Int,
      txns: Seq[LogEntry] = Seq.empty)

  /** Live `add` entries visible at `version`: seed from the newest
    * checkpoint at-or-below it, then replay the commit tail in version
    * order with the LATEST action per file winning — a compaction's
    * remove retires a file from newer snapshots (older ones keep
    * seeing it), and a later re-add (RESTORE) resurrects it. The
    * Delta/Iceberg reconciliation rule; a remove-is-forever shortcut
    * would silently empty a restored snapshot. */
  /** Replay one entry into the latest-action-per-file map. A `dv`
    * entry never replaces the file's add — it re-annotates the live
    * add's [[DvKey]] descriptor (or clears it), and is ignored for a
    * file that is not currently live. A fresh add naturally resets DV
    * state (its stats carry no [[DvKey]]). */
  private def applyEntry(
      latest: scala.collection.mutable.LinkedHashMap[String, LogEntry],
      e: LogEntry): Unit =
    if (e.action == "dv")
      latest.get(e.file).filter(_.isAdd).foreach { add =>
        val base = add.stats - DvKey
        latest(e.file) = dvOf(e) match {
          case Some((f, c)) =>
            add.copy(stats = base + (DvKey -> (f, c.toString)))
          case None => add.copy(stats = base)
        }
      }
    else latest(e.file) = e

  def snapshotAsOf(dir: String, version: Long): SnapshotPlan = {
    // Horizon guard: replaying a version below everything the
    // retained log covers (history expired by [[expireLog]]) must
    // fail loudly, not return a silently empty snapshot.
    val oldest = oldestReplayableVersion(dir)
    if (oldest > 0L && version < oldest)
      throw new IllegalArgumentException(
        s"version $version of $dir predates the retained log " +
          s"(oldest replayable: $oldest — history was expired)")
    val ckpt = listVersioned(dir, CheckpointPrefix)
      .filter(_._1 <= version).lastOption
      .map { case (v, f) => readCheckpoint(v, f) }
    val latest =
      scala.collection.mutable.LinkedHashMap.empty[String, LogEntry]
    ckpt.foreach(_.live.foreach(e => latest(e.file) = e))
    val floor = ckpt.map(_.version).getOrElse(-1L)
    var segs = 0
    if (ckpt.isEmpty) {
      val leg = legacyEntries(dir)
      if (leg.nonEmpty) segs += 1
      leg.filter(_.version <= version).foreach(e => applyEntry(latest, e))
    }
    listVersioned(dir, CommitPrefix)
      .filter { case (v, _) => v > floor && v <= version }
      .foreach { case (_, f) =>
        segs += 1
        readEntryLines(f).foreach(e => applyEntry(latest, e))
      }
    SnapshotPlan(latest.valuesIterator.filter(_.isAdd).toSeq,
      ckpt.map(_.version), segs,
      txns = latest.valuesIterator.filter(_.action == "txn").toSeq)
  }

  /** Highest source version writer `appId` has recorded as applied to
    * this table (via [[LogEntry.txn]] markers), or -1 if it never
    * wrote one. O(live + tail) — the marker rides the same
    * checkpoint+tail replay as snapshot planning, so the idempotence
    * check an incremental refresh runs before doing any work costs a
    * metadata read, never a scan. */
  def lastTxnVersion(dir: String, appId: String): Long =
    snapshotAsOf(dir, Long.MaxValue).txns
      .filter(_.file == s"txn:$appId").map(_.rows).maxOption
      .getOrElse(-1L)

  /** Marker-only commit: record `appId`-applied-through-`txnVersion`
    * with no data change (the bootstrap stamp — incremental refreshes
    * instead attach the marker to their merge commit so marker and
    * data land atomically). */
  def commitTxn(dir: String, appId: String, txnVersion: Long): Long = {
    val schema = storedSchema(dir).getOrElse(
      throw new IllegalArgumentException(
        s"graft-log table not found at $dir"))
    commitNew(dir, schema)(v => Seq(LogEntry.txn(v, appId, txnVersion)))
  }

  /** Every part file ANY log structure references: full mainline
    * history (a removed file still serves older snapshots), checkpoint
    * live sets (after [[expireLog]] they may be the ONLY reference),
    * branch commits, staged audits. The abort paths delete only files
    * NOT in this set — Spark calls `BatchWrite.abort` when `commit()`
    * throws, and a commit can throw AFTER its hard-link CAS has
    * already published the version (tmp delete, checkpoint I/O; found
    * by the r15 kill-window torture), so an unconditional delete of
    * the "aborted" files would tear a committed snapshot. */
  def referencedFiles(dir: String): Set[String] = {
    val sideEntries = Option(new File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => !f.getName.contains(".tmp.") &&
        (f.getName.startsWith("_branch.") ||
          f.getName.startsWith(CheckpointPrefix)))
      .flatMap(readEntryLines).toSeq
    val staged = listStagedIds(dir).flatMap(stagedEntries(dir, _))
    (entries(dir) ++ sideEntries ++ staged).map(_.file).toSet
  }

  def entriesAsOf(dir: String, version: Long): Seq[LogEntry] =
    snapshotAsOf(dir, version).entries

  def filesAsOf(dir: String, version: Long): Seq[String] =
    entriesAsOf(dir, version).map(_.file)

  /** Change data feed on an append-only table: the data-changing files
    * committed AFTER `fromVersion` (exclusive) up to `toVersion`
    * (inclusive) ARE the delta — an incremental consumer reads exactly
    * the new rows, never rescanning history. Only the commit files in
    * the span are opened (O(span), not O(history) — what keeps a
    * streaming source's per-batch planning bounded by the append
    * rate). Compaction adds carry dataChange=false and are excluded
    * (same rows, new layout), so a feed spanning a compaction never
    * double-counts. */
  def changedEntriesBetween(dir: String, fromVersion: Long,
      toVersion: Long): Seq[LogEntry] = {
    val leg = legacyEntries(dir).filter(e =>
      e.version > fromVersion && e.version <= toVersion)
    val tail = listVersioned(dir, CommitPrefix)
      .filter { case (v, _) => v > fromVersion && v <= toVersion }
      .flatMap { case (_, f) => readEntryLines(f) }
    (leg ++ tail).filter(e => e.isAdd && e.dataChange)
  }

  /** Parse a manifest stat pair, None when absent OR unparseable
    * (NaN/Infinity stats from a frozen writer compare) — consumers
    * degrade to may-match / conservative-include instead of crashing
    * planning with a NumberFormatException. */
  def decStat(e: LogEntry, col: String): Option[(java.math.BigDecimal,
      java.math.BigDecimal)] =
    e.stats.get(col).flatMap { case (mn, mx) =>
      try Some((new java.math.BigDecimal(mn),
        new java.math.BigDecimal(mx)))
      catch { case _: NumberFormatException => None }
    }

  /** Loud guard for incremental consumers: a change span starting
    * below the retained horizon cannot be reconstructed (expire-log
    * deleted those commit files; their changes survive only folded
    * into a checkpoint) — failing beats silently serving the tail. */
  def requireSpanReplayable(dir: String, fromVersion: Long): Unit = {
    val h = oldestReplayableVersion(dir)
    require(h <= 0L || fromVersion >= h,
      s"change span from version $fromVersion at $dir is below the " +
        s"retained horizon $h (history expired) — re-bootstrap the " +
        "consumer from a snapshot instead")
  }

  /** TRUE when (fromVersion, toVersion] contains a change an
    * insert-only consumer cannot replay from the add feed: a
    * row-level rewrite (removes paired with dataChange adds), a
    * metadata-only delete (removes with no adds), a RESTORE
    * (dataChange re-adds), or a deletion-vector assignment. Pure
    * layout rewrites (compaction, z-order: removes paired with ONLY
    * dataChange=false adds) stay replayable — they change no visible
    * rows. O(span) commit-file walk. */
  def spanHasNonAppendChanges(dir: String, fromVersion: Long,
      toVersion: Long): Boolean = {
    val leg = legacyEntries(dir).filter(e =>
      e.version > fromVersion && e.version <= toVersion)
    val tail = listVersioned(dir, CommitPrefix)
      .filter { case (v, _) => v > fromVersion && v <= toVersion }
      .flatMap { case (_, f) => readEntryLines(f) }
    (leg ++ tail).groupBy(_.version).values.exists { es =>
      val removes = es.exists(_.action == "remove")
      // ANY dv action counts — a CLEARING dv (restore resurrecting
      // DV'd rows) changes visible rows just like an assignment
      val dvTouched = es.exists(_.action == "dv")
      val dataAdds = es.exists(e => e.isAdd && e.dataChange)
      dvTouched || (removes && (dataAdds || !es.exists(_.isAdd)))
    }
  }

  /** TRUE when version `v` changed visible rows beyond appends
    * WITHOUT publishing CDC sidecars — the one span shape the typed
    * feed cannot express exactly (e.g. Spark's SQL UPDATE/MERGE
    * replace-data plan on a CDF-enabled table): its rewrite adds
    * would re-deliver carried rows as inserts. A typed consumer must
    * re-seed from the snapshot at `v` instead. */
  def versionLacksCdcCoverage(dir: String, v: Long): Boolean = {
    val es = (legacyEntries(dir) ++ listVersioned(dir, CommitPrefix)
      .filter(_._1 == v).flatMap { case (_, f) => readEntryLines(f) })
      .filter(_.version == v)
    if (es.exists(_.action == "cdc")) return false
    val removes = es.exists(_.action == "remove")
    val dvTouched = es.exists(_.action == "dv")
    val dataAdds = es.exists(e => e.isAdd && e.dataChange)
    dvTouched || (removes && (dataAdds || !es.exists(_.isAdd)))
  }

  /** Typed change feed: the TSV column carrying each CDC row's change
    * kind (insert | update_preimage | update_postimage | delete). */
  val ChangeTypeCol = "_change_type"
  /** CDC sidecar file prefix — distinct from `part-` so snapshot
    * scans, vacuum reference rules, and compaction never confuse the
    * two populations. */
  val CdcPrefix = "cdc-"
  /** Typed CDC is opt-in per table (Delta's
    * `delta.enableChangeDataFeed`): row-level writers pay the sidecar
    * cost only where a consumer wants typed changes. */
  def cdfEnabled(dir: String): Boolean =
    propertiesOf(dir).get("graft.cdf.enabled").contains("true")

  /** Per-version typed change plan for (fromVersion, toVersion]: a
    * version that committed CDC sidecars is represented by THOSE
    * (they carry exact per-row change types, including deletes and
    * update pre/post images the append-only feed cannot express); a
    * version without sidecars contributes its dataChange adds, which
    * are pure inserts by construction (appends and streaming epochs
    * never touch existing rows). Same O(span) commit-file walk as
    * [[changedEntriesBetween]]. */
  def typedChangedEntriesBetween(dir: String, fromVersion: Long,
      toVersion: Long): Seq[LogEntry] = {
    val leg = legacyEntries(dir).filter(e =>
      e.version > fromVersion && e.version <= toVersion)
    val tail = listVersioned(dir, CommitPrefix)
      .filter { case (v, _) => v > fromVersion && v <= toVersion }
      .flatMap { case (_, f) => readEntryLines(f) }
    (leg ++ tail).groupBy(_.version).toSeq.sortBy(_._1)
      .flatMap { case (_, es) =>
        val cdc = es.filter(_.action == "cdc")
        if (cdc.nonEmpty) cdc
        else es.filter(e => e.isAdd && e.dataChange)
      }
  }

  /** Typed change feed as a DataFrame: the table schema plus
    * [[ChangeTypeCol]] ∈ insert | update_preimage | update_postimage
    * | delete, for versions in (fromVersion, head]. Rows from
    * versions without CDC sidecars are pure inserts by construction
    * (appends, streaming epochs); their NULL change type coalesces
    * here. Covers the API row-level ops and SQL DELETE on tables with
    * `graft.cdf.enabled=true`; SQL UPDATE/MERGE ride Spark's
    * row-level-operation replace-data path, which does not emit
    * sidecars (documented limit — their rewrites surface as the
    * append-only feed always did). */
  def typedChanges(spark: org.apache.spark.sql.SparkSession,
      dir: String, fromVersion: Long,
      toVersion: Long = Long.MaxValue): org.apache.spark.sql.DataFrame = {
    val r = spark.read.format("graft.sources.GraftLogSource")
      .options(typedFeedOptions(dir, fromVersion))
    coalesceInserts((if (toVersion == Long.MaxValue) r
     else r.option("asOfVersion", toVersion.toString)).load())
  }

  /** Shared option set + null-coalesce for the typed feed's batch and
    * streaming faces — one contract, two delivery mechanisms. */
  private def typedFeedOptions(dir: String,
      fromVersion: Long): Map[String, String] =
    Map("path" -> dir, "changesFromVersion" -> fromVersion.toString,
      "readChangeFeed" -> "true")
  private def coalesceInserts(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    df.withColumn(ChangeTypeCol,
      coalesce(col(ChangeTypeCol), lit("insert")))
  }

  /** Typed change feed as a STREAM (Delta's streaming
    * `readChangeFeed`): micro-batches of the table schema plus
    * [[ChangeTypeCol]], one version span per batch, resuming from the
    * checkpointed version offset. Same typed-plan rule as the batch
    * feed; rows from sidecar-less versions coalesce to `insert` here.
    * Compose with `option("maxVersionsPerBatch", k)` upstream via
    * `moreOptions` for throttled backfill. */
  def typedChangesStream(spark: org.apache.spark.sql.SparkSession,
      dir: String, fromVersion: Long = -1L,
      moreOptions: Map[String, String] = Map.empty): org.apache.spark.sql.DataFrame =
    coalesceInserts(spark.readStream
      .format("graft.sources.GraftLogSource")
      .options(typedFeedOptions(dir, fromVersion))
      .options(moreOptions)
      .load())

  /** Committed versions in (fromVersion, toVersion], in order — the
    * axis a downstream applier walks. O(span) name listing. */
  def versionsBetween(dir: String, fromVersion: Long,
      toVersion: Long): Seq[Long] =
    (legacyEntries(dir).map(_.version) ++
      listVersioned(dir, CommitPrefix).map(_._1))
      .filter(v => v > fromVersion && v <= toVersion).distinct.sorted

  /** Write `changes` (full table schema + [[ChangeTypeCol]]) as CDC
    * sidecar files in `dir`, returning their manifest entries at
    * version -1 for the caller's [[commitNew]] — sidecars and the
    * row-level commit they describe become visible atomically. */
  private def stageCdc(spark: org.apache.spark.sql.SparkSession,
      dir: String, changes: org.apache.spark.sql.DataFrame): Seq[LogEntry] = {
    val scratch = s"$dir/__cdc-${UUID.randomUUID()}"
    changes.write.format("graft.sources.GraftLogSource")
      .option("path", scratch).mode("overwrite").save()
    val fresh = entriesAsOf(scratch, Long.MaxValue).filter(_.rows > 0L)
    val out = fresh.map { e =>
      val cdcName = CdcPrefix + e.file.stripPrefix("part-")
      Files.move(Paths.get(scratch, e.file), Paths.get(dir, cdcName))
      LogEntry(-1L, "cdc", cdcName, e.rows, dataChange = false,
        Map.empty, cols = e.cols)
    }
    Option(new File(scratch).listFiles()).getOrElse(Array.empty)
      .foreach(_.delete())
    new File(scratch).delete()
    out
  }

  /** Newest committed version — filename listing only for commit-file
    * tables; a legacy flat manifest is parsed only when no commit
    * file supersedes it. */
  def currentVersion(dir: String): Long = {
    val cv = listVersioned(dir, CommitPrefix).lastOption
      .map(_._1).getOrElse(-1L)
    val kv = listVersioned(dir, CheckpointPrefix).lastOption
      .map(_._1).getOrElse(-1L)
    val lv = if (cv < 0 && kv < 0)
      legacyEntries(dir).map(_.version).maxOption.getOrElse(-1L)
    else -1L
    math.max(math.max(cv, kv), lv)
  }

  def nextVersion(dir: String): Long = currentVersion(dir) + 1

  /** Max commit stamp across all known history — the clamp base that
    * keeps version→timestamp strictly monotone. O(tail): the latest
    * checkpoint's header covers everything at-or-below it. */
  private def maxTsKnown(dir: String): Long = {
    val ckpt = listVersioned(dir, CheckpointPrefix).lastOption
    val floor = ckpt.map(_._1).getOrElse(-1L)
    val base = ckpt.map { case (v, f) => readCheckpoint(v, f).maxTs }
    val tailTs = listVersioned(dir, CommitPrefix)
      .filter(_._1 > floor)
      .flatMap { case (_, f) => readEntryLines(f) }.map(_.ts)
    val legTs = if (ckpt.isEmpty) legacyEntries(dir).map(_.ts)
      else Seq.empty
    (base.toSeq ++ tailTs ++ legTs).maxOption.getOrElse(-1L)
  }

  /** Optimistic cross-process commit: serialize the next version's
    * entries to a temp file and CLAIM `_commit.<v>` with a hard link —
    * link(2) fails EEXIST atomically, so two processes racing the same
    * version cannot drop each other's commit; the loser re-reads the
    * log head and retries at the next version. Unstamped entries get
    * the commit wall-clock, clamped strictly above every known stamp
    * (`TIMESTAMP AS OF` resolves unambiguously even when two commits
    * land in one millisecond). Same-JVM writers also serialize on the
    * object lock — cheaper than churning the retry loop. Every
    * [[CheckpointInterval]]-th commit also writes a reconciled
    * checkpoint. Returns the committed version. */
  def commitNew(dir: String, schema: StructType,
      remergeSchema: Boolean = true)(
      mk: Long => Seq[LogEntry]): Long = synchronized {
    commitNewUnlocked(dir, schema, remergeSchema)(mk)
  }

  /** The lock-free body — `private[graft]` so the concurrency spec can
    * drive two racing committers through the file CAS alone. `mk`
    * may be invoked more than once (once per claimed version). */
  private[graft] def commitNewUnlocked(dir: String, schema: StructType,
      remergeSchema: Boolean = true)(
      mk: Long => Seq[LogEntry]): Long = {
    ensureDir(dir)
    var attempts = 0
    while (attempts < 64) {
      // the schema persists per ATTEMPT, re-merged against the stored
      // one each time: two cross-process schema-evolving commits would
      // otherwise race read-modify-write on `_schema` and the loser's
      // new column silently vanish from the table (mergeSchemas is
      // additive-at-tail, so remerging is idempotent). A truncate
      // replaces the schema wholesale instead (remergeSchema=false).
      val stored = storedSchema(dir)
      val persisted =
        if (remergeSchema)
          stored.map(mergeSchemas(_, schema)).getOrElse(schema)
        else schema
      // write ONLY when the content changes: a same-schema (pure)
      // append re-writing identical bytes would race a concurrent
      // schema-evolving commit's read-modify-write and clobber its
      // freshly added column with the stale schema it read
      if (!stored.contains(persisted))
        atomicWrite(Paths.get(dir, SchemaFile),
          persisted.json.getBytes(StandardCharsets.UTF_8))
      val v = currentVersion(dir) + 1
      // an empty entry list is legal exactly once: the version-0
      // commit of a truncate-to-empty (overwrite with zero rows)
      val es = mk(v)
      val now = math.max(System.currentTimeMillis(), maxTsKnown(dir) + 1)
      val stamped = es.map(e => if (e.ts < 0) e.copy(ts = now) else e)
      val tmp = Paths.get(dir,
        s"$CommitPrefix$v.tmp.${UUID.randomUUID()}")
      Files.write(tmp, stamped.map(_.serialize).mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
      crashWindow(dir, "preLink") // crash-torture hook (no-op unarmed)
      try {
        Files.createLink(
          Paths.get(dir, versionedName(CommitPrefix, v)), tmp)
        crashWindow(dir, "postLink")
        Files.delete(tmp)
        maybeCheckpoint(dir, v)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // another writer claimed v first — its commit stands; retry
          Files.delete(tmp)
          attempts += 1
      }
    }
    throw new IllegalStateException(
      s"graft-log commit to $dir lost the version race $attempts times")
  }

  /** Crash-torture instrumentation (tools.CrashPublisher): when
    * `-Dgraft.log.crashWindow=<name>` arms a window, the committing
    * process announces reaching it (a marker file the orchestrator
    * polls for) and then parks, so `destroyForcibly()` kills the JVM at
    * a DETERMINISTIC point in the commit protocol — just before the
    * hard-link CAS (torn state: parts + tmp, no commit) or just after
    * it (commit visible, tmp orphaned, checkpoint skipped). Unarmed
    * (every production and test run that doesn't set the property)
    * this is a single map lookup. */
  private def crashWindow(dir: String, name: String): Unit =
    sys.props.get("graft.log.crashWindow").filter(_ == name).foreach { _ =>
      try Files.writeString(Paths.get(dir, s"_crash_window_$name"), "")
      catch { case _: java.io.IOException => () }
      Thread.sleep(120000) // parked: the orchestrator kills us here
    }

  /** Last checkpoint version this JVM knows of, per table dir — saves
    * a directory listing on EVERY commit (measurable on commit-dense
    * workloads). Conservative under cross-process races: a stale (low)
    * cached value only means we list again when our own counter says a
    * checkpoint is due, and writeCheckpoint is idempotent. */
  private[graft] val lastCkptCache =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  private def maybeCheckpoint(dir: String, v: Long): Unit = {
    val cached = lastCkptCache.getOrDefault(dir, Long.MinValue)
    // trust the cache only while versions grow PAST it: a commit at
    // v <= cached means another process reset the lineage (overwrite
    // restarts at 0) — a stale-HIGH value would then suppress every
    // checkpoint of the new lineage, so fall through and re-list
    if (cached != Long.MinValue && v > cached &&
        v - cached < CheckpointInterval)
      return
    val last = listVersioned(dir, CheckpointPrefix).lastOption
      .map(_._1).getOrElse(-1L)
    if (v - last >= CheckpointInterval) {
      writeCheckpoint(dir, v)
      lastCkptCache.put(dir, v)
    } else lastCkptCache.put(dir, last)
  }

  /** Reconciled snapshot checkpoint at `v`: the live add set (original
    * versions and stamps preserved) plus the latest [[LogEntry.txn]]
    * marker per writer — markers must survive reconciliation or log
    * expiration would silently reset every incremental consumer's
    * applied-through watermark — under a max-stamp header.
    * Idempotent — deterministic content, atomic replace — so two
    * processes checkpointing the same version is harmless. */
  def writeCheckpoint(dir: String, v: Long): Unit = {
    val snap = snapshotAsOf(dir, v)
    val live = snap.entries ++ snap.txns
    val content = (s"#checkpoint v=$v maxTs=${maxTsKnown(dir)}" +:
      live.map(_.serialize)).mkString("\n")
    atomicWrite(Paths.get(dir, versionedName(CheckpointPrefix, v)),
      content.getBytes(StandardCharsets.UTF_8))
  }

  /** Expire log segments (Delta's log retention / Iceberg's
    * expire-snapshots for the metadata side): delete every commit
    * file at-or-below the newest checkpoint at-or-below
    * `beforeVersion` — that checkpoint subsumes them for planning any
    * version from its own upward — plus all older checkpoints and the
    * legacy flat manifest. This BOUNDS total log size forever:
    * retained metadata is one checkpoint (O(live files)) plus the
    * commit tail. The trade is documented and loud: time travel below
    * the pivot checkpoint now throws (see [[snapshotAsOf]]'s horizon
    * guard) instead of silently replaying an empty history. Part
    * files are untouched — vacuum owns data retention, and its
    * referenced set reads checkpoints too, so pre-horizon LIVE files
    * survive. Returns the number of metadata files deleted. */
  def expireLog(dir: String, beforeVersion: Long): Int = synchronized {
    val ckpts = listVersioned(dir, CheckpointPrefix)
    ckpts.filter(_._1 <= beforeVersion).lastOption match {
      case None => 0
      case Some((pivot, _)) =>
        val commits = listVersioned(dir, CommitPrefix)
          .filter(_._1 <= pivot)
        val older = ckpts.filter(_._1 < pivot)
        val legacy =
          Option(new File(dir, ManifestFile)).filter(_.exists()).toSeq
        (commits.map(_._2) ++ older.map(_._2) ++ legacy)
          .foreach(_.delete())
        commits.size + older.size + legacy.size
    }
  }

  /** Oldest version the retained log can still reconstruct: 0 while
    * the full history (legacy manifest or `_commit.0`) survives, else
    * the oldest remaining checkpoint. -1 = empty table (no horizon
    * to violate). */
  def oldestReplayableVersion(dir: String): Long = {
    val hasFull = new File(dir, ManifestFile).exists() ||
      listVersioned(dir, CommitPrefix).headOption.exists(_._1 == 0L)
    if (hasFull) 0L
    else {
      val floors = listVersioned(dir, CheckpointPrefix).map(_._1) ++
        listVersioned(dir, CommitPrefix).map(_._1)
      floors.minOption.getOrElse(-1L)
    }
  }

  // ---- named refs (tags): human-named pins into the version log ----
  // `VERSION AS OF 'gold'` instead of a raw number — the Iceberg
  // tag/ref idea. Stored as one `_refs` file (name=version lines),
  // atomically replaced under the object lock; a ref must point at a
  // committed version at creation time, and expiring the log past a
  // ref's version makes reads through it fail loudly like any other
  // sub-horizon time travel.
  val RefsFile = "_refs"

  def refs(dir: String): Map[String, Long] = {
    val f = new File(dir, RefsFile)
    if (!f.exists()) Map.empty
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .linesIterator.filter(_.contains("=")).map { l =>
        val i = l.lastIndexOf('=')
        l.substring(0, i) -> l.substring(i + 1).toLong
      }.toMap
  }

  def setRef(dir: String, name: String, version: Long): Unit =
    synchronized {
      require(name.nonEmpty && !name.forall(_.isDigit) &&
        !name.contains("=") && !name.contains("\n"),
        s"invalid ref name '$name' (non-numeric, no '=' or newline)")
      val cur = currentVersion(dir)
      require(version >= 0 && version <= cur,
        s"ref '$name' must point at a committed version 0..$cur, " +
          s"got $version")
      writeRefs(dir, refs(dir) + (name -> version))
    }

  def dropRef(dir: String, name: String): Unit = synchronized {
    writeRefs(dir, refs(dir) - name)
  }

  private def writeRefs(dir: String, rs: Map[String, Long]): Unit =
    atomicWrite(Paths.get(dir, RefsFile),
      rs.toSeq.sortBy(_._1).map { case (n, v) => s"$n=$v" }
        .mkString("\n").getBytes(StandardCharsets.UTF_8))

  /** Resolve a `VERSION AS OF` argument: a number is a version, any
    * other string is a ref name (fails loudly when absent). */
  def resolveVersion(dir: String, spec: String): Long =
    if (spec.nonEmpty && spec.forall(_.isDigit)) spec.toLong
    else refs(dir).getOrElse(spec, throw new IllegalArgumentException(
      s"no ref '$spec' on the table at $dir " +
        s"(known: ${refs(dir).keys.toSeq.sorted.mkString(", ")})"))

  // ---- table properties ------------------------------------------
  // TBLPROPERTIES, stored as one `_properties` file (k=v lines,
  // atomic replace). Properties are metadata-plane configuration —
  // the table-level override axis Delta/Iceberg use for maintenance
  // policy; `graft.compact.target-bytes` is consulted by [[compact]]
  // ahead of the session conf, so a table's layout policy travels
  // with the table, not the session that happens to run maintenance.
  val PropsFile = "_properties"

  /** Lineage identity: a fresh UUID stamped by every overwrite — the
    * only operation that restarts the version axis. A version number
    * is only meaningful WITHIN one lineage, so any consumer that
    * persists an applied-through version (materialized view,
    * replication, external checkpoint) must persist this tag beside
    * it and re-bootstrap on mismatch: carried across an overwrite,
    * the marker would otherwise pass every horizon/span guard once
    * the NEW lineage's head grows past it, and the consumer would
    * silently merge new-lineage deltas into old-lineage state.
    * Absent (never-overwritten tables, legacy) reads as "". */
  val LineageProp = "graft.lineage"

  def lineageOf(dir: String): String =
    propertiesOf(dir).getOrElse(LineageProp, "")

  /** Consistent (currentVersion, lineage) pair — ONE planning-time
    * read instead of several per micro-batch, and atomic against an
    * overwrite racing between the two file reads: the lineage is
    * re-read after the version and the pair retried on mismatch, so a
    * new-lineage version can never be stamped with the old lineage
    * tag (which would let a checkpointed offset silently cross the
    * overwrite). */
  def versionAndLineage(dir: String): (Long, String) = {
    var attempts = 0
    while (attempts < 5) {
      val before = lineageOf(dir)
      val v = currentVersion(dir)
      val after = lineageOf(dir)
      if (before == after) return (v, after)
      attempts += 1
    }
    // Five straight sandwiches torn by concurrent overwrites: return
    // NOTHING rather than a (version, lineage) pair that may cross an
    // overwrite — the exact mis-stamping this function exists to
    // prevent. Retryable: the planner/caller re-invokes on its next
    // cycle, and overwrite storms are transient by nature.
    throw new IllegalStateException(
      s"could not read a consistent (version, lineage) pair for $dir " +
        "after 5 attempts — concurrent overwrites in progress; retry")
  }

  /** THE lineage guard every consumer that persists an applied-through
    * version of a source table must pass (see [[LineageProp]]): the
    * marker is meaningful only when the lineage tag persisted beside
    * it matches the source's CURRENT lineage. Mismatch (the source
    * was overwritten since the marker) returns None — the caller
    * re-bootstraps (materialized view, replication) or fails loudly
    * (streaming offsets, which cannot re-seed a checkpoint). Marker
    * ABSENCE stays caller-domain: -1 means "no marker yet" for the
    * txn-marker consumers but is a real "from the beginning" offset
    * for the stream. One definition, three consumers — a fourth
    * consumer adopts the guard by construction, not by convention. */
  def guardedMarker(marker: Long, markerLineage: String,
      srcLineage: String): Option[Long] =
    if (markerLineage == srcLineage) Some(marker) else None

  def propertiesOf(dir: String): Map[String, String] = {
    val f = new File(dir, PropsFile)
    if (!f.exists()) Map.empty
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .linesIterator.filter(_.contains("=")).map { l =>
        val i = l.indexOf('=')
        l.substring(0, i) -> l.substring(i + 1)
      }.toMap
  }

  def setProperties(dir: String, kvs: Map[String, String]): Unit =
    synchronized {
      kvs.keys.foreach(k => require(
        k.nonEmpty && !k.contains("=") && !k.contains("\n"),
        s"invalid property key '$k'"))
      kvs.values.foreach(v => require(!v.contains("\n"),
        s"property values cannot contain newlines: '$v'"))
      writeProperties(dir, propertiesOf(dir) ++ kvs)
    }

  def removeProperties(dir: String, keys: Seq[String]): Unit =
    synchronized { writeProperties(dir, propertiesOf(dir) -- keys) }

  private def writeProperties(dir: String,
      ps: Map[String, String]): Unit =
    atomicWrite(Paths.get(dir, PropsFile),
      ps.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
        .mkString("\n").getBytes(StandardCharsets.UTF_8))

  // ---- write-audit-publish (WAP) staging -------------------------
  // Iceberg's stage-then-publish pattern: with `spark.graft.log.wapId`
  // set, an INSERT writes its part files but records their entries in
  // a `_staged.<id>` side file instead of committing — invisible to
  // every ordinary reader. A session with the SAME wap id set reads
  // the current snapshot PLUS the staged overlay (the audit), and
  // `CALL system.publish_staged` turns the staged entries into one
  // ordinary commit, atomically and exactly once. The pipeline shape
  // this exists for: ingest a batch, run quality/dedup/contamination
  // checks against the audit view, and only then make it visible to
  // training jobs — a bad batch is dropped without ever having been
  // live, and no reader ever sees a half-audited table.
  val WapConf = "spark.graft.log.wapId"
  val StagedPrefix = "_staged."

  /** The session's active WAP id, when one is set and non-empty. */
  def activeWapId(): Option[String] =
    scala.util.Try(org.apache.spark.sql.SparkSession.active).toOption
      .flatMap(s => Option(s.conf.get(WapConf, null)))
      .filter(_.nonEmpty)

  private def stagedFile(dir: String, id: String): File = {
    require(id.nonEmpty && id.forall(c => c.isLetterOrDigit ||
        c == '-' || c == '_'),
      s"invalid wap id '$id' (letters, digits, '-', '_' only)")
    new File(dir, StagedPrefix + id)
  }

  def listStagedIds(dir: String): Seq[String] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith(StagedPrefix))
      .map(_.stripPrefix(StagedPrefix)).sorted.toSeq

  def stagedEntries(dir: String, id: String): Seq[LogEntry] = {
    val f = stagedFile(dir, id)
    if (!f.exists()) Seq.empty else readEntryLines(f)
  }

  /** Stage an append under `id`: entries accumulate in the staged
    * side file (several writes may stage under one audit id) with a
    * placeholder version; part files are already in the table dir but
    * unreferenced by any commit. Staged writes may not evolve the
    * schema — the evolution would be visible to non-audit readers
    * before publish, breaking the whole point. */
  def stageAppend(dir: String, id: String, fresh: Seq[GraftLogCommit],
      schema: StructType): Unit = synchronized {
    if (fresh.isEmpty) return
    storedSchema(dir) match {
      case Some(stored) =>
        require(mergeSchemas(stored, schema) == stored,
          s"staged write under wap id '$id' would evolve the schema " +
            s"of $dir — publish-time evolution is not supported; " +
            "evolve with an ordinary write first")
      case None =>
        // the staging CREATES the table: persist the schema now (the
        // rows stay invisible until publish) — publishing against no
        // stored schema would otherwise commit an empty one and
        // strand the rows behind a zero-column read
        ensureDir(dir)
        atomicWrite(Paths.get(dir, SchemaFile),
          schema.json.getBytes(StandardCharsets.UTF_8))
    }
    val entries = stagedEntries(dir, id) ++
      fresh.map(c => LogEntry.add(-1L, c.file, c.rows, c.stats,
        cols = c.cols))
    atomicWrite(stagedFile(dir, id).toPath,
      entries.map(_.serialize).mkString("", "\n", "\n")
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Publish a staged audit as ONE ordinary commit (re-versioned
    * entries), then retire the staged file — exactly once: a second
    * publish of the same id fails loudly on the missing file. Returns
    * (publishedVersion, nFiles). */
  def publishStaged(dir: String, id: String): (Long, Int) = synchronized {
    val es = stagedEntries(dir, id)
    require(es.nonEmpty,
      s"no staged write under wap id '$id' at $dir " +
        s"(staged: ${listStagedIds(dir).mkString(", ")})")
    // Crash recovery: a publish that committed but died before
    // retiring the side file must NOT double-commit on retry. The
    // publish commit carries a txn marker under the wap id, so the
    // check is EXACT — the earlier are-all-files-live heuristic
    // double-published when a compaction or delete retired the staged
    // files inside the crash window. Wap ids are single-use as a
    // consequence (the Iceberg wap.id contract).
    if (lastTxnVersion(dir, s"wap:$id") >= 0L) {
      stagedFile(dir, id).delete()
      throw new IllegalStateException(
        s"wap id '$id' at $dir was already published (a crashed " +
          "publish left its staging behind — now retired); " +
          "re-publishing would duplicate the rows")
    }
    es.foreach(e => require(new File(dir, e.file).exists(),
      s"cannot publish '$id': staged part ${e.file} is missing"))
    var published = -1L
    commitNew(dir, storedSchema(dir).getOrElse(StructType(Nil))) { v =>
      published = v
      // ts stays -1: commitNew stamps its monotonic commit time — the
      // PUBLISH instant is the version's timestamp (audit time is not)
      es.map(e => e.copy(version = v, ts = -1L)) :+
        LogEntry.txn(v, s"wap:$id", 1L)
    }
    stagedFile(dir, id).delete()
    (published, es.size)
  }

  /** Abandon a staged audit: delete its part files and the side file.
    * Returns the number of part files deleted. */
  def dropStaged(dir: String, id: String): Int = synchronized {
    val es = stagedEntries(dir, id)
    // a staging left behind by a crashed-but-committed publish points
    // at files the LIVE snapshot references — deleting those would
    // destroy committed data (dropBranch guards the same way)
    val live = entriesAsOf(dir, Long.MaxValue).map(_.file).toSet
    val dead = es.filterNot(e => live(e.file))
    dead.foreach(e => new File(dir, e.file).delete())
    stagedFile(dir, id).delete()
    dead.size
  }

  /** Loud guard for operations that cannot be staged: running them
    * with a WAP id set would either commit visibly mid-audit or
    * silently bypass the staging the session asked for. */
  def requireNoWap(op: String): Unit = activeWapId().foreach(id =>
    throw new IllegalStateException(
      s"$op cannot run while $WapConf='$id' is set — only appends " +
        "stage; publish or drop the audit (or unset the conf) first"))

  // ---- writable branches: named commit lineages off a fork point ----
  // The Iceberg-branch idea on the graft-log: `create_branch` forks at
  // the current version; writes made with `spark.graft.log.branch` set
  // (or the `branch` write/read option) commit to the branch's OWN
  // commit files (`_branch.<name>.<v>`, same hard-link CAS as main) —
  // invisible to every mainline reader, MULTI-commit (where a WAP
  // staging is one audited batch, a branch is a whole line of work:
  // several appends validated together). A branch read plans the main
  // snapshot AT THE FORK plus the branch's commits — main commits
  // after the fork don't leak in. `fast_forward` publishes the branch
  // onto main as one squashed commit IFF main hasn't moved since the
  // fork (otherwise loud — recreate the branch to rebase); `drop_
  // branch` abandons it and reclaims its part files. Part files live
  // in the table dir (vacuum treats branch-referenced files as live,
  // like WAP staging). Branch writes may not evolve the schema, and
  // row-level mutations/maintenance refuse to run with a branch set —
  // same loudness contract as WAP.
  val BranchConf = "spark.graft.log.branch"
  val BranchesFile = "_branches"

  /** The session's active write/read branch, when set and non-empty. */
  def activeBranch(): Option[String] =
    scala.util.Try(org.apache.spark.sql.SparkSession.active).toOption
      .flatMap(s => Option(s.conf.get(BranchConf, null)))
      .filter(_.nonEmpty)

  private def validBranchName(name: String): Unit =
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit ||
        c == '-' || c == '_'),
      s"invalid branch name '$name' (letters, digits, '-', '_' only)")

  private def branchPrefix(name: String): String = s"_branch.$name."

  /** name → fork version for every live branch. */
  def branches(dir: String): Map[String, Long] = {
    val f = new File(dir, BranchesFile)
    if (!f.exists()) Map.empty
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).map { l =>
        val Array(n, v) = l.split("\t", 2); n -> v.toLong
      }.toMap
  }

  private def writeBranches(dir: String, bs: Map[String, Long]): Unit =
    atomicWrite(Paths.get(dir, BranchesFile),
      bs.toSeq.sortBy(_._1).map { case (n, v) => s"$n\t$v" }
        .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))

  /** Fork a branch at the current version. Returns the fork version. */
  def createBranch(dir: String, name: String): Long = synchronized {
    validBranchName(name)
    require(storedSchema(dir).isDefined,
      s"graft-log table not found at $dir")
    val bs = branches(dir)
    require(!bs.contains(name), s"branch '$name' already exists at $dir")
    val fork = currentVersion(dir)
    writeBranches(dir, bs + (name -> fork))
    fork
  }

  private def forkOf(dir: String, name: String): Long =
    branches(dir).getOrElse(name, throw new IllegalArgumentException(
      s"no branch '$name' at $dir " +
        s"(branches: ${branches(dir).keys.toSeq.sorted.mkString(", ")})"))

  /** Newest branch-local version (the fork version when unwritten). */
  def branchHead(dir: String, name: String): Long = {
    val fork = forkOf(dir, name)
    listVersioned(dir, branchPrefix(name)).lastOption.map(_._1)
      .getOrElse(fork)
  }

  /** Every branch commit's entries, version-ascending. */
  def branchEntries(dir: String, name: String): Seq[LogEntry] =
    listVersioned(dir, branchPrefix(name))
      .flatMap { case (_, f) => readEntryLines(f) }

  /** The branch's visible snapshot: main AT THE FORK + branch commits
    * replayed on top (main commits after the fork never leak in). */
  def branchSnapshot(dir: String, name: String): Seq[LogEntry] = {
    val fork = forkOf(dir, name)
    val latest =
      scala.collection.mutable.LinkedHashMap.empty[String, LogEntry]
    snapshotAsOf(dir, fork).entries.foreach(e => latest(e.file) = e)
    branchEntries(dir, name).foreach(e => applyEntry(latest, e))
    latest.valuesIterator.filter(_.isAdd).toSeq
  }

  /** Append a batch to the branch as its own commit — the same
    * hard-link CAS as mainline commits, version-numbered in the
    * branch's own lineage (fork+1, fork+2, ...). Schema evolution is
    * rejected (it would be visible to mainline readers before
    * fast-forward, same rule as WAP staging). */
  def appendToBranch(dir: String, name: String,
      fresh: Seq[GraftLogCommit], schema: StructType): Unit =
    synchronized {
      if (fresh.isEmpty) return
      forkOf(dir, name)
      storedSchema(dir).foreach { stored =>
        require(mergeSchemas(stored, schema) == stored,
          s"branch '$name' write would evolve the schema of $dir — " +
            "evolve with a mainline write first, then re-branch")
      }
      var attempts = 0
      while (attempts < 64) {
        val v = branchHead(dir, name) + 1
        val now = math.max(System.currentTimeMillis(), maxTsKnown(dir) + 1)
        val es = fresh.map(c => LogEntry.add(v, c.file, c.rows, c.stats,
          cols = c.cols).copy(ts = now))
        val tmp = Paths.get(dir,
          s"${branchPrefix(name)}$v.tmp.${UUID.randomUUID()}")
        Files.write(tmp, es.map(_.serialize).mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
        crashWindow(dir, "preLink") // same torture hook as mainline
        try {
          Files.createLink(
            Paths.get(dir, versionedName(branchPrefix(name), v)), tmp)
          crashWindow(dir, "postLink")
          Files.delete(tmp)
          return
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            Files.delete(tmp); attempts += 1
        }
      }
      throw new IllegalStateException(
        s"branch '$name' commit to $dir lost the version race")
    }

  /** Publish the branch onto main as ONE squashed commit, exactly
    * once, IFF main has not moved since the fork (a moved main is a
    * real conflict: the branch's file set was derived from the fork
    * snapshot — loud, recreate the branch to rebase). The branch is
    * retired on success; its part files are now mainline-live. A
    * crashed fast-forward (committed, died before retiring the
    * branch) cannot double-publish: every branch file already live
    * means the commit landed — the stale branch is retired and the
    * retry says so. Returns (publishedVersion, nFiles). */
  def fastForward(dir: String, name: String): (Long, Int) =
    synchronized {
      val fork = forkOf(dir, name)
      val es = branchEntries(dir, name)
      require(es.nonEmpty,
        s"branch '$name' at $dir has no commits to fast-forward")
      // exact crash-recovery check: the publish commit carries a txn
      // marker under the branch name (the are-all-files-live
      // heuristic double-published when a compaction retired the
      // branch files inside the crash window)
      if (lastTxnVersion(dir, s"branch:$name@$fork") >= 0L) {
        retireBranch(dir, name)
        throw new IllegalStateException(
          s"branch '$name' at $dir was already fast-forwarded (a " +
            "crashed publish left the branch behind — now retired); " +
            "re-publishing would duplicate the rows")
      }
      val cur = currentVersion(dir)
      require(cur == fork,
        s"branch '$name' cannot fast-forward: main advanced from " +
          s"$fork to $cur since the fork — recreate the branch from " +
          "the new head to rebase")
      es.filter(_.isAdd).foreach(e =>
        require(new File(dir, e.file).exists(),
          s"cannot fast-forward '$name': part ${e.file} is missing"))
      var published = -1L
      commitNew(dir, storedSchema(dir).getOrElse(StructType(Nil))) { v =>
        published = v
        // the claimed version re-checks the fork INSIDE the CAS: a
        // cross-process mainline commit racing this publish would
        // otherwise slip under the check-then-commit window above
        require(v == fork + 1,
          s"branch '$name' cannot fast-forward: main advanced to " +
            s"${v - 1} during the publish — recreate the branch to " +
            "rebase")
        es.map(e => e.copy(version = v, ts = -1L)) :+
          // fork-qualified so a RECREATED branch under the same name
          // (at a new fork) publishes cleanly
          LogEntry.txn(v, s"branch:$name@$fork", 1L)
      }
      retireBranch(dir, name)
      (published, es.size)
    }

  /** Abandon a branch: delete its part files (those not mainline-live)
    * and its commit files, unregister it. Returns part files deleted. */
  def dropBranch(dir: String, name: String): Int = synchronized {
    forkOf(dir, name)
    val live = entriesAsOf(dir, Long.MaxValue).map(_.file).toSet
    val gone = branchEntries(dir, name).filter(_.isAdd)
      .filterNot(e => live(e.file))
    gone.foreach(e => new File(dir, e.file).delete())
    retireBranch(dir, name)
    gone.size
  }

  private def retireBranch(dir: String, name: String): Unit = {
    listVersioned(dir, branchPrefix(name)).foreach(_._2.delete())
    writeBranches(dir, branches(dir) - name)
  }

  /** Loud guard for operations that cannot target a branch: running
    * them with a branch set would silently mutate MAIN mid-branch. */
  def requireNoBranch(op: String): Unit = activeBranch().foreach(b =>
    throw new IllegalStateException(
      s"$op cannot run while $BranchConf='$b' is set — only appends " +
        "can target a branch; fast_forward or drop the branch (or " +
        "unset the conf) first"))

  /** CREATE TABLE: persist the schema — the table-existence marker.
    * An empty table needs no commit (version -1, empty snapshot). */
  def create(dir: String, schema: StructType): Unit = {
    ensureDir(dir)
    atomicWrite(Paths.get(dir, SchemaFile),
      schema.json.getBytes(StandardCharsets.UTF_8))
  }

  /** Overwrite semantics: a truncate resets the table to a NEW lineage
    * (version 0) — all commit files, checkpoints, and any legacy
    * manifest are retired. */
  /** Wipe the version lineage for an overwrite. Deletion order is
    * NEWEST-first (checkpoints, then commits descending, the legacy
    * manifest last) so any crash mid-reset leaves a CONSISTENT older
    * snapshot — an unordered delete could drop `_commit.0` first and
    * leave a tail whose removes dangle and whose horizon guard passes,
    * a silently corrupt replay. The overwrite itself stays non-atomic
    * across the reset→commit pair (a crash between them leaves an
    * empty table — the new rows were never committed); full atomicity
    * would need history-preserving overwrites. */
  private def resetLineage(dir: String): Unit = {
    ensureDir(dir)
    // the new lineage restarts at version 0 — a carried-over cached
    // checkpoint version would suppress the fresh lineage's first
    // checkpoints
    lastCkptCache.remove(dir)
    val files = Option(new File(dir).listFiles())
      .getOrElse(Array.empty)
    def versionOf(f: File, prefix: String): Long =
      f.getName.stripPrefix(prefix).takeWhile(_.isDigit) match {
        case "" => -1L; case d => d.toLong
      }
    files.filter(_.getName.startsWith(CheckpointPrefix))
      .sortBy(f => -versionOf(f, CheckpointPrefix)).foreach(_.delete())
    files.filter(_.getName.startsWith(CommitPrefix))
      .sortBy(f => -versionOf(f, CommitPrefix)).foreach(_.delete())
    files.filter(_.getName == ManifestFile).foreach(_.delete())
    // Version-anchored side state dies WITH the lineage it indexed
    // (ADVICE r9): a ref pinned at `gold=5` in the retired lineage
    // must not silently resolve against the new lineage once it
    // reaches version 5 (wrong snapshot, no error), a branch tip or
    // pending WAP stage must not republish retired-lineage rows, and
    // per-version CDC sidecars describe commits that no longer exist.
    // Deleting them makes every dead handle fail loudly ("no such
    // ref/branch/staged id") instead of resolving to the wrong data.
    files.filter(f => f.getName == RefsFile ||
        f.getName == BranchesFile ||
        f.getName.startsWith("_branch.") ||
        f.getName.startsWith(StagedPrefix) ||
        f.getName.startsWith(CdcPrefix))
      .foreach(_.delete())
  }

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
    val ckptLive =
      if (expireHistory) Seq.empty
      else listVersioned(dir, CheckpointPrefix)
        .flatMap { case (v, f) => readCheckpoint(v, f).live }
    // staged (write-audit-publish) part files are referenced by their
    // `_staged.<id>` side file, not by any commit — a pending audit
    // must survive vacuum under BOTH modes or publish would break.
    // Branch part files likewise: only the branch's own commit files
    // reference them until fast-forward.
    val staged = listStagedIds(dir).flatMap(stagedEntries(dir, _))
    val branched = branches(dir).keys.toSeq
      .flatMap(branchEntries(dir, _)).filter(_.isAdd)
    val referenced =
      ((if (expireHistory) entriesAsOf(dir, Long.MaxValue)
        else entries(dir).filter(_.isAdd) ++ ckptLive) ++ staged ++
        branched)
        .map(_.file).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    // DV sidecars follow the part-file rules: referenced = every DV
    // named anywhere in the kept history (current snapshot only under
    // expireHistory), aged orphans and superseded DVs reclaimed.
    val refDv =
      (if (expireHistory) entriesAsOf(dir, Long.MaxValue)
       else entries(dir) ++ ckptLive).flatMap(e =>
        e.stats.get(DvKey).map(_._1).filter(_.nonEmpty)).toSet
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("dv-") &&
        !refDv.contains(f.getName) && f.lastModified() <= cutoff)
      .foreach(_.delete())
    // CDC sidecars: referenced while any retained commit names them
    // (the typed feed reads commit files directly, so the reference
    // set is the full kept ledger) — under BOTH modes (ADVICE r9):
    // vacuum never deletes commit files, so every span the horizon
    // guard admits still opens its commits' sidecars; emptying the
    // set under expireHistory left admitted typed-feed/replication
    // reads dying on a missing file. Sidecars of commits expireLog
    // already deleted are absent from entries() and get reclaimed.
    val refCdc =
      entries(dir).filter(_.action == "cdc").map(_.file).toSet
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(CdcPrefix) &&
        !refCdc.contains(f.getName) && f.lastModified() <= cutoff)
      .foreach(_.delete())
    // Stale metadata temps from crashed writers: a CAS loser deletes
    // its temp commit file, but a crash between write and link leaves
    // one (same for an interrupted atomicWrite). Invisible to readers
    // (the `.tmp.` infix is filtered at listing), reclaimed here past
    // the same retention horizon that protects in-flight writers.
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.contains(".tmp.") &&
        f.lastModified() <= cutoff)
      .foreach(_.delete())
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
    // optimistic-concurrency base: same-JVM maintenance serializes on
    // the object lock, but a CROSS-PROCESS delete/merge racing this
    // compaction must be detected at publish, not silently undone
    val compactBase = currentVersion(dir)
    val live = entriesAsOf(dir, Long.MaxValue)
    if (live.size <= 1) return 0
    val schema = DataType.fromJson(new String(
      Files.readAllBytes(Paths.get(dir, SchemaFile)),
      StandardCharsets.UTF_8)).asInstanceOf[StructType]
    val curCols = schema.fieldNames.toSeq
    // Partition-aware: a partitioned table compacts PER VALUE (one
    // output file per partition-value group, its partition record and
    // grouped stats intact), so nightly compaction never forfeits
    // storage-partitioned joins — the Iceberg per-partition compaction
    // shape. An unpartitioned table (or one with pre-partitioning
    // files whose grouping is unknowable) compacts to one file.
    val groups: Seq[(Option[(String, Any)], Seq[LogEntry])] =
      partitionColOf(dir) match {
        case Some(c) if live.forall(e =>
            GraftLogPartValue.of(e, c).isDefined) =>
          live.groupBy(e => GraftLogPartValue.of(e, c).get).toSeq
            .map { case (v, es) => (Some(c -> v), es) }
        case _ => Seq((None, live))
      }
    // nothing to do when every group is already a single file
    if (groups.forall(_._2.size <= 1)) return 0

    // Output files ROLL at a target uncompressed size: gzip'd TSV is
    // not splittable, so a compacted file IS the read-parallelism
    // granule — one unbounded 100 GB output per partition would
    // serialize every future scan of that partition onto one task
    // (parquet formats split by row group; a non-splittable format
    // must bound at write time). Conf'able for tests; the default
    // keeps small fixtures at one file per group.
    // table property beats session conf beats default: layout policy
    // belongs to the table, not to whichever session runs maintenance
    val targetBytes = propertiesOf(dir).get("graft.compact.target-bytes")
      .map(_.toLong)
      .orElse(scala.util.Try(
          org.apache.spark.sql.SparkSession.active).toOption
        .flatMap(s => Option(
          s.conf.get("spark.graft.log.compactTargetBytes", null)))
        .map(_.toLong))
      .getOrElse(128L << 20)

    // Every output any group closes is registered here BEFORE the
    // group returns: on a parallel failure the sweep deletes from
    // this ledger, not from the futures — a future cancelled just as
    // its task completed reads isCancelled and its get() throws, so
    // future-based reaping would strand exactly those outputs.
    val produced = new java.util.concurrent.ConcurrentLinkedQueue[String]()

    def writeGroup(entries: Seq[LogEntry],
        pv: Option[(String, Any)]): Seq[LogEntry] = {
      val pvStat = pv.fold(Map.empty[String, (String, String)]) {
        case (c, v) => Map(GraftLogPartValue.key(c) ->
          GraftLogPartValue.encode(v))
      }
      // Every output file's stats are computed EXACTLY from the cells
      // streaming through it — the same [[GraftLogCellStats]] tracker
      // the append writer runs — never folded from the inputs'
      // manifest entries. Folding was unsound whenever an input
      // carried a deletion vector (the deleted rows may have held the
      // extremum / distinct values / nulls), so it had to drop ALL
      // stats in exactly the post-DELETE case maintenance exists for:
      // the big compacted files a maintained 100 TB table is mostly
      // made of lost range skipping, metadata-only MIN/MAX/COUNT, and
      // CBO cardinalities. Recomputing is exact for every input
      // vintage (DV'd, evolved, renamed — the cells are already
      // remapped to the current layout below), gives each ROLLED
      // output its own file-tight range instead of the group-wide
      // fold, and keeps the exact additive null count on every output.
      val done = scala.collection.mutable.ArrayBuffer.empty[LogEntry]
      val curTypes = schema.fields.map(_.dataType).toSeq
      var outName: String = null
      var out: GraftColFile.Writer = null
      var tracker: GraftLogCellStats = null
      def open(): Unit = {
        outName = s"part-${UUID.randomUUID()}${GraftColFile.Extension}"
        out = new GraftColFile.Writer(Paths.get(dir, outName),
          curCols, curTypes)
        tracker = new GraftLogCellStats(schema)
      }
      def closeCurrent(): Unit = if (out != null) {
        val raw = out.rawChars
        val rows = out.finish()
        produced.add(outName)
        done += LogEntry.add(-1L, outName, rows,
          tracker.finish() ++ pvStat +
            (GraftLog.RawBytesKey -> (raw.toString, "n")),
          dataChange = false, cols = curCols)
        out = null
        tracker = null
      }
      def writeLine(l: String): Unit = {
        if (out == null) open()
        // current-layout lines carry exactly curCols cells; a short
        // split (trailing empties) pads with the null sentinel
        val cells = l.split("\t", -1)
        val full =
          if (cells.length == curCols.length) cells
          else Array.tabulate(curCols.length)(i =>
            if (i < cells.length) cells(i) else NullCell)
        tracker.add(full)
        out.write(full)
        if (out.rawChars >= targetBytes) closeCurrent()
      }
      // Rewrite every live row into the CURRENT column layout: a file
      // written before an evolution has fewer cells, so its rows pad
      // the later columns with the null sentinel. Files already in the
      // current layout stream through unmodified.
      try {
        try entries.foreach { e =>
          val fileCols = if (e.cols.nonEmpty) e.cols else curCols
          val remap: Option[Array[Int]] =
            if (fileCols == curCols) None
            else Some(schema.fields.map(f =>
              fileCols.indexOf(
                GraftLog.fileLocalName(schema, e, f.name))).toArray)
          // materialize the file's deletion vector: DV'd ordinals are
          // dropped here and the compacted output carries no DV — the
          // maintenance pass that keeps DVs from accumulating (Delta's
          // PURGE inside OPTIMIZE)
          val dvArr = GraftLog.dvOf(e)
            .map { case (f, _) => GraftLogDv.read(dir, f) }
            .getOrElse(Array.empty[Long])
          var dvPtr = 0
          var ord = -1L
          val in = GraftLogReaderFactory.openLines(dir, e.file)
          try {
            var line = in.readLine()
            // EVERY line is a row — including the empty line a
            // single-column table's empty-string cell produces
            // (well-formed files never yield spurious empties:
            // readLine drops terminators and EOF reads null, and the
            // gcol lineReader emits exactly rowCount lines). Skipping
            // empties desynchronized `ord` from the deletion vector's
            // ordinals and silently dropped the row from every
            // line-path scan while the columnar path served it.
            while (line != null) {
              {
                ord += 1
                // a cancelled parallel group must ABORT promptly (and
                // self-clean via the catch below) — gzip streams never
                // check the interrupt flag on their own
                if ((ord & 0xfff) == 0L && Thread.interrupted())
                  throw new InterruptedException(
                    "compaction group cancelled")
                if (dvPtr < dvArr.length && dvArr(dvPtr) == ord)
                  dvPtr += 1
                else {
                  val outLine = remap match {
                    case None => line
                    case Some(idx) =>
                      val cells = line.split("\t", -1)
                      idx.map(i => if (i < 0) NullCell else cells(i))
                        .mkString("\t")
                  }
                  writeLine(outLine)
                }
              }
              line = in.readLine()
            }
          } finally in.close()
        } finally closeCurrent()
        // a group whose every row was DV-deleted still publishes one
        // empty file so the group's partition record survives
        // compaction
        if (done.isEmpty) { open(); closeCurrent() }
        done.toSeq
      } catch {
        // a failing group deletes its OWN already-closed outputs (and
        // the open one) before propagating, so a parallel compaction's
        // cleanup never strands them until vacuum
        case t: Throwable =>
          if (out != null) {
            try out.abort() catch { case _: Throwable => () }
            new File(dir, outName).delete()
          }
          done.foreach(le => new File(dir, le.file).delete())
          throw t
      }
    }

    // Groups compact in PARALLEL (bounded pool): a partitioned table's
    // nightly OPTIMIZE is one independent rewrite per partition value,
    // and running them serially through one thread made the driver the
    // bottleneck — 64 values = 64× one group's wall time. Each
    // writeGroup touches only its own inputs/outputs (all state is
    // local), so the only coordination is ordering the results
    // deterministically and cleaning up every group's files if any
    // group fails. The single-group (unpartitioned) case stays on this
    // thread — its stream is inherently serial (outputs roll at the
    // size target across input-file boundaries). At cluster scale the
    // same per-group unit is the executor-task boundary; the bounded
    // local pool is its single-node expression.
    val fresh: Seq[LogEntry] =
      if (groups.size <= 1)
        groups.flatMap { case (pv, es) => writeGroup(es, pv) }
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(groups.size, 8))
        // Results are reaped in COMPLETION order (not submission
        // order): waiting on futures in sequence would sit behind an
        // earlier group's full rewrite before noticing a later
        // group's failure. The index threads each result back to its
        // submission slot so the published entry order stays
        // deterministic.
        val ecs = new java.util.concurrent.ExecutorCompletionService[
          (Int, Seq[LogEntry])](pool)
        val groupSeq = groups.toIndexedSeq
        val futs = groupSeq.zipWithIndex.map { case ((pv, es), i) =>
          ecs.submit(new java.util.concurrent.Callable[
              (Int, Seq[LogEntry])] {
            override def call(): (Int, Seq[LogEntry]) =
              (i, writeGroup(es, pv))
          })
        }
        try {
          val byIdx = new Array[Seq[LogEntry]](groupSeq.size)
          var done = 0
          while (done < groupSeq.size) {
            val (i, r) = ecs.take().get() // first failure, promptly
            byIdx(i) = r
            done += 1
          }
          byIdx.toSeq.flatten
        } catch {
          case e @ (_: java.util.concurrent.ExecutionException |
                    _: InterruptedException) =>
            // Fail fast AND clean deterministically: stop the pool
            // (queued groups never start), CANCEL undone futures
            // (running groups abort at their per-line interrupt
            // check or run out their short remainder), await the
            // drain, then delete every file in the `produced` ledger
            // — sibling outputs, whether their group completed, was
            // cancelled mid-flight, or completed DESPITE the cancel
            // (its future reads isCancelled, so reaping via get()
            // would strand exactly that case). The failing group
            // already deleted its own files in writeGroup's catch (a
            // double delete is a no-op). The sweep runs ONLY when the
            // drain actually completed: a straggler still inside a
            // gzip read could otherwise close and register NEW part
            // files after the sweep iterated — deleting under a live
            // writer. On a timed-out drain the outputs stay for
            // vacuum (the manifest never references them).
            pool.shutdownNow()
            futs.foreach(f => if (!f.isDone) f.cancel(true))
            // an interrupt delivered DURING the drain wait must not
            // replace the original failure or skip the sweep — treat
            // it as a timed-out drain (flag restored for the caller)
            val drained =
              try pool.awaitTermination(30,
                java.util.concurrent.TimeUnit.SECONDS)
              catch {
                case _: InterruptedException =>
                  Thread.currentThread().interrupt(); false
              }
            if (drained) produced.forEach(f => new File(dir, f).delete())
            throw (e match {
              case ee: java.util.concurrent.ExecutionException =>
                Option(ee.getCause).getOrElse(ee)
              case other => other
            })
        } finally pool.shutdown()
      }
    try commitNew(dir, schema) { v =>
      requireNoFileConflicts(dir, compactBase, v,
        live.map(_.file).toSet, "compaction")
      live.map(e => LogEntry.remove(v, e.file)) ++
        fresh.map(_.copy(version = v))
    } catch {
      case e: GraftConcurrentModificationException =>
        fresh.foreach(f => new File(dir, f.file).delete())
        throw e
    }
    live.size
  }

  /** Copy-on-write MERGE (Delta `MERGE INTO` in miniature): upsert a
    * batch of full-schema rows into the table by KEY, rewriting ONLY
    * the part files whose manifest [min, max] range on the key can
    * contain a matched key — numeric keys by the manifest [min, max]
    * range, string keys by the per-file blooms — so the stats written
    * for scan pruning double as the merge's file-targeting index,
    * which is exactly how Delta bounds a MERGE's write amplification.
    * Matched rows are replaced
    * by their update row, unmatched table rows are carried unchanged,
    * unmatched update rows are inserted. The rewrite is one
    * distributed full-outer join of the affected files against the
    * update batch (at 100 TB: affected-side shuffle is bounded by the
    * touched key range, and a small update batch broadcasts); the
    * commit publishes remove(affected) + add(rewritten) as one new
    * version, so readers switch snapshots atomically and time travel
    * to the pre-merge version keeps working. Merge adds carry
    * dataChange=true: the CDF re-delivers carried rows from rewritten
    * files (the append-only feed's documented limit; Delta annotates
    * per-row change types to avoid this). Returns
    * (filesRewritten, filesTotal). */
  def mergeUpsert(spark: org.apache.spark.sql.SparkSession, dir: String,
      updates: org.apache.spark.sql.DataFrame,
      keyCol: String,
      txn: Option[(String, Long)] = None): (Int, Int) = {
    requireNoWap("MERGE"); requireNoBranch("MERGE")
    import org.apache.spark.sql.functions.{col, lit, when,
      min => fmin, max => fmax}
    val schema = storedSchema(dir).getOrElse(throw new IllegalArgumentException(
      s"graft-log table not found at $dir"))
    require(schema.fieldNames.contains(keyCol), s"no key column $keyCol")
    val cols = schema.fieldNames.toSeq
    require(cols.forall(updates.columns.contains),
      s"merge batch must carry the full table schema ${cols.mkString(",")}")
    // The batch is coerced to the TABLE's column types up front — the
    // Delta/SQL-MERGE cast-source-to-target contract — so matching,
    // file targeting, CDC images, and the rewrite all see canonical
    // values: the schema check above is name-only, and a CDC frame
    // carrying the key as decimal/double would otherwise (a) hash
    // "42.00"/"42.0" against blooms that store "42" — silently
    // DROPPING a file that really holds the key, whose stale row then
    // survives beside a wrongly-inserted "unmatched" copy — and
    // (b) write non-canonical cell text through the scratch rewrite
    // into a long-typed column.
    //
    // The coercion must be LOSSLESS per row (Delta's ANSI
    // store-assignment policy), but a plain cast() follows the
    // session's spark.sql.ansi.enabled: with ANSI off a malformed
    // string key silently casts to NULL (the row would then INSERT as
    // a garbage NULL-key row while its target stays stale), an
    // overflowing double saturates onto Long.MaxValue's row, and a
    // fractional decimal truncates onto a row it never matched under
    // plain join coercion. Reject loudly instead: any row whose value
    // does not ROUND-TRIP through the table type (null-safe compare
    // against the re-cast original) fails the merge. Exact and
    // widening batches (the legitimate callers) round-trip by
    // construction and pay one short-circuit probe job only when a
    // column's type actually differs. The probe itself uses try_cast
    // (null on failure under EITHER ansi setting): with
    // spark.sql.ansi.enabled a plain cast would throw its own raw
    // CAST/ARITHMETIC error on the malformed value before the require
    // below fires, making the diagnostic depend on session config.
    val updTypes = updates.schema.fields.map(f => f.name -> f.dataType).toMap
    val lossy = schema.fields.toSeq
      .filter(f => updTypes.get(f.name).exists(_ != f.dataType))
      .map(f => !(col(f.name).try_cast(f.dataType)
        .try_cast(updTypes(f.name)) <=> col(f.name)))
      .reduceOption(_ || _)
    lossy.foreach(cond =>
      require(updates.filter(cond).limit(1).collect().isEmpty,
        "merge batch values must cast LOSSLESSLY to the table's " +
          s"column types ${schema.simpleString} — a value would be " +
          "nulled, truncated, or saturated by the coercion"))
    val up = updates.select(schema.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    val rewriteBase = currentVersion(dir)
    val live = entriesAsOf(dir, Long.MaxValue)
    val keyNumeric = schema.fields.find(_.name == keyCol)
      .exists(_.dataType match {
        case LongType | IntegerType | DoubleType => true
        case _ => false
      })
    // Stats overlap is conservative: a stat-less entry might hold any
    // key, so it rewrites. Numeric keys bound by manifest [min, max]
    // range; STRING keys bound by the per-file blooms the scan side
    // already consults — a file whose bloom provably lacks EVERY
    // update key cannot hold a matched row and is never rewritten
    // (the string-keyed analogue of the range bound; bloomless
    // entries — legacy, or post-compaction — rewrite conservatively).
    val affected = if (!keyNumeric) {
      // The probe set is driver-side, so it is capped: a batch with
      // more distinct keys than the cap rewrites everything — such a
      // batch admits most files through the blooms anyway.
      val keys = up.select(col(keyCol))
        .filter(col(keyCol).isNotNull).distinct()
        .limit(MaxMergeProbeKeys + 1).collect().map(_.get(0).toString)
      if (keys.length > MaxMergeProbeKeys) live
      else if (keys.isEmpty) {
        // EITHER an empty batch (no-op) OR only NULL-keyed rows —
        // which match nothing and must still INSERT (losing them here
        // would contradict the NULL-key contract below).
        if (up.limit(1).collect().isEmpty) {
          // no-op merge still records the txn marker (the consumer's
          // applied-through watermark must advance past empty spans)
          txn.foreach { case (a, tv) => commitTxn(dir, a, tv) }
          return (0, live.size)
        }
        Seq.empty
      } else {
        // hash once per key, deserialize once per file (not k × n)
        val keyHashes = keys.map(GraftLogBloom.packedHash)
        live.filter(e => GraftLogBloom.mayContainAny(e,
          GraftLog.fileLocalName(schema, e, keyCol), keyHashes))
      }
    } else {
      // Per-KEY file targeting, not per-batch-range: a CDC batch
      // typically mixes a narrow update window with above-max inserts,
      // and its GLOBAL [min, max] then spans half the table even
      // though the actual keys touch one file. Probing each file's
      // range with the batch's distinct key SET (driver-capped, like
      // the string bloom probe) admits only files that can really
      // hold a matched key. Over the cap, fall back to the global
      // range overlap.
      val keyRows = up.select(col(keyCol))
        .filter(col(keyCol).isNotNull).distinct()
        .limit(MaxMergeProbeKeys + 1).collect()
      if (keyRows.isEmpty) {
        // EITHER an empty batch (no-op) OR only NULL-keyed rows —
        // which match nothing and must still INSERT (losing them here
        // would contradict the NULL-key contract above).
        if (up.limit(1).collect().isEmpty) {
          // no-op merge still records the txn marker (the consumer's
          // applied-through watermark must advance past empty spans)
          txn.foreach { case (a, tv) => commitTxn(dir, a, tv) }
          return (0, live.size)
        }
        Seq.empty
      } else if (keyRows.length <= MaxMergeProbeKeys) {
        val keys: Array[AnyRef] = keyRows.map(r =>
          new java.math.BigDecimal(r.get(0).toString): AnyRef)
        java.util.Arrays.sort(keys)
        // Bloom probes hash the TABLE's canonical cell text — the
        // integral `Long.toString` the writer stored. keyRows come
        // from the LOSSLESSLY-coerced batch (`up` above), so for an
        // integral key column r.get(0) is already the exact boxed
        // Long/Integer whose toString IS that canonical text. Double
        // key columns carry no blooms (writer policy), so the
        // conjunct is skipped outright. Hashed once here; each file
        // deserializes its bloom once.
        val keyDt = schema.fields.find(_.name == keyCol).get.dataType
        val integral = keyDt == LongType || keyDt == IntegerType
        val keyHashes: Array[Long] =
          if (!integral) Array.empty
          else keyRows.map(r =>
            GraftLogBloom.packedHash(r.get(0).toString))
        live.filter { e =>
          val local = GraftLog.fileLocalName(schema, e, keyCol)
          val inRange = GraftLog.decStat(e, local) match {
            case Some((lo, hi)) =>
              // any key in [lo, hi]? first key >= lo decides
              val i = {
                val p = java.util.Arrays.binarySearch(keys, lo)
                if (p >= 0) p else -(p + 1)
              }
              i < keys.length &&
                keys(i).asInstanceOf[java.math.BigDecimal]
                  .compareTo(hi) <= 0
            case None => true
          }
          inRange && (!integral ||
            GraftLogBloom.mayContainAny(e, local, keyHashes))
        }
      } else {
        val lo = keyRows.map(r =>
          new java.math.BigDecimal(r.get(0).toString)).min
        val hi = keyRows.map(r =>
          new java.math.BigDecimal(r.get(0).toString)).max
        live.filter { e =>
          GraftLog.decStat(e,
              GraftLog.fileLocalName(schema, e, keyCol)) match {
            case Some((mn, mx)) =>
              mx.compareTo(lo) >= 0 && mn.compareTo(hi) <= 0
            case None => true
          }
        }
      }
    }
    // A NULL-keyed update row never matches (SQL equality) and inserts
    // as-is — legal only when the stored key column admits NULLs;
    // against a non-nullable key it would write a row that violates
    // the table's own schema, so it rejects (the NOT NULL contract).
    if (!schema.fields.find(_.name == keyCol).exists(_.nullable))
      require(up.filter(col(keyCol).isNull).limit(1).collect().isEmpty,
        s"merge batch carries a NULL key but table column $keyCol is " +
          "non-nullable")
    // A key matched by MORE than one update row would silently
    // duplicate the table row through the join — reject loudly, the
    // Delta MERGE multiple-source-rows-matched contract. (NULL-keyed
    // update rows are exempt: equality never matches them, so each is
    // an independent insert.)
    val dup = up.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"merge batch has duplicate key ${if (dup.isEmpty) "" else dup.head.get(0)}: " +
        "each key may match at most one update row")
    val cur = spark.read.format("graft.sources.GraftLogSource")
      .option("path", dir)
      .option("pickFiles", affected.map(_.file).mkString(","))
      .load()
    // The side marker (not the key) discriminates update rows: a
    // NULL-keyed update row never joins, and keying the when() on
    // u.key would turn it into an all-NULL row and drop its payload.
    val u = up.select(cols.map(col): _*)
      .withColumn("__graft_u", lit(true))
    val merged = cur.alias("t")
      .join(u.alias("u"), col(s"t.$keyCol") === col(s"u.$keyCol"),
        "full_outer")
      .select(cols.map(f => when(col("__graft_u").isNotNull,
        col(s"u.$f")).otherwise(col(s"t.$f")).as(f)): _*)
    // Typed CDC (table opt-in): matched keys emit pre/post images,
    // unmatched update rows (incl. the never-matching NULL-keyed
    // ones) emit inserts. `cur` covers every possibly-matching file
    // by the stats admission above, so the classification is exact.
    val cdc =
      if (!cdfEnabled(dir)) None
      else {
        val matched = cur.alias("t").join(u.alias("u"),
          col(s"t.$keyCol") === col(s"u.$keyCol"), "inner")
        val pre = matched.select(cols.map(f =>
          col(s"t.$f").as(f)): _*)
          .withColumn(ChangeTypeCol, lit("update_preimage"))
        val post = matched.select(cols.map(f =>
          col(s"u.$f").as(f)): _*)
          .withColumn(ChangeTypeCol, lit("update_postimage"))
        val ins = u.alias("u").join(
            cur.select(col(keyCol)).alias("t"),
            col(s"u.$keyCol") === col(s"t.$keyCol"), "left_anti")
          .select(cols.map(col): _*)
          .withColumn(ChangeTypeCol, lit("insert"))
        Some(pre.unionByName(post).unionByName(ins))
      }
    rewriteFiles(spark, dir, affected, merged, schema, txn = txn,
      cdcChanges = cdc, baseVersion = rewriteBase)
    (affected.size, live.size)
  }

  /** Copy-on-write DELETE of the key range [lo, hi): rewrites only the
    * part files whose stats overlap the range, dropping the in-range
    * rows; out-of-range files survive untouched (zero write
    * amplification outside the predicate's reach). Same commit shape
    * as [[mergeUpsert]]. Returns (filesRewritten, filesTotal). */
  def deleteRange(spark: org.apache.spark.sql.SparkSession, dir: String,
      keyCol: String, lo: Long, hi: Long): (Int, Int) = {
    requireNoWap("DELETE"); requireNoBranch("DELETE")
    import org.apache.spark.sql.functions.col
    val schema = storedSchema(dir).getOrElse(throw new IllegalArgumentException(
      s"graft-log table not found at $dir"))
    val rewriteBase = currentVersion(dir)
    val live = entriesAsOf(dir, Long.MaxValue)
    val dlo = java.math.BigDecimal.valueOf(lo)
    val dhi = java.math.BigDecimal.valueOf(hi)
    val affected = live.filter { e =>
      GraftLog.decStat(e,
          GraftLog.fileLocalName(schema, e, keyCol)) match {
        case Some((mn, mx)) =>
          mx.compareTo(dlo) >= 0 && mn.compareTo(dhi) < 0
        case None => true
      }
    }
    if (affected.isEmpty) return (0, live.size)
    val picked = spark.read.format("graft.sources.GraftLogSource")
      .option("path", dir)
      .option("pickFiles", affected.map(_.file).mkString(","))
      .load()
    val remaining = picked.filter(!(col(keyCol) >= lo && col(keyCol) < hi))
    val cdc =
      if (!cdfEnabled(dir)) None
      else Some(picked.filter(col(keyCol) >= lo && col(keyCol) < hi)
        .withColumn(ChangeTypeCol,
          org.apache.spark.sql.functions.lit("delete")))
    rewriteFiles(spark, dir, affected, remaining, schema,
      cdcChanges = cdc, baseVersion = rewriteBase)
    (affected.size, live.size)
  }

  /** SQL `DELETE FROM t WHERE ...` lands here (via [[SupportsDelete]]
    * on the table): a general copy-on-write delete over an arbitrary
    * conjunction of convertible predicates. File targeting reuses the
    * scan's conservative stats check — a file rewrites only if EVERY
    * conjunct may match it — and kept rows are those where the
    * predicate is not TRUE (false or NULL, the SQL DELETE contract).
    * Re-running the same DELETE is a cheap no-op: the rewritten files'
    * refreshed stats no longer overlap the predicate. Returns
    * (filesRewritten, filesTotal). */
  def deleteWhere(spark: org.apache.spark.sql.SparkSession, dir: String,
      filters: Array[Filter]): (Int, Int) = {
    requireNoWap("DELETE"); requireNoBranch("DELETE")
    import org.apache.spark.sql.functions.{coalesce, lit}
    val schema = storedSchema(dir).getOrElse(throw new IllegalArgumentException(
      s"graft-log table not found at $dir"))
    require(filters.forall(convertible),
      s"unsupported DELETE predicate: ${filters.mkString(", ")}")
    val rewriteBase = currentVersion(dir)
    val live = entriesAsOf(dir, Long.MaxValue)
    // The DSv2 contract ANDs the filter array, so an EMPTY array (or a
    // lone AlwaysTrue — `DELETE FROM t` with no WHERE) is the
    // unconditional delete: retire every live file in one metadata
    // commit, no rewrite needed.
    if (filters.isEmpty || filters.forall(_.isInstanceOf[AlwaysTrue])) {
      if (live.nonEmpty) {
        // typed CDC must still record the vanished rows (Delta's CDF
        // does the same on unconditional DELETE) — the one case where
        // the sidecar costs a table scan, because the delete itself
        // is metadata-only
        val cdcEntries =
          if (!cdfEnabled(dir)) Seq.empty
          else stageCdc(spark, dir,
            spark.read.format("graft.sources.GraftLogSource")
              .option("path", dir).load()
              .withColumn(ChangeTypeCol, lit("delete")))
        commitNew(dir, schema)(v =>
          live.map(e => LogEntry.remove(v, e.file)) ++
            cdcEntries.map(_.copy(version = v)))
      }
      return (live.size, live.size)
    }
    val affected = live.filter(e =>
      filters.forall(f => GraftLogScan.mayMatch(schema, e, f)))
    if (affected.isEmpty) return (0, live.size)
    val cond = filters.map(filterToColumn).reduce(_ && _)
    val picked = spark.read.format("graft.sources.GraftLogSource")
      .option("path", dir)
      .option("pickFiles", affected.map(_.file).mkString(","))
      .load()
    val remaining = picked.filter(!coalesce(cond, lit(false)))
    val cdc =
      if (!cdfEnabled(dir)) None
      else Some(picked.filter(coalesce(cond, lit(false)))
        .withColumn(ChangeTypeCol, lit("delete")))
    rewriteFiles(spark, dir, affected, remaining, schema,
      cdcChanges = cdc, baseVersion = rewriteBase)
    (affected.size, live.size)
  }

  /** Merge-on-read DELETE via deletion vectors (Delta DV / Iceberg v2
    * position-delete shape) [EXT]: instead of rewriting every affected
    * part file copy-on-write, record the DELETED ROW POSITIONS
    * per file in a sidecar `dv-*.bin` and commit one metadata version
    * of `dv` entries — write amplification drops from O(affected
    * bytes) to O(deleted positions), which is what makes frequent
    * small deletes (GDPR erasure, late-data retractions) affordable on
    * a 100 TB table. Readers skip DV'd positions during the scan
    * (both decoders), COUNT pushdown subtracts DV cardinality
    * exactly, MIN/MAX pushdown disables itself on DV'd files (stats
    * may be stale), and compaction materializes the deletes and drops
    * the DVs. Positions are collected on the driver and capped at
    * [[MaxDvPositions]] — a larger delete falls back to the
    * copy-on-write rewrite (returned flag says which path ran).
    * A repeated delete is a cheap no-op: already-deleted rows are
    * invisible to the position scan. Returns
    * (filesTouched, filesTotal, usedDv). */
  def deleteWhereMoR(spark: org.apache.spark.sql.SparkSession,
      dir: String, filters: Array[Filter],
      maxPositions: Int = MaxDvPositions): (Int, Int, Boolean) = {
    requireNoWap("DELETE"); requireNoBranch("DELETE")
    import org.apache.spark.sql.functions.{coalesce, lit}
    val schema = storedSchema(dir).getOrElse(
      throw new IllegalArgumentException(
        s"graft-log table not found at $dir"))
    require(filters.nonEmpty && filters.forall(convertible),
      s"unsupported MoR DELETE predicate: ${filters.mkString(", ")}")
    val morBase = currentVersion(dir)
    val live = entriesAsOf(dir, Long.MaxValue)
    val affected = live.filter(e =>
      filters.forall(f => GraftLogScan.mayMatch(schema, e, f)))
    if (affected.isEmpty) return (0, live.size, true)
    val cond = filters.map(filterToColumn).reduce(_ && _)
    // position scan: the `_pos` metadata column is the row's physical
    // ordinal within its part file (stable across DV state — already
    // deleted ordinals are skipped by the reader, so re-deletes are
    // no-ops and unions with the existing DV are disjoint-safe)
    val hits = spark.read.format("graft.sources.GraftLogSource")
      .option("path", dir)
      .option("pickFiles", affected.map(_.file).mkString(","))
      .load()
      .filter(coalesce(cond, lit(false)))
      .select(org.apache.spark.sql.functions.col("_file"),
        org.apache.spark.sql.functions.col("_pos"))
      .limit(maxPositions + 1)
      .collect()
    if (hits.length > maxPositions) {
      // too many positions for a healthy DV — the COW rewrite IS the
      // bounded path here
      val (r, t) = deleteWhere(spark, dir, filters)
      return (r, t, false)
    }
    if (hits.isEmpty) return (0, live.size, true)
    val byFile = hits.groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getLong(1)) }
    val touched = affected.filter(e => byFile.contains(e.file))
    // typed CDC rides the DV commit too: the deleted rows are exactly
    // the predicate's matches in the touched files (re-deletes never
    // reach here — already-DV'd ordinals are invisible to the
    // position scan above, so the feed never double-reports)
    val cdcEntries =
      if (!cdfEnabled(dir)) Seq.empty
      else stageCdc(spark, dir,
        spark.read.format("graft.sources.GraftLogSource")
          .option("path", dir)
          .option("pickFiles", touched.map(_.file).mkString(","))
          .load()
          .filter(coalesce(cond, lit(false)))
          .withColumn(ChangeTypeCol, lit("delete")))
    try commitNew(dir, schema) { v =>
      // cross-process race: another rewrite retiring a touched file
      // between the position scan and this commit would make the DV
      // annotate a dead add (silently lost delete) — abort retryably.
      // An orphaned dv-* file from the abort is unreferenced and aged
      // out by vacuum.
      requireNoFileConflicts(dir, morBase, v,
        touched.map(_.file).toSet, "merge-on-read DELETE")
      touched.map { e =>
        val merged = (dvOf(e).map { case (f, _) =>
          GraftLogDv.read(dir, f) }.getOrElse(Array.empty[Long]) ++
          byFile(e.file)).distinct.sorted
        LogEntry.dv(v, e.file,
          Some((GraftLogDv.write(dir, merged), merged.length.toLong)))
      } ++ cdcEntries.map(_.copy(version = v))
    } catch {
      case e: GraftConcurrentModificationException =>
        // reclaim the staged CDC sidecars promptly (same as the
        // rewrite path) instead of leaving them to vacuum's horizon
        cdcEntries.foreach(c => new File(dir, c.file).delete())
        throw e
    }
    (touched.size, live.size, true)
  }

  /** The predicate subset [[deleteWhere]] can replay as a Column —
    * `canDeleteWhere` gates on this, so an inexpressible DELETE fails
    * at analysis instead of deleting the wrong rows. */
  def convertible(f: Filter): Boolean = f match {
    case EqualTo(_, _) | GreaterThan(_, _) | GreaterThanOrEqual(_, _) |
         LessThan(_, _) | LessThanOrEqual(_, _) | In(_, _) |
         IsNull(_) | IsNotNull(_) => true
    case _: AlwaysTrue | _: AlwaysFalse => true
    case And(l, r) => convertible(l) && convertible(r)
    case Or(l, r) => convertible(l) && convertible(r)
    case Not(c) => convertible(c)
    case _ => false
  }

  private def filterToColumn(f: Filter): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, lit}
    f match {
      case EqualTo(a, v) => col(a) === lit(v)
      case GreaterThan(a, v) => col(a) > lit(v)
      case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
      case LessThan(a, v) => col(a) < lit(v)
      case LessThanOrEqual(a, v) => col(a) <= lit(v)
      case In(a, vs) => col(a).isin(vs.toIndexedSeq: _*)
      case IsNull(a) => col(a).isNull
      case IsNotNull(a) => col(a).isNotNull
      case _: AlwaysTrue => lit(true)
      case _: AlwaysFalse => lit(false)
      case And(l, r) => filterToColumn(l) && filterToColumn(r)
      case Or(l, r) => filterToColumn(l) || filterToColumn(r)
      case Not(c) => !filterToColumn(c)
      case other => throw new IllegalArgumentException(
        s"inconvertible filter $other")
    }
  }

  /** OPTIMIZE ZORDER as table maintenance (Delta `OPTIMIZE ... ZORDER
    * BY (x, y)` in miniature): rewrite the CURRENT snapshot range-
    * partitioned by the Morton interleave of two numeric columns, so
    * each new part file covers a compact 2-D tile and its manifest
    * min/max narrow on BOTH dimensions — a conjunctive 2-D predicate
    * then skips most files at planning time, where the ingest-order
    * layout had to read everything. Published as remove(all live) +
    * add(tiles) with dataChange=false: same rows, new layout — the
    * change feed and a resumed stream see nothing, and older snapshots
    * stay time-travelable. This is the layout decision as a MAINTENANCE
    * op on live data, not an ingest-time choice — at 100 TB it runs
    * incrementally per partition, amortized like compaction. Returns
    * the number of files rewritten. */
  def optimizeZorder(spark: org.apache.spark.sql.SparkSession,
      dir: String, xCol: String, yCol: String, bits: Int = 8,
      nFiles: Int = 16): Int = {
    import org.apache.spark.sql.functions.col
    val schema = storedSchema(dir).getOrElse(throw new IllegalArgumentException(
      s"graft-log table not found at $dir"))
    // An identity-partitioned table's layout is owned by the partition
    // column: the partitioned write's clustered distribution would
    // re-shuffle the Morton range layout away and silently produce
    // per-value files instead of 2-D tiles. Reject rather than degrade
    // (z-order the table before partitioning it, or choose one layout
    // — the same restriction Delta places on partition columns).
    require(partitionColOf(dir).isEmpty,
      s"cannot OPTIMIZE ZORDER an identity-partitioned table " +
        s"(partitioned by ${partitionColOf(dir).getOrElse("")}): the " +
        "partition layout owns file placement")
    val rewriteBase = currentVersion(dir)
    val live = entriesAsOf(dir, Long.MaxValue)
    if (live.isEmpty) return 0
    val replacement = spark.read.format("graft.sources.GraftLogSource")
      .option("path", dir).load()
      .withColumn("__graft_z",
        graft.functions.ZOrder.zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(nFiles, col("__graft_z"))
      .drop("__graft_z")
    rewriteFiles(spark, dir, live, replacement, schema,
      dataChange = false, baseVersion = rewriteBase)
    live.size
  }

  /** Partition EVOLUTION (Iceberg's partition-spec change + its
    * rewrite_data_files, as one maintenance op): re-key the table's
    * identity partitioning to `col` and rewrite the live snapshot
    * routed by it — one file per value, each carrying its partition
    * record, so KeyGrouped scans and storage-partitioned joins resume
    * on the NEW key immediately. A value-routed layout cannot evolve
    * by metadata alone (old files span many new-key values), so the
    * rewrite IS the evolution; `dataChange = false` keeps the relayout
    * invisible to the change feed, and subsequent appends route by the
    * new key through the ordinary partitioned write path. History
    * stays time-travelable (the pre-evolution files are retired, not
    * deleted, until vacuum's horizon passes). Returns the number of
    * files retired. */
  def repartitionTable(spark: org.apache.spark.sql.SparkSession,
      dir: String, col: String): Int = synchronized {
    requireNoWap("repartition"); requireNoBranch("repartition")
    val schema = storedSchema(dir).getOrElse(
      throw new IllegalArgumentException(
        s"graft-log table not found at $dir"))
    require(schema.fieldNames.contains(col),
      s"no column '$col' at $dir")
    if (partitionColOf(dir).contains(col)) return 0
    val rewriteBase = currentVersion(dir)
    val live = entriesAsOf(dir, Long.MaxValue)
    if (live.isEmpty) {
      setPartitionCol(dir, col, allowChange = true)
      return 0
    }
    // read exactly the captured snapshot (pickFiles), not "the table
    // at execution time" — the lazy read runs inside rewriteFiles,
    // and an unpinned scan would fold a concurrent append's rows into
    // the rewrite while its file stayed live: duplicates
    val replacement = spark.read.format("graft.sources.GraftLogSource")
      .option("path", dir)
      .option("pickFiles", live.map(_.file).mkString(","))
      .load()
    // the scratch write routes by the NEW key (override), but the
    // table's own declaration flips only AFTER the rewrite commits —
    // a crashed evolution leaves the old declaration intact and a
    // retry re-runs instead of silently no-opping on the early return
    rewriteFiles(spark, dir, live, replacement, schema,
      dataChange = false, partitionOverride = Some(col),
      baseVersion = rewriteBase)
    setPartitionCol(dir, col, allowChange = true)
    live.size
  }

  /** Shared commit tail for copy-on-write maintenance: write the
    * replacement rows through the normal writer into a scratch log
    * (full stats/cols commit messages for free), adopt its part files,
    * and publish remove(old) + add(new) as one version. Zero-row parts
    * are dropped, not published. `dataChange = false` marks a pure
    * layout rewrite (same rows) that the change feed must skip. */
  /** Optimistic-concurrency guard for row-level rewrites: between the
    * snapshot the rewrite PLANNED against (`baseVersion`) and the
    * version it is CLAIMING, no other commit may have touched a file
    * this rewrite retires — a remove (someone else rewrote/compacted
    * it), a DV assignment (rows deleted under us), or a re-add
    * (RESTORE) all mean the planned replacement rows are stale.
    * Invoked INSIDE the commit CAS loop, so a lost version race
    * re-checks the widened span before retrying; a detected conflict
    * aborts loudly with a retryable error instead of silently
    * resurrecting overwritten rows (the Delta/Iceberg
    * concurrent-modification contract). Appends never trip this:
    * fresh files are new UUIDs, disjoint from any retired set. */
  /** `rewriteFiles` baseVersion sentinel for "caller did not pre-plan
    * a base" — distinct from -1, which is a real base (empty table). */
  private[graft] val UnsetBase: Long = Long.MinValue

  private def requireNoFileConflicts(dir: String, baseVersion: Long,
      claiming: Long, retired: Set[String], op: String): Unit = {
    if (retired.isEmpty) return
    val span = listVersioned(dir, CommitPrefix)
      .filter { case (ver, _) => ver > baseVersion && ver < claiming }
    // The check is only sound if every version in the span is still
    // on disk as a commit file: a concurrent cross-process expireLog
    // may have folded part of the span into a checkpoint and deleted
    // those commit files, and a conflicting rewrite hidden in the
    // folded part would otherwise pass silently and resurrect
    // overwritten rows. Versions are contiguous (the CAS hands them
    // out one by one), so coverage = every number in the open span.
    val present = span.map(_._1).toSet
    val missing = (baseVersion + 1).until(claiming)
      .filterNot(present.contains)
    if (missing.nonEmpty)
      throw new GraftConcurrentModificationException(
        s"$op on $dir planned against version $baseVersion, but " +
          s"commit file(s) for version(s) ${missing.take(5).mkString(",")}" +
          " in its conflict-check span were expired into a " +
          "checkpoint by a concurrent log maintenance pass — " +
          "conflicts there are unverifiable; replan against the " +
          "current snapshot and retry")
    val touched = span
      .flatMap { case (_, f) => readEntryLines(f) }
      .filter(e => retired.contains(e.file))
    if (touched.nonEmpty)
      throw new GraftConcurrentModificationException(
        s"$op on $dir planned against version $baseVersion, but " +
          s"concurrent commit(s) touched ${touched.size} of its " +
          "input file(s): " +
          touched.map(e => s"v${e.version}:${e.action}:${e.file}")
            .distinct.take(5).mkString(", ") +
          " — replan against the current snapshot and retry")
  }

  /** Full-replace conflict guard for rewrites planned against an
    * EMPTY snapshot: with no retired files [[requireNoFileConflicts]]
    * is vacuous (nothing to touch), yet a concurrent FIRST commit's
    * rows would be served beside the full rewrite — the exact
    * duplicate-serving hazard the retired-file check closes for
    * non-empty plans (two bootstrap SCD2 publishers racing an empty
    * dimension would each keep the other's rows live). Any dataChange
    * entry in the span conflicts, retryably.
    *
    * Only dataChange ADDS are tested: [[LogEntry.remove]] hardcodes
    * dataChange=false, so a remove can never carry the flag itself —
    * and removes are still covered TRANSITIVELY, because a remove in
    * the span of a plan made against an EMPTY snapshot can only
    * retire a file some in-span dataChange add introduced (the base
    * had no files to retire), and that add trips the guard. */
  private def requireNoDataCommits(dir: String, baseVersion: Long,
      claiming: Long, op: String): Unit = {
    val data = listVersioned(dir, CommitPrefix)
      .filter { case (ver, _) => ver > baseVersion && ver < claiming }
      .flatMap { case (_, f) => readEntryLines(f) }
      .filter(e => e.isAdd && e.dataChange)
    if (data.nonEmpty)
      throw new GraftConcurrentModificationException(
        s"$op on $dir planned against an empty snapshot " +
          s"(v$baseVersion), but concurrent commit(s) landed " +
          s"${data.size} data entr(ies) in its span: " +
          data.map(e => s"v${e.version}:${e.action}:${e.file}")
            .distinct.take(5).mkString(", ") +
          " — replan against the current snapshot and retry")
  }

  private[graft] def rewriteFiles(spark: org.apache.spark.sql.SparkSession,
      dir: String, old: Seq[LogEntry],
      replacement: org.apache.spark.sql.DataFrame,
      schema: StructType, dataChange: Boolean = true,
      txn: Option[(String, Long)] = None,
      cdcChanges: Option[org.apache.spark.sql.DataFrame] = None,
      partitionOverride: Option[String] = None,
      baseVersion: Long = UnsetBase,
      fullReplace: Boolean = false): Unit = {
    // The conflict-detection base: the newest version when the rewrite
    // was planned (callers that pre-planned pass their own). -1 is a
    // REAL base — "the table was empty at plan time" — honored as-is
    // so the conflict span covers every version since the beginning;
    // only the unset sentinel falls back to a late read (which would
    // re-open the scratch-write window a pre-planned caller closed).
    val base =
      if (baseVersion != UnsetBase) baseVersion else currentVersion(dir)
    // typed CDC sidecars publish in the SAME commit as the rewrite
    val cdcEntries = cdcChanges.map(stageCdc(spark, dir, _))
      .getOrElse(Seq.empty)
    val scratch = s"$dir/__rewrite-${UUID.randomUUID()}"
    // a partitioned table's maintenance rewrite keeps routing rows per
    // value (the scratch table inherits the declaration — or the
    // partition-evolution override), so rewritten files keep their
    // partition record and SPJ grouping survives merge/delete —
    // compaction on a partitioned table yields one file per VALUE,
    // the Iceberg per-partition compaction shape
    partitionOverride.orElse(partitionColOf(dir))
      .foreach(setPartitionCol(scratch, _))
    replacement.write.format("graft.sources.GraftLogSource")
      .option("path", scratch).mode("overwrite").save()
    val fresh = entriesAsOf(scratch, Long.MaxValue).filter(_.rows > 0L)
    fresh.foreach { e =>
      Files.move(Paths.get(scratch, e.file), Paths.get(dir, e.file))
    }
    try commitNew(dir, storedSchema(dir).getOrElse(schema)) { v =>
      requireNoFileConflicts(dir, base, v,
        old.map(_.file).toSet, "rewrite")
      // a full-table replace planned against an EMPTY snapshot has no
      // retired files for the check above to defend — any concurrent
      // data commit in the span conflicts instead
      if (fullReplace && old.isEmpty)
        requireNoDataCommits(dir, base, v, "rewrite")
      old.map(e => LogEntry.remove(v, e.file)) ++
        fresh.map(e => LogEntry.add(v, e.file, e.rows, e.stats,
          dataChange = dataChange, cols = e.cols)) ++
        cdcEntries.map(_.copy(version = v)) ++
        txn.map { case (app, tv) => LogEntry.txn(v, app, tv) }.toSeq
    } catch {
      case e: GraftConcurrentModificationException =>
        // the uncommitted replacement files and staged CDC sidecars
        // are invisible orphans — reclaim them now rather than
        // leaving them for vacuum's retention horizon
        fresh.foreach(f => new File(dir, f.file).delete())
        cdcEntries.foreach(c => new File(dir, c.file).delete())
        throw e
    } finally {
      Option(new File(scratch).listFiles()).getOrElse(Array.empty)
        .foreach(_.delete())
      new File(scratch).delete()
    }
  }

  /** Batch commit. Truncate resets history to a NEW lineage (version
    * 0) — overwrite is a new table, not an addendum. An append with
    * extra columns evolves the stored schema additively
    * ([[mergeSchemas]]); each entry records its file's own column list
    * so readers decode every vintage. An empty non-truncating append
    * is a no-op; a truncate with zero files is a legitimate empty
    * table (empty version-0 commit).
    *
    * Concurrency: a PURE append runs LOCK-FREE — fresh part files are
    * new UUIDs, so two appends can never touch the same file; the
    * version CAS in [[commitNewUnlocked]] orders them and BOTH commit
    * without queueing on a table lock (the Delta/Iceberg
    * disjoint-append rule: appends conflict with nothing). Only two
    * shapes still take the JVM lock: truncate (the lineage reset +
    * version-0 commit must not interleave with anything) and a
    * txn-bearing append (the idempotence read-check must not race its
    * own marker's commit within this JVM; cross-process idempotence
    * rides the marker replay as before). */
  def append(dir: String, fresh: Seq[GraftLogCommit], schema: StructType,
      truncate: Boolean, txn: Option[(String, Long)] = None): Unit = {
    require(txn.isEmpty || !truncate,
      "txnAppId/txnVersion apply to appends only — an overwrite " +
        "resets the lineage and would wipe the idempotence markers")
    // a SCHEMA-EVOLVING append (or a first write) also takes the JVM
    // lock: two evolving appends racing the _schema read-modify-write
    // could silently drop one's new column; same-schema appends never
    // write _schema at all (commitNewUnlocked skips identical bytes)
    lazy val evolving = storedSchema(dir)
      .forall(s => mergeSchemas(s, schema) != s)
    if (truncate) synchronized {
      // truncate additionally excludes the LOCK-FREE appends via the
      // table's write lock: resetLineage's delete sequence must not
      // interleave with a concurrent append's version claim (a commit
      // could land mid-wipe and survive into — or be wrongly deleted
      // from — the new lineage)
      val w = rwLockFor(dir).writeLock()
      w.lock()
      try appendImpl(dir, fresh, schema, truncate, txn)
      finally w.unlock()
    } else if (txn.isDefined || evolving)
      synchronized { appendImpl(dir, fresh, schema, truncate, txn) }
    else {
      // PURE append — lock-free among appends (shared read lock only
      // fences truncate's lineage wipe); the version CAS orders them
      val r = rwLockFor(dir).readLock()
      r.lock()
      try appendImpl(dir, fresh, schema, truncate, txn)
      finally r.unlock()
    }
  }

  private val tableLocks = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.locks.ReentrantReadWriteLock]()
  private def rwLockFor(dir: String) =
    tableLocks.computeIfAbsent(dir,
      _ => new java.util.concurrent.locks.ReentrantReadWriteLock())

  private def appendImpl(dir: String, fresh: Seq[GraftLogCommit],
      schema: StructType, truncate: Boolean,
      txn: Option[(String, Long)]): Unit = {
    // Idempotent append (Delta's txnAppId/txnVersion write options):
    // with a txn identity, a replayed batch whose (appId, version) is
    // already recorded is a silent no-op — marker and data commit
    // atomically, so a foreachBatch sink retried after a crash can
    // never double-append its micro-batch.
    if (txn.exists { case (a, v) => lastTxnVersion(dir, a) >= v }) return
    if (fresh.isEmpty && !truncate && txn.isEmpty) return
    val merged = if (truncate) schema
      else storedSchema(dir).map(mergeSchemas(_, schema)).getOrElse(schema)
    if (!truncate) requireNoReservedAdds(dir, merged)
    // an overwrite replaces every row, so previously-dropped names
    // hold no live cells anywhere — the tombstones lift with the data
    if (truncate) {
      removeProperties(dir, Seq(DroppedColsProp))
      resetLineage(dir)
      setProperties(dir,
        Map(LineageProp -> UUID.randomUUID().toString))
    }
    commitNewUnlocked(dir, merged, remergeSchema = !truncate)(v =>
      fresh.map(c => LogEntry.add(v, c.file, c.rows, c.stats,
        cols = c.cols)) ++
        txn.map { case (a, tv) => LogEntry.txn(v, a, tv) }.toSeq)
  }

  /** Commit timestamp of each version: the (shared) stamp its entries
    * carry. Oldest version first. */
  def versionTimestamps(dir: String): Seq[(Long, Long)] =
    entries(dir).groupBy(_.version).view
      .mapValues(_.map(_.ts).max).toSeq.sortBy(_._1)

  /** `TIMESTAMP AS OF` resolution: the newest version committed at or
    * before `tsMillis` (Delta semantics). Fails loudly when the
    * timestamp predates the table. */
  def versionAtTimestamp(dir: String, tsMillis: Long): Long = {
    val vts = versionTimestamps(dir)
    vts.filter(_._2 <= tsMillis).map(_._1).maxOption.getOrElse(
      throw new IllegalArgumentException(
        s"timestamp $tsMillis predates every commit of $dir " +
          s"(earliest: ${vts.headOption.map(_._2).getOrElse(-1L)})"))
  }

  /** RESTORE to a historical version (Delta `RESTORE TABLE ... VERSION
    * AS OF` in miniature): publish a NEW version whose live set equals
    * the target snapshot — files added since the target are removed,
    * files the target held that were since retired are re-added. The
    * restore is itself an ordinary commit: history is preserved (the
    * mistaken writes stay time-travelable — restore is not an undo of
    * the log, it is a redo of an old state), and re-added files carry
    * dataChange=true so incremental consumers see the restored rows.
    * Requires the target's files to still exist (an expire-history
    * vacuum retires them — the documented trade). Returns
    * (filesRemoved, filesReAdded). */
  def restore(dir: String, toVersion: Long): (Int, Int) = synchronized {
    val cur = entriesAsOf(dir, Long.MaxValue)
    val target = entriesAsOf(dir, toVersion)
    val curSet = cur.map(_.file).toSet
    val tgtSet = target.map(_.file).toSet
    target.filterNot(e => curSet(e.file)).foreach { e =>
      require(new File(dir, e.file).exists(),
        s"cannot restore to version $toVersion: ${e.file} was vacuumed")
    }
    val toRemove = cur.filterNot(e => tgtSet(e.file))
    val toReadd = target.filterNot(e => curSet(e.file))
    // deletion-vector state is part of the snapshot: a file live in
    // both versions whose DV differs gets a dv entry resetting it to
    // the target's descriptor (re-adds restore theirs through the
    // annotated stats they carry). Target DV files must still exist.
    val curDv = cur.map(e => e.file -> dvOf(e)).toMap
    val dvFixes = target.filter(e => curSet(e.file))
      .filter(e => dvOf(e) != curDv(e.file))
    (toReadd ++ dvFixes).foreach(e => dvOf(e).foreach { case (f, _) =>
      require(new File(dir, f).exists(),
        s"cannot restore to version $toVersion: DV $f was vacuumed")
    })
    // restoring to the current state commits nothing
    if (toRemove.nonEmpty || toReadd.nonEmpty || dvFixes.nonEmpty)
      commitNew(dir, storedSchema(dir).getOrElse(StructType(Nil)))(v =>
        toRemove.map(e => LogEntry.remove(v, e.file)) ++
          toReadd.map(e => LogEntry.add(v, e.file, e.rows, e.stats,
            dataChange = true, cols = e.cols)) ++
          dvFixes.map(e => LogEntry.dv(v, e.file, dvOf(e))))
    (toRemove.size, toReadd.size)
  }

  /** Atomic copy-on-write group replace — the commit shape of a SQL
    * UPDATE / MERGE INTO rewritten through Spark's group-based
    * row-level-operation machinery: ONE version removes every file the
    * operation's scan planned and adds the rewritten parts. Readers
    * either see the whole pre-op snapshot or the whole post-op one
    * (snapshot isolation holds across the rewrite), and the pre-op
    * version stays time-travelable. Zero-row part files (a writer task
    * that received no rows) are dropped and deleted rather than
    * published. */
  def replaceFiles(dir: String, retired: Seq[String],
      fresh: Seq[GraftLogCommit], schema: StructType): Unit = synchronized {
    requireNoWap("row-level rewrite")
    requireNoBranch("row-level rewrite")
    val (kept, empty) = fresh.partition(_.rows > 0L)
    empty.foreach(c => new File(dir, c.file).delete())
    if (retired.isEmpty && kept.isEmpty) return
    val merged =
      storedSchema(dir).map(mergeSchemas(_, schema)).getOrElse(schema)
    requireNoReservedAdds(dir, merged)
    commitNew(dir, merged)(v =>
      retired.map(f => LogEntry.remove(v, f)) ++
        kept.map(c => LogEntry.add(v, c.file, c.rows, c.stats,
          cols = c.cols)))
  }
}

class GraftLogTable(dir: String, writeSchema: StructType,
    asOfVersion: Long = Long.MaxValue,
    declaredPartitionCol: Option[String] = None,
    typedCdf: Boolean = false)
    extends Table with SupportsRead with SupportsWrite
    with SupportsDelete with SupportsRowLevelOperations
    with SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.TruncatableTable {
  override def name(): String = s"graft_log($dir)"

  /** SQL `TRUNCATE TABLE`: the unconditional DELETE — one metadata
    * commit removes every live file (no data I/O), history stays
    * time-travelable, and a CDF-enabled table publishes every
    * vanished row as a typed delete in the same commit, so downstream
    * replicas follow the wipe instead of silently diverging. */
  override def truncateTable(): Boolean = {
    GraftLog.deleteWhere(
      org.apache.spark.sql.SparkSession.active, dir, Array.empty)
    true
  }

  /** Stored TBLPROPERTIES (SHOW TBLPROPERTIES / DESCRIBE EXTENDED
    * read these; SET/UNSET TBLPROPERTIES writes through alterTable). */
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    GraftLog.propertiesOf(dir).foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** The table's identity partition column: declared on this write
    * (`option("partitionCol", c)` / DDL `PARTITIONED BY (c)`), else
    * whatever the table already persists. */
  private def partitionCol: Option[String] =
    declaredPartitionCol.orElse(GraftLog.partitionColOf(dir))

  override def partitioning(): Array[Transform] =
    partitionCol.map(c => Expressions.identity(c)).toArray

  /** Stored CHECK constraints, reported ENFORCED — Spark's write path
    * then injects the violation check into every INSERT/UPDATE/MERGE
    * plan against this table (the engine enforces; the format only
    * remembers). */
  override def constraints():
      Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    GraftLog.constraintsOf(dir).map { case (n, sql) =>
      org.apache.spark.sql.connector.catalog.constraints.Constraint
        .check(n).predicateSql(sql).enforced(true).build()
        : org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray

  /** `_file` metadata column (Delta `_metadata.file_path` / Iceberg
    * `_file` in miniature): the manifest part file each row was read
    * from, served by the reader from its partition — no I/O, no
    * storage. Row-level operations also require it, which keeps their
    * write plans on Spark's metadata-projection path (the operation
    * discriminator column is stripped before rows reach the writer). */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_file"
      override def dataType(): DataType = StringType
      // nullable: a MERGE's not-matched inserts carry no source file
      override def isNullable(): Boolean = true
      override def comment(): String =
        "manifest part file this row was read from"
    },
    new MetadataColumn {
      // physical row ordinal within `_file` — (_file, _pos) is the
      // row's stable address, the coordinate a deletion vector records
      // (Iceberg's position delete / Delta's DV row index)
      override def name(): String = "_pos"
      override def dataType(): DataType = LongType
      override def isNullable(): Boolean = true
      override def comment(): String =
        "row ordinal within its part file"
    })

  /** SQL `UPDATE` / `MERGE INTO` (and the DELETEs `canDeleteWhere`
    * rejects) land here: Spark rewrites the command into a group-based
    * copy-on-write `ReplaceData` plan over this operation. Convertible
    * DELETEs still take the cheaper metadata path — Spark's
    * `OptimizeMetadataOnlyDeleteFromTable` converts the rewrite back
    * through [[SupportsDelete]] when the predicate allows. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new GraftLogRowLevelOperation(dir, schema(), info.command())

  // SQL `DELETE FROM t WHERE ...` — stats-targeted copy-on-write by
  // default; `SET spark.graft.log.deleteMode=mor` switches to the
  // deletion-vector path (metadata-only commit, zero file rewrites,
  // automatic COW fallback past the position cap — see
  // GraftLog.deleteWhereMoR). Inexpressible predicates reject at
  // analysis via canDeleteWhere. An unconditional `DELETE FROM t`
  // stays the pure-metadata retire-every-file commit either way.
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(GraftLog.convertible)
  override def deleteWhere(filters: Array[Filter]): Unit = {
    val s = org.apache.spark.sql.SparkSession.active
    val mor = s.conf.getOption("spark.graft.log.deleteMode")
      .exists(_.trim.equalsIgnoreCase("mor"))
    val unconditional =
      filters.isEmpty || filters.forall(_.isInstanceOf[AlwaysTrue])
    if (mor && !unconditional) {
      GraftLog.deleteWhereMoR(s, dir, filters); ()
    } else GraftLog.deleteWhere(s, dir, filters)
  }
  override def schema(): StructType = {
    // Reads see the stored schema; a write whose frame carries extra
    // columns sees the stored⊕incoming merge, so Spark's append
    // validation admits the widened frame and the commit then persists
    // the same merge (additive evolution; type changes reject loudly).
    val stored = GraftLog.storedSchema(dir)
    val base =
      if (writeSchema.isEmpty) stored.getOrElse(writeSchema)
      else stored.map(GraftLog.mergeSchemas(_, writeSchema))
        .getOrElse(writeSchema)
    // typed change feed: the relation carries _change_type; rows from
    // versions without CDC sidecars read NULL there (pure inserts —
    // the reader helper coalesces)
    if (typedCdf)
      StructType(base.fields :+ StructField(GraftLog.ChangeTypeCol,
        StringType, nullable = true))
    else base
  }
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(new File(dir, GraftLog.SchemaFile).exists(),
      s"graft-log table not found at $dir (no ${GraftLog.SchemaFile}; " +
        "reads never create tables — check the path)")
    // numeric = a version; anything else = a named ref (tag)
    val hi = Option(options.get("asOfVersion"))
      .map(GraftLog.resolveVersion(dir, _)).getOrElse(asOfVersion)
    // change feed: rows appended in (changesFromVersion, hi]
    val lo = Option(options.get("changesFromVersion")).map(_.toLong)
      .getOrElse(-1L)
    // maintenance-internal: restrict the scan to named manifest files
    // (copy-on-write MERGE/DELETE read exactly the files they rewrite)
    val pick = Option(options.get("pickFiles"))
      .map(_.split(",").filter(_.nonEmpty).toSet)
    // streaming admission control: at most this many versions per
    // micro-batch (throttled backfill)
    val maxV = Option(options.get("maxVersionsPerBatch")).map(_.toLong)
    // write-audit-publish AUDIT read: with a wap id (read option, or
    // the session conf the staging write used), the scan folds the
    // staged-but-unpublished entries in on top of the snapshot — the
    // view quality checks validate before a publish. Batch reads
    // only; the change feed keeps its committed-versions contract.
    val overlay = Option(options.get("wapId"))
      .orElse(GraftLog.activeWapId())
      .filter(_ => lo < 0L)
      .map(GraftLog.stagedEntries(dir, _)).getOrElse(Seq.empty)
    // Branch read: plan the main snapshot AT THE FORK plus the
    // branch's commits as an overlay — main commits after the fork
    // never leak in, and the change feed keeps its committed-versions
    // contract (branch reads are batch snapshots only). A session
    // cannot be mid-audit and on a branch at once — loud.
    val branch = Option(options.get("branch"))
      .orElse(GraftLog.activeBranch())
      .filter(_ => lo < 0L)
    branch.foreach { b =>
      require(overlay.isEmpty,
        s"cannot read branch '$b' with a WAP audit overlay active — " +
          "unset one of the two")
      require(Option(options.get("asOfVersion")).isEmpty,
        s"cannot combine VERSION AS OF with branch '$b' — a branch " +
          "read is pinned at its fork")
    }
    val (effHi, effOverlay) = branch match {
      case Some(b) =>
        (GraftLog.branches(dir).getOrElse(b,
          throw new IllegalArgumentException(
            s"no branch '$b' at $dir")),
          GraftLog.branchEntries(dir, b).filter(_.isAdd))
      case None => (hi, overlay)
    }
    if (typedCdf) require(
      Option(options.get("changesFromVersion")).isDefined,
      "readChangeFeed=true needs changesFromVersion — a typed feed " +
        "is a span of changes, not a snapshot (-1 = from the origin)")
    new GraftLogScanBuilder(dir, schema(), effHi, lo, pick, maxV,
      stagedOverlay = effOverlay, typedCdf = typedCdf)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // A write to a partitioned table MUST carry the partition column:
    // silently dropping it would commit record-less files that disable
    // KeyGrouped scan grouping for the whole table (and the next
    // compaction would then merge every partition into one file).
    // Loud at plan time, like the append-redeclaration check below.
    partitionCol.foreach(c =>
      require(info.schema().fieldNames.contains(c),
        s"write to table at $dir partitioned by $c must include the " +
          s"partition column (got ${info.schema().fieldNames.mkString(", ")})"))
    // Delta-style idempotent-writer options: a write carrying
    // txnAppId + txnVersion commits its data AND the marker in one
    // version; a replay of the same (appId, version) is a no-op.
    val txn = Option(info.options.get("txnAppId")).map { app =>
      val v = Option(info.options.get("txnVersion")).getOrElse(
        throw new IllegalArgumentException(
          s"write option txnAppId='$app' requires txnVersion"))
      (app, v.toLong)
    }
    new GraftLogWriteBuilder(dir, info.schema(), truncate = false,
      partitionCol = partitionCol, txn = txn)
  }
}

/** Group-based copy-on-write row-level operation [EXT] — what Spark's
  * analyzer asks a table for when it plans SQL `UPDATE`, `MERGE INTO`,
  * or a `DELETE` whose predicate the metadata path can't express. The
  * contract (the one Iceberg implements for its copy-on-write mode):
  *
  *  - Spark pushes the command's condition into [[newScanBuilder]]'s
  *    scan as a GROUP filter: the connector may skip whole files it
  *    can prove unaffected, but must return every row of each kept
  *    file — Spark re-applies the condition row-wise inside the
  *    `ReplaceData` plan and writes back kept files in full (updated
  *    rows updated, untouched rows copied). `GraftLogScan`'s
  *    residual-only pushFilters contract is exactly this: skipping is
  *    file-conservative, rows are never dropped by the reader.
  *  - The operation instance bridges scan and write: the files the
  *    scan PLANNED are the groups the write's commit must replace.
  *    [[GraftLog.replaceFiles]] publishes remove(planned) +
  *    add(rewritten) as ONE atomic version, so the manifest stats
  *    bound UPDATE write amplification the same way they bound the
  *    API-level merge: files whose [min, max] refute the condition
  *    never rewrite.
  *
  * At 100 TB this is the difference between an UPDATE that rewrites a
  * table and one that rewrites the touched key range — and because the
  * rewrite is an ordinary commit, time travel, CDF exclusion of
  * removed files, and snapshot isolation all hold across it. */
class GraftLogRowLevelOperation(dir: String, tableSchema: StructType,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {
  /** Files planned by the operation's scan — captured at scan build
    * time on the driver, consumed by the write's commit. */
  @volatile private var scannedFiles: Seq[String] = Seq.empty

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String =
    s"graft-log copy-on-write $cmd"

  /** Requiring `_file` keeps Spark's ReplaceData write on the
    * metadata-projection path: without at least one metadata
    * attribute, Spark 4's group-based rewrite hands the writer RAW
    * rows still carrying the `__row_operation` discriminator column —
    * with it, rows are projected back to the data schema before
    * reaching the writer (the same reason Iceberg's copy-on-write
    * operation requires `_file`). */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val op = this
    // the plan hook re-records the group set AFTER runtime group
    // filtering has narrowed it — the commit must replace exactly the
    // files the write actually read and rewrote
    new GraftLogScanBuilder(dir, tableSchema, Long.MaxValue, -1L,
      cowPlanHook = Some(fs => op.scannedFiles = fs)) {
      // defensive: a metadata-aggregate scan would bypass the file
      // bookkeeping the COW commit depends on (Spark never pushes
      // aggregates into a ReplaceData scan, but the invariant is
      // load-bearing enough to enforce locally)
      override def supportCompletePushDown(
          agg: Aggregation): Boolean = false
      override def pushAggregation(agg: Aggregation): Boolean = false
      override def build(): Scan = super.build() match {
        case s: GraftLogScan =>
          op.scannedFiles = s.plannedFileNames
          s
        case other => throw new IllegalStateException(
          s"row-level operation scan must be a GraftLogScan, got $other")
      }
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          // a partitioned table's COW rewrite keeps routing rows per
          // value, so the rewritten files keep their partition record
          // (UPDATE/MERGE do not forfeit storage-partitioned joins)
          private val pcol = GraftLog.partitionColOf(dir)
            .filter(info.schema().fieldNames.contains)
          override def createBatchWriterFactory(
              pinfo: PhysicalWriteInfo): DataWriterFactory =
            new GraftLogWriterFactory(dir, info.schema(), pcol)
          override def commit(
              messages: Array[WriterCommitMessage]): Unit =
            GraftLog.replaceFiles(dir, scannedFiles,
              GraftLogCommit.all(messages), info.schema())
          override def abort(
              messages: Array[WriterCommitMessage]): Unit =
            GraftLogCommit.all(messages).foreach(c =>
              new File(dir, c.file).delete())
        }
      }
    }
}

/** Scan builder with the two pushdowns that make a table format usable
  * at scale: comparison filters (consumed for manifest-stats file
  * skipping, then returned to Spark as residuals — skipping is
  * file-conservative, not row-exact) and required-column pruning (the
  * reader decodes only projected cells). */
class GraftLogScanBuilder(dir: String, tableSchema: StructType,
    asOfVersion: Long, changesFromVersion: Long,
    pickFiles: Option[Set[String]] = None,
    maxVersionsPerBatch: Option[Long] = None,
    cowPlanHook: Option[Seq[String] => Unit] = None,
    stagedOverlay: Seq[LogEntry] = Seq.empty,
    typedCdf: Boolean = false) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = tableSchema
  private var metaCount: Boolean = false
  private var limit: Option[Int] = None

  /** LIMIT pushdown: the scan plans only a PREFIX of the live files
    * whose manifest row counts cover the limit — a `LIMIT 10` against
    * a million-file table opens one file. Spark only offers the limit
    * when no filter sits above the scan, and keeps applying the exact
    * row cut itself (partial push), so over-planning is impossible
    * and under-planning is prevented by requiring known row counts. */
  override def pushLimit(n: Int): Boolean = {
    limit = Some(n)
    true
  }
  override def isPartiallyPushed(): Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GraftLogScan.usableForSkipping(tableSchema, _))
    filters // all residual: files are skipped, rows are Spark's job
  }
  override def pushedFilters(): Array[Filter] = pushed
  // An empty required schema (count-star) is fine: the reader streams
  // lines and emits zero-column rows without parsing a single cell.
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Metadata-only aggregates: every manifest `add` carries its file's
    * exact row count and numeric min/max, so an unfiltered, ungrouped
    * COUNT(*) / MIN(col) / MAX(col) is a fold over a few manifest
    * entries — zero data files opened, the same planning-time answer
    * Delta/Iceberg serve from their stats. Only complete pushdown,
    * only when every live entry carries the needed stat (legacy
    * stat-less manifests scan; an all-NULL file has no min/max entry
    * for that column and correctly blocks the pushdown — its NULLs
    * don't change MIN/MAX only when other files have values, which
    * the manifest can't prove), and only with no residual filters
    * (Spark won't offer the aggregate otherwise; the guard keeps the
    * invariant local). */
  // One manifest read serves supportCompletePushDown, pushAggregation,
  // and the built scan — the metadata path must not parse the manifest
  // three times per planned query.
  private lazy val liveForMeta =
    GraftLogCountScan.liveEntries(dir, asOfVersion, changesFromVersion)

  private def metaAnswerable(agg: Aggregation): Boolean = {
    // the typed change feed's rows are the CDC sidecar rows, not the
    // add listing liveForMeta folds — a pushed COUNT/MIN/MAX would
    // answer from the wrong population; stand down to the real scan
    if (typedCdf) return false
    val live = liveForMeta
    def statCol(f: AggregateFunc): Option[String] = f match {
      case m: Min => m.column() match {
        case fr: NamedReference if fr.fieldNames.length == 1 =>
          Some(fr.fieldNames()(0))
        case _ => None
      }
      case m: Max => m.column() match {
        case fr: NamedReference if fr.fieldNames.length == 1 =>
          Some(fr.fieldNames()(0))
        case _ => None
      }
      case _ => None
    }
    // GROUP BY is answerable from the manifest in exactly one shape:
    // grouping on the table's identity partition column when every
    // live file carries its partition record — each file belongs to
    // one group, so per-group COUNT/MIN/MAX fold over that group's
    // manifest entries, never opening a file. The partition-level
    // statistics query every warehouse dashboard runs, served from
    // the catalog.
    val groupOk = agg.groupByExpressions.toSeq match {
      case Seq() => true
      case Seq(fr: NamedReference) if fr.fieldNames.length == 1 =>
        GraftLog.partitionColOf(dir).contains(fr.fieldNames()(0)) &&
          live.nonEmpty && live.forall(e =>
            GraftLogPartValue.of(e, fr.fieldNames()(0)).isDefined)
      case _ => false
    }
    pushed.isEmpty && pickFiles.isEmpty && groupOk &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar =>
          live.forall(_.rows >= 0L)
        // a deletion vector may have removed the extremum, so manifest
        // min/max are stale on DV'd files: COUNT stays exact
        // (rows - dv cardinality); MIN/MAX falls back to the scan
        case f @ (_: Min | _: Max) =>
          live.forall(e => GraftLog.dvOf(e).isEmpty) &&
          statCol(f).exists(c =>
          tableSchema.fields.exists(tf => tf.name == c && (tf.dataType match {
            case LongType | IntegerType | DoubleType => true
            case _ => false
          })) && live.nonEmpty && live.forall(e =>
            // pre-rename files key the stat under the former name
            e.stats.get(GraftLog.fileLocalName(tableSchema, e, c))
              .exists {
            // NaN/Infinity stats (a NaN first row freezes the writer's
            // min/max compare) must fall back to the real scan, not
            // crash planning in the BigDecimal fold below
            case (mn, mx) => decimalParseable(mn) && decimalParseable(mx)
          }))
        case _ => false
      }
  }

  private def decimalParseable(s: String): Boolean =
    try { new java.math.BigDecimal(s); true }
    catch { case _: NumberFormatException => false }
  // An audit (write-audit-publish) read folds STAGED entries into the
  // scan; the metadata-aggregate fast path reasons only about
  // committed state, so it stands down for the (rare) audit read
  // rather than answer from half the data.
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    stagedOverlay.isEmpty && metaAnswerable(agg)
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (stagedOverlay.isEmpty && metaAnswerable(agg)) {
      metaAgg = Some(agg); true
    } else false
  }
  private var metaAgg: Option[Aggregation] = None

  override def build(): Scan = metaAgg match {
    case Some(agg) =>
      new GraftLogCountScan(dir, tableSchema, agg, liveForMeta)
    case None => new GraftLogScan(dir, tableSchema,
      required, pushed, asOfVersion, changesFromVersion, pickFiles,
      limit, maxVersionsPerBatch, cowPlanHook, stagedOverlay,
      typedCdf = typedCdf)
  }
}

/** The scan a pushed-down metadata aggregate builds: one partition,
  * one row, each value folded from the manifest (COUNT(*) = sum of
  * row counts, MIN/MAX = fold of per-file stats in the column's own
  * type) — the table is never touched. `description` reports
  * `metaCount=` for the plan asserts. */
class GraftLogCountScan(dir: String, tableSchema: StructType,
    agg: Aggregation, live: Seq[LogEntry]) extends Scan with Batch {

  /** GROUP BY on the identity partition column (the only grouping the
    * builder admits): one output row per partition value, each folded
    * over that value's manifest entries alone. */
  private val groupCol: Option[String] =
    agg.groupByExpressions.toSeq match {
      case Seq(fr: NamedReference) => Some(fr.fieldNames()(0))
      case _ => None
    }

  private def colOf(f: AggregateFunc): String = {
    val fr = (f match {
      case m: Min => m.column()
      case m: Max => m.column()
      case other => throw new IllegalStateException(s"unexpected $other")
    }).asInstanceOf[NamedReference]
    fr.fieldNames()(0)
  }
  private def dtypeOf(c: String): DataType =
    tableSchema.fields.find(_.name == c).get.dataType
  private def asValue(c: String, s: String): Any = dtypeOf(c) match {
    case LongType => s.toLong
    case IntegerType => s.toInt
    case DoubleType => s.toDouble
    case other => throw new IllegalStateException(s"no stats for $other")
  }
  private def fold(entries: Seq[LogEntry], c: String,
      pickMin: Boolean): Any = {
    val vals = entries.map { e =>
      // pre-rename files key the stat under the former name
      val st = e.stats(GraftLog.fileLocalName(tableSchema, e, c))
      new java.math.BigDecimal(if (pickMin) st._1 else st._2)
    }
    val best = if (pickMin) vals.min else vals.max
    asValue(c, best.toPlainString)
  }
  private def foldAll(entries: Seq[LogEntry]): Array[Any] =
    agg.aggregateExpressions.map {
      case _: CountStar =>
        entries.map(GraftLog.effectiveRows).sum: Any
      case m: Min => fold(entries, colOf(m), pickMin = true)
      case m: Max => fold(entries, colOf(m), pickMin = false)
      case other => throw new IllegalStateException(s"unexpected $other")
    }
  private val resultRows: Seq[Array[Any]] = groupCol match {
    case None => Seq(foldAll(live))
    case Some(c) =>
      live.groupBy(e => GraftLogPartValue.of(e, c).get).toSeq
        .map { case (v, es) => (v +: foldAll(es)).toArray }
  }
  // group columns lead the pushed-aggregate output schema (the DSv2
  // complete-pushdown convention)
  override def readSchema(): StructType = StructType(
    groupCol.map(c =>
      StructField(c, dtypeOf(c), nullable = true)).toSeq ++
    agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) =>
        StructField(s"agg_$i", LongType, nullable = false)
      case (f @ (_: Min | _: Max), i) =>
        StructField(s"agg_$i", dtypeOf(colOf(f)), nullable = false)
      case (other, _) =>
        throw new IllegalStateException(s"unexpected $other")
    })
  override def toBatch: Batch = this
  override def description(): String = groupCol match {
    case None =>
      s"graft_log $dir metaCount=${resultRows.head.mkString("|")} " +
        "files=0/0 (manifest-only aggregate)"
    case Some(c) =>
      s"graft_log $dir metaGroups=${resultRows.size} by=$c files=0/0 " +
        "(manifest-only grouped aggregate)"
  }
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftLogCountPartition(resultRows))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val rows = p.asInstanceOf[GraftLogCountPartition].rows
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.size }
          override def get(): InternalRow =
            new GenericInternalRow(rows(i))
          override def close(): Unit = ()
        }
    }
}

object GraftLogCountScan {
  def liveEntries(dir: String, asOfVersion: Long,
      changesFromVersion: Long): Seq[LogEntry] =
    if (changesFromVersion >= 0L) {
      // same horizon guard as the row-scan feed path: a COUNT pushed
      // down to manifest arithmetic over a partly-expired span would
      // otherwise silently count only the surviving tail
      GraftLog.requireSpanReplayable(dir, changesFromVersion)
      GraftLog.changedEntriesBetween(dir, changesFromVersion, asOfVersion)
    } else GraftLog.entriesAsOf(dir, asOfVersion)
}

case class GraftLogCountPartition(rows: Seq[Array[Any]])
    extends InputPartition

/** Micro-batch writes through the same part-file + manifest protocol;
  * `commit(epochId, ...)` is idempotent per epoch, so a replayed batch
  * after restart publishes nothing twice. */
class GraftLogStreamingWrite(dir: String, schema: StructType,
    partitionCol: Option[String] = None)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new StreamingDataWriterFactory {
      private val inner = new GraftLogWriterFactory(dir, schema,
        partitionCol)
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] =
        inner.createWriter(partitionId, taskId)
    }
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    // a streaming sink's epoch ledger is mainline-only: a branch has
    // no epoch store, so committing here mid-branch would silently
    // write to MAIN against the session's declared intent — loud
    GraftLog.requireNoBranch("streaming epoch commit")
    partitionCol.foreach(GraftLog.setPartitionCol(dir, _))
    GraftLog.publishEpoch(dir, epochId,
      GraftLogCommit.all(messages), schema)
  }
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    // same post-publish-throw guard as the batch abort: epoch commits
    // go through the identical hard-link CAS tail
    val live =
      try GraftLog.referencedFiles(dir)
      // NonFatal only: swallowing OOM/interrupt here would clear the
      // thread's interrupt status and hide a dying JVM
      catch { case scala.util.control.NonFatal(_) => return }
    GraftLogCommit.all(messages).filterNot(c => live.contains(c.file))
      .foreach(c => new File(dir, c.file).delete())
  }
}

case class GraftLogCommit(file: String, rows: Long,
    stats: Map[String, (String, String)] = Map.empty,
    cols: Seq[String] = Seq.empty)
    extends WriterCommitMessage

/** A partitioned writer task commits SEVERAL files (one per partition
  * value it saw); an unpartitioned task commits one. */
case class GraftLogTaskCommit(files: Seq[GraftLogCommit])
    extends WriterCommitMessage

object GraftLogCommit {
  /** Every file commit in a message batch, both shapes. */
  def all(messages: Array[WriterCommitMessage]): Seq[GraftLogCommit] =
    messages.toSeq.flatMap {
      case c: GraftLogCommit => Seq(c)
      case t: GraftLogTaskCommit => t.files
      case _ => Seq.empty
    }
}

class GraftLogWriteBuilder(dir: String, schema: StructType,
    truncate: Boolean, partitionCol: Option[String] = None,
    txn: Option[(String, Long)] = None)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new GraftLogWriteBuilder(dir, schema, truncate = true, partitionCol,
      txn)
  override def build(): Write = {
    // a conflicting partition re-declaration on an APPEND fails at
    // plan time, before any part file is written (overwrite resets
    // lineage and may relayout)
    if (!truncate)
      GraftLog.partitionColOf(dir).foreach(stored =>
        require(partitionCol.forall(_ == stored),
          s"table at $dir is partitioned by $stored; an append " +
            s"cannot redeclare partitionCol=${partitionCol.get} " +
            "(overwrite the table to relayout)"))
    buildWrite()
  }
  private def buildWrite(): Write = partitionCol match {
    // Partitioned table: ask Spark to CLUSTER the incoming rows by the
    // partition column before they reach the writers — each value then
    // lands in one task and the per-value file count stays bounded by
    // the value count, not value count × task count (the same
    // requirement Iceberg's write distribution mode 'hash' declares).
    case Some(c) => new Write with RequiresDistributionAndOrdering {
      override def requiredDistribution(): Distribution =
        Distributions.clustered(Array(Expressions.identity(c)))
      override def requiredOrdering():
          Array[org.apache.spark.sql.connector.expressions.SortOrder] =
        Array.empty
      override def toBatch: BatchWrite = new GraftLogBatchWrite(
        dir, schema, truncate, partitionCol, txn)
      override def toStreaming: StreamingWrite =
        new GraftLogStreamingWrite(dir, schema, partitionCol)
    }
    case None => new Write {
      override def toBatch: BatchWrite = new GraftLogBatchWrite(
        dir, schema, truncate, partitionCol, txn)
      override def toStreaming: StreamingWrite =
        new GraftLogStreamingWrite(dir, schema, partitionCol)
    }
  }
}

class GraftLogBatchWrite(dir: String, schema: StructType,
    truncate: Boolean, partitionCol: Option[String] = None,
    txn: Option[(String, Long)] = None)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftLogWriterFactory(dir, schema, partitionCol)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // write-audit-publish: with a WAP id set on the session, an
    // APPEND stages instead of committing (part files written,
    // entries parked in the `_staged.<id>` side file — invisible
    // until `CALL system.publish_staged`). An overwrite cannot stage
    // (truncation is a visible lineage reset) — loud, not silent.
    val branch = GraftLog.activeBranch()
    branch.foreach(b => require(GraftLog.activeWapId().isEmpty,
      s"a session cannot write with both a WAP id and branch '$b' " +
        "set — unset one"))
    // txn identity composes with NEITHER staging nor branching: the
    // idempotence check reads MAINLINE markers, and a staged/branched
    // replay would silently skip or double-commit at publish time
    txn.foreach { case (a, _) =>
      require(GraftLog.activeWapId().isEmpty && branch.isEmpty,
        s"txnAppId='$a' cannot combine with a WAP id or branch — " +
          "idempotent appends are a mainline contract") }
    GraftLog.activeWapId() match {
      case Some(id) if !truncate =>
        // the partition DECLARATION (layout metadata, no rows) still
        // persists — entries staged with `#part` records must match
        // the declaration readers resolve after publish
        partitionCol.foreach(
          GraftLog.setPartitionCol(dir, _, allowChange = false))
        GraftLog.stageAppend(dir, id, GraftLogCommit.all(messages),
          schema)
      case Some(_) => GraftLog.requireNoWap("overwrite")
      case None if branch.isDefined && !truncate =>
        partitionCol.foreach(
          GraftLog.setPartitionCol(dir, _, allowChange = false))
        GraftLog.appendToBranch(dir, branch.get,
          GraftLogCommit.all(messages), schema)
      case None if branch.isDefined =>
        GraftLog.requireNoBranch("overwrite")
      case None =>
        // idempotent replay: this (appId, version) already committed
        // — discard the freshly written (uncommitted) part files
        // instead of double-appending the micro-batch
        if (txn.exists { case (a, v) =>
            GraftLog.lastTxnVersion(dir, a) >= v }) {
          GraftLogCommit.all(messages).foreach(c =>
            new File(dir, c.file).delete())
        } else {
          // persist the partition declaration with the first
          // partitioned commit, so readers (and later writers) resolve
          // it from the table; an overwrite resets lineage and may
          // redeclare a different column
          partitionCol.foreach(
            GraftLog.setPartitionCol(dir, _, allowChange = truncate))
          GraftLog.append(dir, GraftLogCommit.all(messages), schema,
            truncate, txn)
        }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // commit() can throw AFTER its version is already published (the
    // post-link tail) — delete only files no log structure references;
    // an unreadable log proves nothing, so keep the orphans (invisible
    // either way) rather than risk tearing a committed snapshot
    val live =
      try GraftLog.referencedFiles(dir)
      // NonFatal only: swallowing OOM/interrupt here would clear the
      // thread's interrupt status and hide a dying JVM
      catch { case scala.util.control.NonFatal(_) => return }
    GraftLogCommit.all(messages).filterNot(c => live.contains(c.file))
      .foreach(c => new File(dir, c.file).delete())
  }
}

class GraftLogWriterFactory(dir: String, schema: StructType,
    partitionCol: Option[String] = None)
    extends DataWriterFactory {
  /** Open per-value part files a single writer task may hold. */
  private val MaxOpenPartitions = 1000

  /** Block size for the gcol payload — resolved ONCE, driver-side, at
    * factory construction (the factory ships serialized to executors,
    * which have no session). Conf'able so probes/tests can force
    * multi-block files on small fixtures; byte-string values
    * ('4MB', '64k') parse like Spark's own size confs. */
  private val blockChars: Long = GraftLog.byteConf(
    "spark.graft.log.blockBytes", GraftColFile.DefaultBlockChars)

  /** Task-wide cap on raw characters buffered across ALL open part
    * files: a partitioned task may hold up to MaxOpenPartitions gcol
    * writers, each buffering up to a block — unbounded, that is
    * multi-GB of task heap. Past the cap the task flushes the
    * LARGEST open blocks early (smaller blocks, same correctness)
    * until usage halves. */
  private val taskBufferChars: Long = GraftLog.byteConf(
    "spark.graft.log.taskBufferBytes", 64L << 20)

  /** One part file in flight: gcol block writer + per-column stats +
    * blooms. The unit a partitioned task keeps one of PER VALUE it
    * sees. */
  private class PartFile(partValue: Option[Any]) {
    val file = s"part-${UUID.randomUUID()}${GraftColFile.Extension}"
    private val out = {
      GraftLog.ensureDir(dir)
      new GraftColFile.Writer(Paths.get(dir, file),
        schema.fieldNames.toSeq, schema.fields.map(_.dataType).toSeq,
        blockChars)
    }
    private var rows = 0L
    // Per-column min/max, NDV-sized blooms, HLL sketches and null
    // counts — the SAME tracker compaction runs over its rolled
    // outputs, fed the canonical cells as they stream through.
    private val tracker = new GraftLogCellStats(schema)

    def write(row: InternalRow): Unit = {
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
      tracker.add(cells)
      out.write(cells)
      rows += 1
    }

    def finish(): GraftLogCommit = {
      out.finish()
      val fileStats = tracker.finish()
      // the file's identity-partition value, when this is a
      // partitioned write — what the scan groups on for SPJ
      val pvStat = (partitionCol, partValue) match {
        case (Some(c), Some(v)) =>
          Map(GraftLogPartValue.key(c) -> GraftLogPartValue.encode(v))
        case _ => Map.empty[String, (String, String)]
      }
      val rawStat = Map(GraftLog.RawBytesKey ->
        (out.rawChars.toString, "n"))
      GraftLogCommit(file, rows,
        fileStats ++ pvStat ++ rawStat,
        schema.fieldNames.toSeq)
    }

    def abort(): Unit = {
      out.abort()
      new File(dir, file).delete()
    }

    /** Raw chars currently buffered in the open block. */
    def buffered: Long = out.bufferedChars

    /** Flush the open block early — task-memory relief. */
    def relieve(): Unit = out.flushNow()
  }

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val partIdx = partitionCol.map(schema.fieldIndex)
      // Unpartitioned: one eager file per task (the historical shape —
      // zero-row files are filtered or cleaned by commit paths).
      // Partitioned: files open lazily per VALUE; the write
      // distribution clusters values, so a task holds few at once.
      private val single: PartFile =
        if (partIdx.isEmpty) new PartFile(None) else null
      private val perValue =
        scala.collection.mutable.LinkedHashMap.empty[String, PartFile]

      private def routed(row: InternalRow): PartFile = partIdx match {
        case None => single
        case Some(i) =>
          val v: Any = if (row.isNullAt(i)) null
            else schema.fields(i).dataType match {
              case LongType => row.getLong(i)
              case IntegerType => row.getInt(i)
              case DoubleType => row.getDouble(i)
              // copy: the UnsafeRow buffer is reused across rows
              case StringType => row.getUTF8String(i).copy()
              case other => throw new IllegalArgumentException(
                s"graft-log cannot partition by $other")
            }
          val (enc, tag) = GraftLogPartValue.encode(v)
          perValue.getOrElseUpdate(s"$tag:$enc", {
            // identity partitioning is for low-cardinality keys; a
            // high-cardinality column would exhaust file handles (one
            // open gzip stream per value per task) and produce a
            // file-per-row table. Fail loudly instead of degrading —
            // bucket or range-partition such keys.
            require(perValue.size < MaxOpenPartitions,
              s"partition column ${partitionCol.get} exceeded " +
                s"$MaxOpenPartitions distinct values in one writer " +
                "task: identity partitioning needs a low-cardinality " +
                "key (use a bucketed or range layout instead)")
            new PartFile(Some(v))
          })
      }

      // cheap periodic audit of the cross-file buffer total (a per-
      // row exact sum over 1000 open files would cost more than the
      // write); 256 rows of drift is ≤ a few KB per file
      private var sincePoll = 0
      override def write(row: InternalRow): Unit = {
        routed(row).write(row)
        if (partIdx.isDefined) {
          sincePoll += 1
          if (sincePoll >= 256) {
            sincePoll = 0
            var total = 0L
            perValue.values.foreach(total += _.buffered)
            if (total > taskBufferChars) {
              // flush largest-first until usage halves — bounded
              // task heap no matter how many partitions stay open
              val open = perValue.values.toArray
                .sortBy(-_.buffered)
              var k = 0
              while (total > taskBufferChars / 2 && k < open.length) {
                total -= open(k).buffered
                open(k).relieve()
                k += 1
              }
            }
          }
        }
      }
      override def commit(): WriterCommitMessage =
        if (partIdx.isEmpty) single.finish()
        else GraftLogTaskCommit(perValue.values.map(_.finish()).toSeq)
      override def abort(): Unit = {
        if (single != null) single.abort()
        perValue.values.foreach(_.abort())
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
    changesFromVersion: Long = -1L,
    pickFiles: Option[Set[String]] = None,
    limit: Option[Int] = None,
    maxVersionsPerBatch: Option[Long] = None,
    cowPlanHook: Option[Seq[String] => Unit] = None,
    stagedOverlay: Seq[LogEntry] = Seq.empty,
    typedCdf: Boolean = false)
    extends Scan with Batch
    with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
  private val candidates = {
    val base =
      if (typedCdf) {
        GraftLog.requireSpanReplayable(dir, changesFromVersion)
        GraftLog.typedChangedEntriesBetween(dir, changesFromVersion,
          asOfVersion)
      } else if (changesFromVersion >= 0L) {
        GraftLog.requireSpanReplayable(dir, changesFromVersion)
        GraftLog.changedEntriesBetween(dir, changesFromVersion, asOfVersion)
      } else GraftLog.entriesAsOf(dir, asOfVersion) ++ stagedOverlay
    pickFiles.fold(base)(p => base.filter(e => p(e.file)))
  }
  private val files = {
    val kept = candidates.filter(e =>
      pushed.forall(f => GraftLogScan.mayMatch(tableSchema, e, f)))
    limit match {
      // plan the shortest file prefix covering the limit; a file with
      // an unknown row count (-1, legacy) voids the bound from there on
      case Some(n) if kept.forall(_.rows >= 0L) =>
        var acc = 0L
        kept.takeWhile { e =>
          val need = acc < n; acc += GraftLog.effectiveRows(e); need
        }
      case _ => kept
    }
  }

  /** Partition-value file groups, when the planned files can be
    * grouped soundly: the table declares an identity partition column
    * and EVERY planned file carries its value record (a compaction or
    * pre-partitioning file without one disables grouping — correct,
    * just unco-located). Each group becomes ONE input partition whose
    * `partitionKey` is the value, and the scan reports
    * KeyGroupedPartitioning — Catalyst then plans a join of two
    * alike-partitioned tables with ZERO exchange (storage-partitioned
    * join), the co-location contract bucketing provides at 100 TB.
    * The batch path only: a streaming micro-batch reads per file. */
  /** RUNTIME group filtering (Iceberg's bounded-MERGE mechanism): a
    * copy-on-write scan advertises its columns as runtime-filterable;
    * Spark then runs the command's matching-rows subquery first and
    * hands back IN-lists of the touched keys, and only files whose
    * stats admit a touched key rewrite — SQL `MERGE INTO`'s write
    * amplification becomes stats-bounded at runtime the way the
    * API-level merge is bounded at plan time (its condition references
    * the source, so nothing is statically pushable). Inactive on
    * ordinary reads (`filterAttributes` empty): Spark's own dynamic
    * pruning composes poorly with KeyGrouped reporting, and ordinary
    * reads already get static stats skipping. */
  @volatile private var runtimeFilters: Array[Filter] = Array.empty
  /** Exactly ONE attribute: Spark builds the runtime pruning key as
    * the struct of every advertised attribute, and a struct-IN has no
    * V1 form the stats skipper can use. Any single column is SOUND as
    * a group filter — a file whose stats refute every matching-row
    * value of that column cannot contain a matching row — so pick the
    * most skippable one: the partition column, else the first numeric
    * (min/max range stats), else the first string (bloom). */
  override def filterAttributes(): Array[NamedReference] =
    if (cowPlanHook.isEmpty) Array.empty
    else GraftLog.partitionColOf(dir)
      .filter(tableSchema.fieldNames.contains)
      .orElse(tableSchema.fields.collectFirst {
        case f if f.dataType == LongType || f.dataType == IntegerType ||
          f.dataType == DoubleType => f.name
      })
      .orElse(tableSchema.fields.collectFirst {
        case f if f.dataType == StringType => f.name
      })
      .map(c => Array(Expressions.column(c)))
      .getOrElse(Array.empty)
  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    runtimeFilters =
      org.apache.spark.sql.GraftPlanShim.predicatesToV1(predicates)
        .filter(GraftLogScan.usableForSkipping(tableSchema, _))

  private val groups: Option[Seq[(InternalRow, Seq[LogEntry])]] =
    GraftLog.partitionColOf(dir) match {
      case Some(c) if limit.isEmpty && files.nonEmpty &&
          cowPlanHook.isEmpty =>
        val vals = files.map(e => GraftLogPartValue.of(e, c))
        if (vals.exists(_.isEmpty)) None
        else Some(files.zip(vals).groupBy(_._2.get).toSeq
          .map { case (v, fs) =>
            (new GenericInternalRow(Array(v)): InternalRow,
              fs.map(_._1))
          })
      case _ => None
    }

  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    groups match {
      case Some(gs) =>
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(
            Array(Expressions.identity(
              GraftLog.partitionColOf(dir).get)), gs.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(files.size)
    }
  /** The files this scan will read (post stats-skipping) — a row-level
    * operation's commit removes exactly these groups. */
  private[sources] def plannedFileNames: Seq[String] = files.map(_.file)
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_log $dir asOf=$asOfVersion from=$changesFromVersion " +
      s"files=${files.size}/${candidates.size} " +
      groups.fold("")(gs => s"partGroups=${gs.size} ") +
      s"pushed=[${pushed.mkString(", ")}] " +
      s"columns=[${required.fieldNames.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    groups match {
      case Some(gs) => gs.map { case (key, es) =>
        GraftLogGroupPartition(dir, key,
          es.map(e => (e.file, e.cols,
            GraftLog.dvOf(e).map(_._1)))): InputPartition
      }.toArray
      case None =>
        // runtime filters (COW group filtering) narrow the static set
        // here, after Spark's matching-rows subquery has executed
        val planned = files.filter(e => runtimeFilters.forall(f =>
          GraftLogScan.mayMatch(tableSchema, e, f)))
        cowPlanHook.foreach(_(planned.map(_.file)))
        // gcol parts SPLIT into byte ranges (driver-side planning has
        // the session; one stat call per file, same as the stats
        // estimate). DV'd files split too — DV ordinals are global and
        // every block's first ordinal is in the footer. Legacy .tsv.gz
        // parts stay one-task-per-file (gzip is not seekable).
        val splitBytes: Long = GraftLog.byteConf(
          "spark.graft.log.splitBytes",
          GraftLog.byteConf("spark.sql.files.maxPartitionBytes",
            134217728L))
        planned.flatMap { e =>
          val dv = GraftLog.dvOf(e).map(_._1)
          val size =
            if (GraftColFile.isCol(e.file))
              new File(dir, e.file).length()
            else 0L
          if (size > splitBytes) {
            // splits-per-file capped: a degenerate conf must not
            // overflow the Int partition count (negative count would
            // silently plan ZERO partitions for the file) or flood
            // the driver with empty ranges — blocks per file bound
            // the useful split count far below this anyway
            val n = math.min(
              (size + splitBytes - 1) / splitBytes, 1L << 20).toInt
            (0 until n).map(k => GraftLogPartition(dir, e.file,
              e.cols, dv, start = k.toLong * splitBytes,
              length =
                if (k == n - 1) Long.MaxValue - k.toLong * splitBytes
                else splitBytes): InputPartition)
          } else Seq(GraftLogPartition(dir, e.file, e.cols,
            dv): InputPartition)
        }.toArray
    }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory(tableSchema, required, columnar = true,
      blockFilters = pushed)
  // Streaming read: the version log doubles as the stream's offset
  // axis. `changesFromVersion` (when set) seeds the stream past
  // history, the Delta `startingVersion` option.
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftLogMicroBatchStream(dir, tableSchema, required,
      startVersion = changesFromVersion,
      maxVersionsPerBatch = maxVersionsPerBatch,
      typed = typedCdf)

  /** CBO statistics from the manifest (post-skipping): row counts come
    * straight from the entries, bytes from the kept files' on-disk
    * sizes scaled by a gzip-expansion factor. This is what lets
    * Catalyst auto-broadcast a small log table in a join — without it
    * every graft-log join side defaults to "unknown = huge" and pays a
    * shuffle even when one side is a 100-row dimension. Stats shrink
    * with file skipping, so a selective predicate can also flip a plan
    * to broadcast (the same leverage Delta gets from its own stats). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val known = files.forall(_.rows >= 0L)
    private val rowCount =
      files.map(e => math.max(GraftLog.effectiveRows(e), 0L)).sum
    // exact raw size from the writer-stamped manifest stat when
    // present (gcol parts), the on-disk-times-expansion guess only
    // for legacy stat-less parts — CBO's broadcast decision reads
    // this, and "exact" vs "4x guess" flips plans near the threshold
    private val bytes = files.map(e =>
      e.stats.get(GraftLog.RawBytesKey)
        .flatMap(v => scala.util.Try(v._1.toLong).toOption)
        .getOrElse(
          new File(dir, e.file).length() * GraftLogScan.GzipExpansion))
      .sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(bytes, 1L))
    override def numRows(): java.util.OptionalLong =
      if (known) java.util.OptionalLong.of(rowCount)
      else java.util.OptionalLong.empty()
    // Per-column NDV (merged manifest HLL sketches) + exact null
    // counts over the KEPT files — the SPARK-41378 surface CBO's join
    // reorder and selectivity estimation read. Like numRows, these
    // shrink with file skipping, so a selective scan advertises the
    // cardinality of what it will actually produce.
    override def columnStats(): JMap[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      val m = new java.util.HashMap[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      GraftLogNdv.mergedColumnStats(tableSchema, files).foreach {
        case (colName, (ndvOpt, nullsOpt)) =>
          if (ndvOpt.isDefined || nullsOpt.isDefined)
            m.put(Expressions.column(colName),
              new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
                override def distinctCount(): java.util.OptionalLong =
                  ndvOpt.map(java.util.OptionalLong.of)
                    .getOrElse(java.util.OptionalLong.empty())
                override def nullCount(): java.util.OptionalLong =
                  nullsOpt.map(java.util.OptionalLong.of)
                    .getOrElse(java.util.OptionalLong.empty())
              })
      }
      m
    }
  }
}

/** Streaming SOURCE over the version log — the consumption half of the
  * lakehouse streaming story (the sink half is
  * [[GraftLogStreamingWrite]]). Offsets are table versions; a
  * micro-batch (start, end] is exactly the dataChange `add` files
  * committed in that version span — the change-data-feed listing — so
  * an incremental consumer reads each appended row once, never rescans
  * history, and a compaction (dataChange=false) passes through the
  * stream invisibly. Offsets checkpoint as the version number, so a
  * restarted query resumes from the last committed version (the same
  * recovery contract as Delta's streaming source). At 100 TB the
  * per-batch work is bounded by the append rate, not the table size. */
class GraftLogMicroBatchStream(dir: String, tableSchema: StructType,
    required: StructType, startVersion: Long,
    maxVersionsPerBatch: Option[Long] = None,
    typed: Boolean = false)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // Trigger.AvailableNow: pin the target offset at query start so the
  // run drains exactly the versions committed before it began, then
  // stops — concurrent commits land in the next run. The pin carries
  // version AND lineage as one consistent pair — each planning call
  // reads the `_properties` file at most once (not several times per
  // micro-batch on commit-dense streams), and an overwrite racing the
  // reads can never stamp a new-lineage version with the old tag
  // (GraftLog.versionAndLineage re-reads the lineage around the
  // version and retries on mismatch).
  private var pinned: Option[(Long, String)] = None
  override def prepareForTriggerAvailableNow(): Unit =
    pinned = Some(GraftLog.versionAndLineage(dir))
  override def initialOffset(): StreamOffset =
    GraftLogOffset(startVersion,
      pinned.map(_._2).getOrElse(GraftLog.lineageOf(dir)))
  override def latestOffset(): StreamOffset = {
    val (v, lin) = pinned.getOrElse(GraftLog.versionAndLineage(dir))
    GraftLogOffset(v, lin)
  }
  // SupportsAdmissionControl (via SupportsTriggerAvailableNow):
  // option("maxVersionsPerBatch", k) caps each micro-batch at k
  // versions — the throttled-backfill knob (Delta maxFilesPerTrigger):
  // a consumer starting against years of history drains in bounded
  // batches instead of one giant first batch, and AvailableNow keeps
  // scheduling batches until the pinned head is reached. Without the
  // option each batch drains to the head.
  override def latestOffset(start: StreamOffset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): StreamOffset = {
    val (head, lin) =
      pinned.getOrElse(GraftLog.versionAndLineage(dir))
    val s = start.asInstanceOf[GraftLogOffset].version
    GraftLogOffset(maxVersionsPerBatch.fold(head)(k =>
      math.min(head, s + math.max(1L, k))), lin)
  }
  override def deserializeOffset(json: String): StreamOffset =
    GraftLogOffset.parse(json)
  override def commit(end: StreamOffset): Unit = ()
  // Typed mode (`readChangeFeed=true` on readStream — Delta's
  // streaming CDF): each micro-batch is the TYPED change plan for its
  // version span — a version that committed CDC sidecars contributes
  // those (exact per-row change types, deletes and update pre/post
  // images included, never a rewrite's carried rows); a version
  // without sidecars contributes its dataChange adds, whose rows read
  // NULL `_change_type` (pure inserts by construction —
  // [[GraftLog.typedChangesStream]] coalesces). Offsets stay plain
  // versions, so replay after a checkpoint restore re-plans the exact
  // same typed span — the exactly-once contract downstream appliers
  // (replication, CDC merge) rely on.
  override def planInputPartitions(start: StreamOffset,
      end: StreamOffset): Array[InputPartition] = {
    val so = start.asInstanceOf[GraftLogOffset]
    val s = so.version
    val e = end.asInstanceOf[GraftLogOffset].version
    // An offset from a RETIRED lineage cannot resume: the source was
    // overwritten, versions restarted, and draining (s, e] of the new
    // lineage would silently skip its first s versions (Delta's
    // failOnDataLoss contract — restart from a fresh checkpoint or
    // re-seed the consumer). BOTH offsets are checked against the
    // source's CURRENT lineage (one `_properties` read per planning
    // call), not merely against each other: on a checkpoint restore
    // Spark re-plans the last uncommitted batch with start AND end
    // deserialized from the WAL, so after an overwrite the two stale
    // offsets agree with each other while the version files on disk
    // belong to the NEW lineage — an offsets-only comparison would
    // silently drain new-table rows as a continuation of the old
    // stream. The shared GraftLog.guardedMarker is the comparator.
    val lineage = GraftLog.lineageOf(dir)
    if (GraftLog.guardedMarker(s, so.lineage, lineage).isEmpty ||
        GraftLog.guardedMarker(e,
          end.asInstanceOf[GraftLogOffset].lineage, lineage).isEmpty)
      throw new IllegalStateException(
        s"streaming checkpoint for $dir holds offset v$s of a " +
          "RETIRED lineage (the table was overwritten since the " +
          "checkpoint) — the span cannot be replayed; restart the " +
          "query from a fresh checkpoint")
    // a checkpointed offset below the retained horizon cannot replay
    // (expire-log truncated those commits) — fail the query loudly
    // instead of silently serving only the surviving tail
    GraftLog.requireSpanReplayable(dir, s)
    val entries =
      if (typed) GraftLog.typedChangedEntriesBetween(dir, s, e)
      else GraftLog.changedEntriesBetween(dir, s, e)
    entries.map(e => GraftLogPartition(dir, e.file, e.cols)).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory(tableSchema, required)
  override def stop(): Unit = ()
}

/** Streaming offset: a table version PLUS the lineage it belongs to
  * (see [[GraftLog.LineageProp]]) — a version number is meaningless
  * across an overwrite, so a restarted query whose checkpoint
  * predates a source overwrite must fail loudly instead of silently
  * draining a fragment of the new lineage. Legacy checkpoints (plain
  * version JSON) parse with an empty lineage, which equals the tag of
  * any never-overwritten source — so they keep resuming unchanged,
  * and start failing exactly when an overwrite actually happened. */
case class GraftLogOffset(version: Long, lineage: String = "")
    extends StreamOffset {
  override def json(): String =
    if (lineage.isEmpty) version.toString else s"$version@$lineage"
}

object GraftLogOffset {
  def parse(json: String): GraftLogOffset = {
    val i = json.indexOf('@')
    if (i < 0) GraftLogOffset(json.toLong)
    else GraftLogOffset(json.substring(0, i).toLong,
      json.substring(i + 1))
  }
}

object GraftLogScan {
  /** In-memory expansion guess for gzip'd TSV (decompressed bytes per
    * on-disk byte) — statistics need only the right order of
    * magnitude to pick broadcast vs shuffle. */
  val GzipExpansion = 4L

  /** A filter is usable for file skipping when it is a comparison on a
    * stats-bearing (numeric) top-level column, or an equality/IN on a
    * string column (pruned by the per-file bloom, when present). */
  def usableForSkipping(schema: StructType, f: Filter): Boolean = {
    def numeric(name: String): Boolean =
      schema.fields.find(_.name == name).exists(_.dataType match {
        case LongType | IntegerType | DoubleType => true
        case _ => false
      })
    def stringCol(name: String): Boolean =
      schema.fields.find(_.name == name).exists(_.dataType == StringType)
    f match {
      case EqualTo(a, v) => (numeric(a) && v.isInstanceOf[Number]) ||
        (stringCol(a) && v.isInstanceOf[String])
      case GreaterThan(a, v) => numeric(a) && v.isInstanceOf[Number]
      case GreaterThanOrEqual(a, v) => numeric(a) && v.isInstanceOf[Number]
      case LessThan(a, v) => numeric(a) && v.isInstanceOf[Number]
      case LessThanOrEqual(a, v) => numeric(a) && v.isInstanceOf[Number]
      case In(a, vs) => vs.nonEmpty &&
        ((numeric(a) && vs.forall(_.isInstanceOf[Number])) ||
          (stringCol(a) && vs.forall(_.isInstanceOf[String])))
      case _ => false
    }
  }

  /** Conservative range check: false ONLY when the file's [min, max]
    * cannot contain a matching row. Entries without stats always may
    * match (legacy manifests). Comparison in BigDecimal so long stats
    * beyond 2^53 don't lose precision through a double detour. */
  def mayMatch(schema: StructType, e: LogEntry, rawF: Filter): Boolean = {
    // A file written before a RENAME COLUMN keyed its cells, stats,
    // and bloom under the former name — rewrite the filter to the
    // file-LOCAL name first, so old files keep both their data
    // (no false "predates the column" skip) and their pruning.
    // fast path: a schema with no rename trail (the overwhelmingly
    // common case) keeps the zero-allocation filter as-is
    val f = if (!schema.fields.exists(
        _.metadata.contains(GraftLog.FormerlyKey))) rawF
    else {
      def loc(a: String): String = GraftLog.fileLocalName(schema, e, a)
      rawF match {
        case EqualTo(a, v) => EqualTo(loc(a), v)
        case GreaterThan(a, v) => GreaterThan(loc(a), v)
        case GreaterThanOrEqual(a, v) => GreaterThanOrEqual(loc(a), v)
        case LessThan(a, v) => LessThan(loc(a), v)
        case LessThanOrEqual(a, v) => LessThanOrEqual(loc(a), v)
        case In(a, vs) => In(loc(a), vs)
        case other => other
      }
    }
    // NaN/Infinity stats (a NaN first row freezes the writer's
    // min/max compare) or filter values parse to None/true — degrade
    // to may-match, never crash planning
    def range(col: String): Option[(java.math.BigDecimal,
        java.math.BigDecimal)] = GraftLog.decStat(e, col)
    def dec(v: Any): java.math.BigDecimal =
      new java.math.BigDecimal(v.toString)
    // blooms hash the CANONICAL cell text the writer stored — for the
    // schema's admissible types (long/int/double/string) the boxed
    // value's toString IS that encoding, so probes line up bit-exact
    def canonicalCell(v: Any): String = v.toString
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
    // NULL comparison values match nothing (three-valued logic), but
    // deleteWhere routes raw convertible filters here — treat them as
    // may-match rather than NPE in the BigDecimal parse; Spark itself
    // folds such predicates away before pushdown. A non-decimal
    // FILTER VALUE (NaN/Infinity literal) likewise degrades to
    // may-match via the catch below.
    try f match {
      // String equality prunes on the per-file BLOOM (numeric min/max
      // can't see it): definitely-absent values skip the file; an
      // entry without a bloom (legacy, or dropped by compaction)
      // always may match.
      case EqualTo(a, v: String) => GraftLogBloom.mayContain(e, a, v)
      case In(a, vs) if vs.nonEmpty &&
          vs.forall(v => v == null || v.isInstanceOf[String]) =>
        // bulk probe: the file's bloom is deserialized ONCE for the
        // whole IN list, not once per value (a wide IN across a 100 TB
        // table's manifest is values × files hex decodes otherwise)
        val hashes = vs.collect { case v: String =>
          GraftLogBloom.packedHash(v) }
        hashes.nonEmpty && GraftLogBloom.mayContainAny(e, a, hashes)
      case EqualTo(_, null) => true
      case GreaterThan(_, null) | GreaterThanOrEqual(_, null) |
           LessThan(_, null) | LessThanOrEqual(_, null) => true
      // Numeric equality prunes on BOTH the [min, max] range and the
      // per-file bloom (integral columns carry one keyed on the
      // canonical cell text — `Long.toString` — since r12): the point
      // lookup / IN-probe on a numeric surrogate key skips files the
      // range alone can't once compaction widens every file to the
      // full key span. Files without a bloom (legacy, double columns)
      // fall back to the range check alone via mayContain=true.
      case EqualTo(a, v) => range(a).forall { case (mn, mx) =>
        dec(v).compareTo(mn) >= 0 && dec(v).compareTo(mx) <= 0 } &&
        GraftLogBloom.mayContain(e, a, canonicalCell(v))
      case GreaterThan(a, v) =>
        range(a).forall { case (_, mx) => mx.compareTo(dec(v)) > 0 }
      case GreaterThanOrEqual(a, v) =>
        range(a).forall { case (_, mx) => mx.compareTo(dec(v)) >= 0 }
      case LessThan(a, v) =>
        range(a).forall { case (mn, _) => mn.compareTo(dec(v)) < 0 }
      case LessThanOrEqual(a, v) =>
        range(a).forall { case (mn, _) => mn.compareTo(dec(v)) <= 0 }
      case In(a, vs) =>
        // range-filter the IN list first, then ONE bulk bloom probe
        // over the surviving values (files without stats keep every
        // value; files without a bloom may-match via the probe) —
        // never a per-value bloom deserialization
        val candidates = range(a) match {
          case Some((mn, mx)) => vs.filter(v => v != null && {
            val d = dec(v)
            d.compareTo(mn) >= 0 && d.compareTo(mx) <= 0
          })
          case None => vs.filter(_ != null)
        }
        candidates.nonEmpty && GraftLogBloom.mayContainAny(e, a,
          candidates.map(v => GraftLogBloom.packedHash(canonicalCell(v))))
      case _ => true
    } catch { case _: NumberFormatException => true }
  }
}

/** Per-file bloom filter over each STRING and INTEGRAL column,
  * carried in the manifest stats map under the reserved key
  * `<col>#bloom` — the equality-pruning index min/max ranges can't
  * provide (a `tag = 'x'` or `key = 42` predicate skips every file
  * whose bloom provably lacks the value, before any I/O; the Delta
  * bloom-index / Parquet bloom idea at manifest granularity). Numeric
  * values hash on their canonical cell text (`Long.toString`), the
  * same encoding the TSV stores and the prune side re-derives — the
  * index that matters most post-compaction, when every file's
  * [min, max] widens to the full surrogate-key span and point lookups
  * would otherwise stop skipping. SIZED TO THE FILE: the writer feeds a max-resolution
  * bit array as rows stream through, then at finish folds it down to
  * the smallest power-of-two size giving ~10 bits per distinct value
  * (NDV from the same per-file HLL sketch the writer already keeps) —
  * so a 7-value file carries a 64-byte bloom while a 50k-distinct
  * file keeps enough bits to actually prune, instead of a one-size
  * array that saturates to all-ones past ~500 values. The fold is
  * sound because probe positions are `hash mod 2^a`: OR-ing the top
  * half onto the bottom IS re-probing mod 2^(a-1), so any fold of a
  * bloom is a valid (coarser, still conservative) bloom. The hex
  * serialization is self-describing — length implies word count —
  * and k=5 double-hashed probes are computed mod the carried size,
  * which also reads legacy fixed-4096-bit blooms unchanged.
  * Compaction FOLDS blooms across inputs (align to the smallest
  * input's size, then bitwise OR — a sound superset for the union
  * file), so string skipping survives the nightly OPTIMIZE pass. */
object GraftLogBloom {
  /** Floor (and the legacy fixed size): 4096 bits = 64 words. */
  val MinBits = 4096
  /** Build-time resolution: 2^17 bits = 16 KB of longs per open
    * string column — prunes up to ~13k NDV at ~1% FP before
    * saturating; folded away at finish when the file is smaller. */
  val MaxBits = 131072
  val MaxWords: Int = MaxBits / 64
  val K = 5
  def key(col: String): String = s"$col#bloom"

  /** The value's whole bloom identity — (h1, h2|1) packed in one
    * long; probe positions derive from it at ANY power-of-two size,
    * so a writer can bank exact hashes cheaply and materialize the
    * right-sized bit array once the file's NDV is known. */
  def packedHash(v: String): Long = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(v, 0xA5A5A5A5)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(v, 0x5A5A5A5A) | 1
    (h1.toLong << 32) | (h2 & 0xffffffffL)
  }

  def addHashed(words: Array[Long], packed: Long): Unit = {
    val bits = words.length * 64
    val h1 = (packed >>> 32).toInt
    val h2 = packed.toInt
    var i = 0
    while (i < K) {
      val b = (h1 + i * h2) & (bits - 1)
      words(b >> 6) |= 1L << (b & 63)
      i += 1
    }
  }

  def add(words: Array[Long], v: String): Unit =
    addHashed(words, packedHash(v))

  /** Exact distinct hashes banked before spill — 16 KB flat. */
  val SpillLimit = 1024

  /** Compact open-addressed set of packed hashes, bounded at
    * [[SpillLimit]] entries: `add` returns FALSE (rejecting the
    * insert) once full, signaling the writer to spill to a
    * max-resolution bit array. ≤0.5 load factor, linear probing,
    * zero-sentinel slot tracked out of band. GROWS from 128 slots
    * (1 KB) by doubling up to the SpillLimit×2 cap: the writer holds
    * one of these per bloom-eligible column per OPEN part file, and a
    * partitioned task may hold 1000 part files of a many-column table
    * — eagerly allocating the 16 KB cap table per set put ~160 MB of
    * mostly-empty probe tables on the task heap before a single row
    * arrived (doubly so once integral columns became bloom-eligible),
    * while the typical per-value file holds a handful of distincts
    * and stays in the 1 KB table forever. */
  final class PackedSet {
    private var table = new Array[Long](128)
    private var mask = table.length - 1
    private var hasZero = false
    private var count = 0
    def size: Int = count

    /** Slot of v in t: its own, or the empty one it belongs in. */
    private def idxOf(t: Array[Long], m: Int, v: Long): Int = {
      var i = java.lang.Long.hashCode(
        v * 0x9E3779B97F4A7C15L) & m
      while (t(i) != 0L && t(i) != v) i = (i + 1) & m
      i
    }

    private def grow(): Unit = {
      val nt = new Array[Long](table.length * 2)
      val nm = nt.length - 1
      var i = 0
      while (i < table.length) {
        val v = table(i)
        if (v != 0L) nt(idxOf(nt, nm, v)) = v
        i += 1
      }
      table = nt
      mask = nm
    }

    def add(v: Long): Boolean = {
      if (v == 0L) {
        if (!hasZero) {
          if (count >= SpillLimit) return false
          hasZero = true; count += 1
        }
        return true
      }
      var i = idxOf(table, mask, v)
      if (table(i) == v) return true
      if (count >= SpillLimit) return false
      // hold load ≤ 0.5 until the cap table (SpillLimit×2 slots),
      // which by construction never needs to grow again
      if ((count + 1) * 2 > table.length &&
          table.length < SpillLimit * 2) {
        grow()
        i = idxOf(table, mask, v)
      }
      table(i) = v
      count += 1
      true
    }
    def foreach(f: Long => Unit): Unit = {
      if (hasZero) f(0L)
      var i = 0
      while (i < table.length) {
        if (table(i) != 0L) f(table(i))
        i += 1
      }
    }
  }

  /** Smallest power-of-two bit count giving ~10 bits/key for the
    * estimated NDV (≈1% FP at k=5), clamped to [MinBits, MaxBits].
    * Past the cardinality even MaxBits can't usefully prune (<4
    * bits/key → >20% FP), the bloom is saturated noise — carry the
    * floor size instead of 32 KB of near-all-ones per file. */
  def sizeFor(ndv: Long): Int =
    if (ndv * 4 > MaxBits) MinBits
    else {
      var bits = MinBits
      while (bits < MaxBits && bits < ndv * 10) bits <<= 1
      bits
    }

  /** Fold a bloom down to `targetWords` (power-of-two halving: OR the
    * top half onto the bottom). Identity when already at or below. */
  def foldTo(words: Array[Long], targetWords: Int): Array[Long] = {
    var w = words
    while (w.length > targetWords) {
      val half = w.length / 2
      w = Array.tabulate(half)(i => w(i) | w(i + half))
    }
    w
  }

  def serialize(words: Array[Long]): String =
    words.map(w => f"$w%016x").mkString

  /** True when the hex is a structurally valid bloom: a power-of-two
    * word count within [MinBits/64, MaxWords]. */
  def validHex(hex: String): Boolean = {
    val words = hex.length / 16
    hex.length % 16 == 0 && words >= MinBits / 64 &&
      words <= MaxWords && java.lang.Integer.bitCount(words) == 1
  }

  def deserialize(hex: String): Array[Long] =
    Array.tabulate(hex.length / 16)(i =>
      java.lang.Long.parseUnsignedLong(
        hex.substring(i * 16, i * 16 + 16), 16))

  /** Membership probe against an ALREADY-DESERIALIZED bloom array. */
  def containsHashed(words: Array[Long], packed: Long): Boolean = {
    val bits = words.length * 64
    val h1 = (packed >>> 32).toInt
    val h2 = packed.toInt
    var i = 0
    while (i < K) {
      val b = (h1 + i * h2) & (bits - 1)
      if ((words(b >> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Conservative membership against an entry's manifest bloom: false
    * ONLY when a bloom is present and provably lacks the value. The
    * carried length sets the probe modulus, so any vintage reads. */
  def mayContain(e: LogEntry, col: String, v: String): Boolean =
    e.stats.get(key(col)) match {
      case Some((hex, _)) if validHex(hex) =>
        containsHashed(deserialize(hex), packedHash(v))
      case _ => true
    }

  /** Bulk conservative probe: may the entry contain ANY of the
    * pre-hashed keys? The bloom hex is deserialized ONCE per entry —
    * the per-key [[mayContain]] form re-parses it per probe, which at
    * MERGE file-targeting scale is keys × files hex decodes on the
    * driver (1000 probe keys × a 100 TB table's file count). Entries
    * without a valid bloom may match; an EMPTY key set matches
    * nothing. */
  def mayContainAny(e: LogEntry, col: String,
      packed: Array[Long]): Boolean =
    e.stats.get(key(col)) match {
      case Some((hex, _)) if validHex(hex) =>
        val words = deserialize(hex)
        packed.exists(containsHashed(words, _))
      case _ => true
    }
}

/** Per-file, per-column HyperLogLog NDV sketch in the manifest — the
  * distinct-count half of the table-stats story (Iceberg ships theta
  * sketches in puffin files, Delta ANALYZE stores NDV per column; the
  * graft-log carries them inline in the commit stats the same way it
  * carries min/max and blooms). 512 registers (p=9, ~4.6% standard
  * error), one byte each, hex in the stats cell. The whole point of a
  * register sketch is MERGEABILITY: the union of two files' value
  * sets is exactly the register-wise max of their sketches, so the
  * table-level NDV is computable from metadata alone — per scan,
  * post-file-skipping, with no data I/O — and compaction folds input
  * sketches instead of dropping them. NDV feeds the DSv2
  * `Statistics.columnStats()` surface Catalyst's CBO reads for join
  * ordering and selectivity at 100 TB (SPARK-41378), and the `t$stats`
  * metadata table. Null counts ride along under `col#nulls` (exact,
  * additive). */
object GraftLogNdv {
  val P = 9
  val M: Int = 1 << P
  def key(col: String): String = s"$col#ndv"
  def nullsKey(col: String): String = s"$col#nulls"

  /** 64-bit hash of the cell's canonical TSV encoding: FNV-1a over the
    * UTF-8 bytes through a splitmix64 finalizer (both public-domain
    * constants) — FNV alone clusters low bits, and HLL register
    * selection needs the top bits well mixed. */
  def hash(cell: String): Long = {
    val bytes = cell.getBytes(StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1
    }
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  def add(regs: Array[Byte], cell: String): Unit = {
    val h = hash(cell)
    val idx = (h >>> (64 - P)).toInt
    val rest = h << P
    val rank =
      (if (rest == 0L) 64 - P
       else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  /** Union semantics: register-wise max. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    Array.tabulate(M)(i => if (a(i) >= b(i)) a(i) else b(i))

  /** Hex pairs with zero-run compression: `z` + 2-hex run length for
    * a run of zero registers (the dominant case for low-cardinality
    * columns — a 7-value column's sketch is ~40 chars instead of
    * 1024, which is what keeps per-file stats affordable when a table
    * has millions of files). Alphabet stays inside the stats-cell-safe
    * set (no tab, `=`, `,`, `;`). */
  def serialize(regs: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(M / 4)
    var i = 0
    while (i < M) {
      if (regs(i) == 0) {
        var n = 0
        while (i < M && regs(i) == 0 && n < 255) { n += 1; i += 1 }
        sb.append('z').append(f"$n%02x")
      } else {
        sb.append(f"${regs(i)}%02x")
        i += 1
      }
    }
    sb.toString
  }

  /** Accepts both the run-length form and plain 1024-hex (sketches
    * written before the compression). Throws on malformed input —
    * callers go through [[of]], which validates. */
  def deserialize(s: String): Array[Byte] = {
    val regs = new Array[Byte](M)
    var i = 0
    var out = 0
    while (i < s.length) {
      if (s.charAt(i) == 'z') {
        out += Integer.parseInt(s.substring(i + 1, i + 3), 16)
        i += 3
      } else {
        regs(out) =
          Integer.parseInt(s.substring(i, i + 2), 16).toByte
        out += 1
        i += 2
      }
    }
    require(out == M, s"NDV sketch decoded to $out of $M registers")
    regs
  }

  /** Flajolet et al. estimator with the linear-counting small-range
    * correction; no large-range correction needed with 64-bit hashes. */
  def estimate(regs: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += java.lang.Math.scalb(1.0, -regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * M * M / sum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.round(est)
  }

  def of(e: LogEntry, col: String): Option[Array[Byte]] =
    e.stats.get(key(col)).flatMap { case (enc, _) =>
      scala.util.Try(deserialize(enc)).toOption
    }

  def nullsOf(e: LogEntry, col: String): Option[Long] =
    e.stats.get(nullsKey(col)).flatMap(v =>
      scala.util.Try(v._1.toLong).toOption)

  /** Merged table-level column stats over a set of live entries —
    * (NDV estimate, exact null count), each present only when every
    * row-bearing input accounts for the column. A file written before
    * an additive evolution never SAW the column: its rows read back as
    * all-NULL there, so it contributes an empty sketch (exact for the
    * union) and `rows` nulls. A pre-feature legacy file or a DV'd file
    * (deleted rows may hold the extinct distinct values and nulls)
    * drops the column's stats instead of serving wrong ones. */
  def mergedColumnStats(schema: StructType, entries: Seq[LogEntry])
      : Map[String, (Option[Long], Option[Long])] = {
    val live = entries.filter(e => e.rows != 0L)
    schema.fields.map { f =>
      val perFile = live.map { e =>
        val dv = GraftLog.dvOf(e).isDefined
        // a pre-rename file keys the column's stats under its former
        // name — resolve before deciding the column is absent
        val local = GraftLog.fileLocalName(schema, e, f.name)
        val absent = e.cols.nonEmpty && !e.cols.contains(local)
        val sketch =
          if (dv) None
          else if (absent) Some(new Array[Byte](M))
          else of(e, local)
        val nulls =
          if (dv) None
          else if (absent) Some(math.max(e.rows, 0L))
          else nullsOf(e, local)
        (sketch, nulls)
      }
      // zero row-bearing files (empty table, or a scan whose skipping
      // kept nothing) is an EXACT zero, not an unknown
      val ndv =
        if (perFile.isEmpty) Some(0L)
        else if (perFile.forall(_._1.isDefined))
          Some(estimate(perFile.map(_._1.get).reduce(merge)))
        else None
      val nulls =
        if (perFile.isEmpty) Some(0L)
        else if (perFile.forall(_._2.isDefined))
          Some(perFile.map(_._2.get).sum)
        else None
      f.name -> (ndv, nulls)
    }.toMap
  }
}

/** Shared per-file column-stats tracker over the CANONICAL TSV cells
  * a graft-log part file stores — min/max for numeric columns,
  * NDV-sized blooms for equality-prunable columns (string AND
  * integral; see below), an HLL NDV sketch plus exact null count for
  * every column. Both write paths run it: the append writer
  * ([[GraftLogWriterFactory]]) feeds the cells it is about to encode,
  * and COMPACTION feeds the cells it streams into each rolled output —
  * so maintenance outputs carry file-EXACT stats instead of a fold of
  * their inputs' manifests. That is what keeps a maintained table
  * prunable: folding manifest stats had to drop EVERYTHING when any
  * input carried a deletion vector (the deleted rows may have held the
  * extremum, the distinct values, the nulls), which meant exactly the
  * big, long-lived post-DELETE files compaction produces lost range
  * skipping, metadata-only MIN/MAX/COUNT, and CBO cardinalities.
  * Recomputing from the surviving cells is exact in every case — DV'd
  * inputs, evolved/renamed vintages, rolled outputs (each gets its own
  * file-exact range, tighter than the group-wide fold) — and the exact
  * per-file null counts stay additive under the planning-time merge,
  * so rolled groups no longer have to strip them.
  *
  * Blooms cover string and integral (long/int) columns, hashed on the
  * canonical cell text (`Long.toString` — the same encoding the filter
  * side canonicalizes to in [[GraftLogPrune]]), so point lookups and
  * IN-probes on numeric surrogate keys prune files the way string tags
  * always did. Double columns get no bloom: float equality is not a
  * lookup pattern, and min/max already serves their range predicates. */
private[sources] final class GraftLogCellStats(schema: StructType) {
  import org.apache.spark.sql.types._
  private val fields = schema.fields
  private val n = fields.length
  // typed min/max per numeric column (boxed; null = none seen)
  private val numericIdx: Array[Int] = fields.zipWithIndex.collect {
    case (f, i) if f.dataType == LongType ||
      f.dataType == IntegerType || f.dataType == DoubleType => i
  }
  private val mins = new Array[Any](n)
  private val maxs = new Array[Any](n)
  // equality-bloom per string/integral column: exact packed hashes
  // bank in a bounded set, spill to a max-resolution array past
  // SpillLimit distinct; finish() right-sizes from the NDV either way
  private val bloomIdx: Array[Int] = fields.zipWithIndex.collect {
    case (f, i) if f.dataType == StringType ||
      f.dataType == LongType || f.dataType == IntegerType => i
  }
  private val bloomSets = Array.fill(bloomIdx.length)(
    new GraftLogBloom.PackedSet)
  private val blooms = new Array[Array[Long]](bloomIdx.length)
  private val bloomSlot: Array[Int] = {
    val a = Array.fill(n)(-1)
    bloomIdx.zipWithIndex.foreach { case (c, s) => a(c) = s }
    a
  }
  private val ndvRegs =
    Array.fill(n)(new Array[Byte](GraftLogNdv.M))
  private val nullCnt = new Array[Long](n)

  private def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Int, y: Int) => x < y
    // NaN compares false both ways, freezing min/max — the same
    // degrade-to-may-match contract the prune side documents
    case (x: Double, y: Double) => x < y
    case _ => false
  }

  /** One row's canonical cells (NullCell sentinel for SQL NULL),
    * in the tracker schema's column order. */
  def add(cells: Array[String]): Unit = {
    var s = 0
    while (s < numericIdx.length) {
      val i = numericIdx(s)
      val cell = cells(i)
      if (cell != GraftLog.NullCell) {
        val v: Any = fields(i).dataType match {
          case LongType => java.lang.Long.parseLong(cell)
          case IntegerType => java.lang.Integer.parseInt(cell)
          case _ => java.lang.Double.parseDouble(cell)
        }
        if (mins(i) == null || lt(v, mins(i))) mins(i) = v
        if (maxs(i) == null || lt(maxs(i), v)) maxs(i) = v
      }
      s += 1
    }
    var c = 0
    while (c < n) {
      val cell = cells(c)
      if (cell == GraftLog.NullCell) nullCnt(c) += 1
      else {
        GraftLogNdv.add(ndvRegs(c), cell)
        val b = bloomSlot(c)
        if (b >= 0) {
          val packed = GraftLogBloom.packedHash(cell)
          if (blooms(b) != null)
            GraftLogBloom.addHashed(blooms(b), packed)
          else if (!bloomSets(b).add(packed)) {
            val arr = new Array[Long](GraftLogBloom.MaxWords)
            bloomSets(b).foreach(GraftLogBloom.addHashed(arr, _))
            GraftLogBloom.addHashed(arr, packed)
            blooms(b) = arr
            bloomSets(b) = null
          }
        }
      }
      c += 1
    }
  }

  /** The file's exact stats map — min/max under each column's CURRENT
    * name, right-sized blooms, NDV sketches, null counts. Partition
    * value and raw-size entries stay with the callers. */
  def finish(): Map[String, (String, String)] = {
    val minMax = numericIdx.collect {
      case i if mins(i) != null =>
        fields(i).name -> (mins(i).toString, maxs(i).toString)
    }.toMap
    val bloomStats = bloomIdx.indices.flatMap { b =>
      val i = bloomIdx(b)
      // Past the saturation cardinality (NDV × 4 > MaxBits) even the
      // max-resolution array is near-all-ones: a carried bloom would
      // admit everything anyway, so OMIT it — absent reads as
      // may-match, the same pruning outcome, at zero manifest bytes.
      // This matters now that every integral column is bloom-eligible:
      // a unique surrogate-key column in a 128 MB file would otherwise
      // stamp a useless saturated floor bloom on every file of a
      // 100 TB table. Unspilled columns (≤1024 exact hashes) are
      // never in this regime.
      val ndvEst =
        if (blooms(b) != null) GraftLogNdv.estimate(ndvRegs(i))
        else bloomSets(b).size.toLong
      if (ndvEst * 4L > GraftLogBloom.MaxBits) None
      else {
        val words =
          if (blooms(b) != null)
            GraftLogBloom.foldTo(blooms(b),
              GraftLogBloom.sizeFor(ndvEst) / 64)
          else {
            val arr = new Array[Long](
              GraftLogBloom.sizeFor(bloomSets(b).size) / 64)
            bloomSets(b).foreach(GraftLogBloom.addHashed(arr, _))
            arr
          }
        Some(GraftLogBloom.key(fields(i).name) ->
          (GraftLogBloom.serialize(words), "v1"))
      }
    }.toMap
    val ndvStats = fields.indices.flatMap { i =>
      val name = fields(i).name
      Seq(GraftLogNdv.key(name) ->
            (GraftLogNdv.serialize(ndvRegs(i)), "v1"),
          GraftLogNdv.nullsKey(name) -> (nullCnt(i).toString, "n"))
    }.toMap
    minMax ++ bloomStats ++ ndvStats
  }
}

/** Deletion-vector sidecar codec: a sorted array of deleted row
  * ordinals (position within the part file, counting non-empty lines)
  * as raw 8-byte big-endian longs in a `dv-<uuid>.bin` file. Readers
  * walk it with a single pointer while streaming the file (positions
  * arrive in order), so the skip costs O(1) per row. A production
  * format would use a compressed bitmap (Delta DVs are roaring
  * bitmaps); the protocol shape — sidecar + manifest descriptor +
  * reader-side skip + compaction materialization — is the same. */
object GraftLogDv {
  def write(dir: String, positions: Array[Long]): String = {
    val name = s"dv-${UUID.randomUUID()}.bin"
    val bb = java.nio.ByteBuffer.allocate(positions.length * 8)
    positions.foreach(bb.putLong)
    Files.write(Paths.get(dir, name), bb.array())
    name
  }
  def read(dir: String, name: String): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(
      Files.readAllBytes(Paths.get(dir, name)))
    Array.fill(bb.remaining() / 8)(bb.getLong)
  }
}

/** Identity-partition value of a part file, carried in the manifest
  * stats map under the reserved key `<col>#part` — a partitioned
  * writer routes each row to a per-value file, so every file holds
  * exactly one partition value and the manifest records which. This is
  * what lets the scan GROUP files by value and report
  * KeyGroupedPartitioning to Catalyst (storage-partitioned joins), the
  * way Iceberg's partition tuples do. Values are base64-wrapped so an
  * arbitrary string value survives the manifest's `;`/`=`/`,`
  * delimiters; the tag side records the type. */
object GraftLogPartValue {
  def key(col: String): String = s"$col#part"
  private val B64 = java.util.Base64.getEncoder
  private val B64D = java.util.Base64.getDecoder

  /** (encoded, tag) for the stats map. */
  def encode(v: Any): (String, String) = v match {
    case null => ("", "n")
    case s: UTF8String => (B64.encodeToString(s.getBytes), "s")
    case l: Long => (l.toString, "l")
    case i: Int => (i.toString, "i")
    case d: Double => (java.lang.Double.toString(d), "d")
    case other => throw new IllegalArgumentException(
      s"unsupported partition value type ${other.getClass}")
  }

  /** The file's partition value (null = the NULL partition), or None
    * when the entry carries no partition record (pre-partitioning
    * history, compaction rewrites). */
  def of(e: LogEntry, col: String): Option[Any] =
    e.stats.get(key(col)).map {
      case (_, "n") => null
      case (enc, "s") => UTF8String.fromBytes(B64D.decode(enc))
      case (enc, "l") => enc.toLong: Any
      case (enc, "i") => enc.toInt: Any
      case (enc, "d") => enc.toDouble: Any
      case (enc, tag) => throw new IllegalArgumentException(
        s"unknown partition value tag $tag for $enc")
    }
}

/** `cols` = the file's own column list from its manifest entry (empty
  * for pre-evolution entries: the file carries the full table schema).
  * `start`/`length` bound a BYTE RANGE of a splittable (gcol) part: a
  * block belongs to the task whose range contains its start offset
  * (the parquet/FileScanRDD split rule), so a 10 GB part fans out over
  * many tasks instead of serializing into one. The defaults read the
  * whole file (non-splittable legacy parts, streaming, groups). */
case class GraftLogPartition(dir: String, file: String,
    cols: Seq[String] = Seq.empty, dvFile: Option[String] = None,
    start: Long = 0L, length: Long = Long.MaxValue)
    extends InputPartition

/** One partition-value GROUP of files — the planning unit of a
  * partitioned scan. `partitionKey` hands Catalyst the group's value,
  * which is what makes two alike-partitioned tables join with ZERO
  * exchange (storage-partitioned join). */
case class GraftLogGroupPartition(dir: String, key: InternalRow,
    files: Seq[(String, Seq[String], Option[String])])
    extends InputPartition with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

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

/** The `t$stats` metadata table: one row per table column with the
  * MERGED manifest statistics of the current snapshot — (column,
  * ndv_est, null_count, min, max, n_files) — the ANALYZE-TABLE
  * surface, except nothing runs: every figure derives from the
  * per-file sketches the writers already paid for, merged at metadata
  * cost. ndv_est is the HLL union estimate (±~5%), null_count exact
  * and additive, min/max the numeric fold; any figure a file can't
  * vouch for (legacy entry, DV'd file) reads NULL rather than a wrong
  * number. At 100 TB this is how an optimizer, a data engineer, or a
  * quality monitor asks "how many distinct users / how null is this
  * column" without a table scan. */
class GraftLogStatsTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft_log_stats($dir)"
  override def schema(): StructType = GraftLogStatsTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        private val rows: Seq[InternalRow] = {
          val schema = GraftLog.storedSchema(dir)
            .getOrElse(StructType(Nil))
          // the LIVE snapshot (checkpoint+tail replay), not the full
          // ledger — removed files must not pollute table-level stats
          val live = GraftLog.entriesAsOf(dir, Long.MaxValue)
          val merged = GraftLogNdv.mergedColumnStats(schema, live)
          val withRows = live.filter(_.rows != 0L)
          val noDv =
            withRows.forall(e => GraftLog.dvOf(e).isEmpty)
          schema.fields.toSeq.map { f =>
            val (ndv, nulls) = merged(f.name)
            // numeric min/max fold mirrors the scan's skipping rules:
            // present only when every row-bearing DV-free file carries
            // the column's range
            // pre-rename files key the range under the former name;
            // unparseable stats (NaN) drop the range, never crash
            def localStat(e: LogEntry) =
              GraftLog.decStat(e,
                GraftLog.fileLocalName(schema, e, f.name))
            val range =
              if (noDv && withRows.nonEmpty &&
                  withRows.forall(localStat(_).isDefined)) {
                val mn = withRows.map(localStat(_).get._1).min
                val mx = withRows.map(localStat(_).get._2).max
                Some((mn.toPlainString, mx.toPlainString))
              } else None
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(f.name),
              ndv.map(Long.box).orNull,
              nulls.map(Long.box).orNull,
              range.map(r => UTF8String.fromString(r._1)).orNull,
              range.map(r => UTF8String.fromString(r._2)).orNull,
              live.size.toLong))
          }
        }
        override def readSchema(): StructType = GraftLogStatsTable.Schema
        override def toBatch: Batch = this
        override def description(): String =
          s"graft_log_stats $dir cols=${rows.size}"
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftLogStatsPartition(rows))
        override def createReaderFactory(): PartitionReaderFactory =
          GraftLogStatsRows
      }
    }
}

/** The `t$cdc` metadata table: one row per committed version with its
  * typed-feed coverage — (version, has_cdc, n_cdc_files, n_cdc_rows,
  * n_add_files, n_add_rows) — what a downstream sync planner reads to
  * know which spans carry exact change types and which fall back to
  * adds-as-inserts. Walks the same O(history-span) commit listing the
  * feed itself reads. */
class GraftLogCdcTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft_log_cdc($dir)"
  override def schema(): StructType = GraftLogCdcTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        private val rows: Seq[InternalRow] = {
          val all = GraftLog.entries(dir)
          all.groupBy(_.version).toSeq.sortBy(_._1).map {
            case (v, es) =>
              val cdc = es.filter(_.action == "cdc")
              val adds = es.filter(e => e.isAdd && e.dataChange)
              new GenericInternalRow(Array[Any](
                v, cdc.nonEmpty, cdc.size.toLong,
                cdc.map(e => math.max(e.rows, 0L)).sum,
                adds.size.toLong,
                adds.map(e => math.max(e.rows, 0L)).sum))
          }
        }
        override def readSchema(): StructType = GraftLogCdcTable.Schema
        override def toBatch: Batch = this
        override def description(): String =
          s"graft_log_cdc $dir versions=${rows.size}"
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftLogStatsPartition(rows))
        override def createReaderFactory(): PartitionReaderFactory =
          GraftLogStatsRows
      }
    }
}

object GraftLogCdcTable {
  val Schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("has_cdc", BooleanType, nullable = false),
    StructField("n_cdc_files", LongType, nullable = false),
    StructField("n_cdc_rows", LongType, nullable = false),
    StructField("n_add_files", LongType, nullable = false),
    StructField("n_add_rows", LongType, nullable = false)))
}

case class GraftLogStatsPartition(rows: Seq[InternalRow])
    extends InputPartition

/** Shared reader factory for the single-partition metadata tables
  * whose rows are precomputed on the driver
  * ([[GraftLogStatsPartition]]): t$stats, t$cdc. */
object GraftLogStatsRows extends PartitionReaderFactory {
  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] = {
    val it = p.asInstanceOf[GraftLogStatsPartition].rows.iterator
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        cur = it.next(); true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

object GraftLogStatsTable {
  val Schema: StructType = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("ndv_est", LongType, nullable = true),
    StructField("null_count", LongType, nullable = true),
    StructField("min", StringType, nullable = true),
    StructField("max", StringType, nullable = true),
    StructField("n_files", LongType, nullable = false)))
}

/** The `t$history` metadata table: one row per committed version —
  * (version, ts_millis, n_adds, n_removes, rows_added) — the audit
  * surface `TIMESTAMP AS OF` resolves against and a RESTORE consults.
  * rows_added counts dataChange rows only (what a CDF consumer saw). */
class GraftLogHistoryTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft_log_history($dir)"
  override def schema(): StructType = GraftLogHistoryTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        private val rows: Seq[Array[Any]] = {
          // ts from versionTimestamps — the SAME derivation TIMESTAMP
          // AS OF resolves against, so audit and resolution can't drift
          val vts = GraftLog.versionTimestamps(dir).toMap
          GraftLog.entries(dir).groupBy(_.version).toSeq.sortBy(_._1)
            .map { case (v, es) =>
              Array[Any](v, vts(v),
                es.count(_.isAdd).toLong,
                es.count(!_.isAdd).toLong,
                es.filter(e => e.isAdd && e.dataChange)
                  .map(e => math.max(e.rows, 0L)).sum)
            }
        }
        override def readSchema(): StructType = GraftLogHistoryTable.Schema
        override def toBatch: Batch = this
        override def description(): String =
          s"graft_log_history $dir versions=${rows.size}"
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftLogHistoryPartition(rows))
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(
                p: InputPartition): PartitionReader[InternalRow] = {
              val it = p.asInstanceOf[GraftLogHistoryPartition].rows.iterator
              new PartitionReader[InternalRow] {
                private var cur: InternalRow = _
                override def next(): Boolean = {
                  if (!it.hasNext) return false
                  cur = new GenericInternalRow(it.next())
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

object GraftLogHistoryTable {
  val Schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("ts_millis", LongType, nullable = false),
    StructField("n_adds", LongType, nullable = false),
    StructField("n_removes", LongType, nullable = false),
    StructField("rows_added", LongType, nullable = false)))
}

/** The `t$partitions` metadata table (Iceberg's `partitions`): one row
  * per live identity-partition value — (part_value, n_files, n_rows) —
  * the layout surface a maintenance policy reads (which partitions are
  * fragmented enough to compact, how skewed the value distribution
  * is). Rows count EFFECTIVE rows (DV-deleted rows excluded), files
  * are the CURRENT snapshot only — `t$files` keeps the full ledger.
  * part_value is NULL for the NULL partition, for files predating the
  * partition declaration (honest: those files also fall out of
  * storage-partitioned grouping), and for every file of an
  * unpartitioned table (one summary row, like Iceberg). */
class GraftLogPartitionsTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft_log_partitions($dir)"
  override def schema(): StructType = GraftLogPartitionsTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        private val rows: Seq[Array[Any]] = {
          val partCol = GraftLog.partitionColOf(dir)
          val live = GraftLog.entriesAsOf(dir, Long.MaxValue)
          live.groupBy(e => partCol.flatMap(c =>
              GraftLogPartValue.of(e, c)).map {
                case null => null
                case v => v.toString
              }.orNull)
            .toSeq
            .sortBy { case (pv, _) => (pv == null, Option(pv).getOrElse("")) }
            .map { case (pv, es) =>
              Array[Any](
                Option(pv).map(UTF8String.fromString).orNull,
                es.size.toLong,
                es.map(GraftLog.effectiveRows).sum)
            }
        }
        override def readSchema(): StructType =
          GraftLogPartitionsTable.Schema
        override def toBatch: Batch = this
        override def description(): String =
          s"graft_log_partitions $dir groups=${rows.size}"
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftLogHistoryPartition(rows))
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(
                p: InputPartition): PartitionReader[InternalRow] = {
              val it = p.asInstanceOf[GraftLogHistoryPartition].rows.iterator
              new PartitionReader[InternalRow] {
                private var cur: InternalRow = _
                override def next(): Boolean = {
                  if (!it.hasNext) return false
                  cur = new GenericInternalRow(it.next())
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

object GraftLogPartitionsTable {
  val Schema: StructType = StructType(Seq(
    StructField("part_value", StringType, nullable = true),
    StructField("n_files", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))
}

/** The `t$refs` metadata table: one row per named ref (tag) —
  * (name, version, reachable) — the discovery surface for
  * `VERSION AS OF '<name>'`. `reachable` is false when log expiration
  * moved the retained horizon past the pinned version (reads through
  * the ref now fail loudly; the row makes the dead tag visible to
  * cleanup jobs instead of silent). */
class GraftLogRefsTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft_log_refs($dir)"
  override def schema(): StructType = GraftLogRefsTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        private val rows: Seq[Array[Any]] = {
          val oldest = GraftLog.oldestReplayableVersion(dir)
          GraftLog.refs(dir).toSeq.sortBy(_._1).map { case (n, v) =>
            Array[Any](UTF8String.fromString(n), v,
              oldest <= 0L || v >= oldest)
          }
        }
        override def readSchema(): StructType = GraftLogRefsTable.Schema
        override def toBatch: Batch = this
        override def description(): String =
          s"graft_log_refs $dir refs=${rows.size}"
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftLogHistoryPartition(rows))
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(
                p: InputPartition): PartitionReader[InternalRow] = {
              val it = p.asInstanceOf[GraftLogHistoryPartition].rows.iterator
              new PartitionReader[InternalRow] {
                private var cur: InternalRow = _
                override def next(): Boolean = {
                  if (!it.hasNext) return false
                  cur = new GenericInternalRow(it.next())
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

object GraftLogRefsTable {
  val Schema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("reachable", BooleanType, nullable = false)))
}

/** The `t$txns` metadata table: one row per incremental writer's
  * latest [[LogEntry.txn]] marker — (app_id, applied_through,
  * committed_version, ts_millis) — the observability surface for the
  * exactly-once contract: which consumer has applied the source
  * through which version, and when. What an operator checks before
  * deciding whether a materialized view or streaming sink is stale. */
class GraftLogTxnsTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft_log_txns($dir)"
  override def schema(): StructType = GraftLogTxnsTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        private val rows: Seq[Array[Any]] =
          GraftLog.snapshotAsOf(dir, Long.MaxValue).txns
            .sortBy(_.file).map { e =>
              Array[Any](
                UTF8String.fromString(e.file.stripPrefix("txn:")),
                e.rows, e.version, e.ts)
            }
        override def readSchema(): StructType = GraftLogTxnsTable.Schema
        override def toBatch: Batch = this
        override def description(): String =
          s"graft_log_txns $dir txns=${rows.size}"
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftLogHistoryPartition(rows))
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(
                p: InputPartition): PartitionReader[InternalRow] = {
              val it = p.asInstanceOf[GraftLogHistoryPartition].rows.iterator
              new PartitionReader[InternalRow] {
                private var cur: InternalRow = _
                override def next(): Boolean = {
                  if (!it.hasNext) return false
                  cur = new GenericInternalRow(it.next())
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

object GraftLogTxnsTable {
  val Schema: StructType = StructType(Seq(
    StructField("app_id", StringType, nullable = false),
    StructField("applied_through", LongType, nullable = false),
    StructField("committed_version", LongType, nullable = false),
    StructField("ts_millis", LongType, nullable = false)))
}

/** The `t$branches` metadata table: one row per live branch —
  * (name, fork_version, head_version, n_commits, n_files) — the
  * discovery surface for branch reads and the fast-forward decision
  * (a branch whose fork trails the main head cannot fast-forward). */
class GraftLogBranchesTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft_log_branches($dir)"
  override def schema(): StructType = GraftLogBranchesTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        private val rows: Seq[Array[Any]] =
          GraftLog.branches(dir).toSeq.sortBy(_._1).map { case (n, fork) =>
            val es = GraftLog.branchEntries(dir, n)
            Array[Any](UTF8String.fromString(n), fork,
              GraftLog.branchHead(dir, n),
              es.map(_.version).distinct.size.toLong,
              es.count(_.isAdd).toLong)
          }
        override def readSchema(): StructType = GraftLogBranchesTable.Schema
        override def toBatch: Batch = this
        override def description(): String =
          s"graft_log_branches $dir branches=${rows.size}"
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftLogHistoryPartition(rows))
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(
                p: InputPartition): PartitionReader[InternalRow] = {
              val it = p.asInstanceOf[GraftLogHistoryPartition].rows.iterator
              new PartitionReader[InternalRow] {
                private var cur: InternalRow = _
                override def next(): Boolean = {
                  if (!it.hasNext) return false
                  cur = new GenericInternalRow(it.next())
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

object GraftLogBranchesTable {
  val Schema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("fork_version", LongType, nullable = false),
    StructField("head_version", LongType, nullable = false),
    StructField("n_commits", LongType, nullable = false),
    StructField("n_files", LongType, nullable = false)))
}

case class GraftLogHistoryPartition(rows: Seq[Array[Any]])
    extends InputPartition

case class GraftLogFilesPartition(entries: Seq[LogEntry])
    extends InputPartition

class GraftLogReaderFactory(tableSchema: StructType, required: StructType,
    columnar: Boolean = false,
    blockFilters: Array[Filter] = Array.empty)
    extends PartitionReaderFactory {

  /** (dir, chained files with their own column layouts + byte range)
    * of a planned input partition — one file (possibly a range split
    * of it), or a partition-value group read through one reader
    * (groups never split: KeyGroupedPartitioning promises one
    * partition per key). */
  private def filesOf(p: InputPartition): (String,
      Seq[(String, Seq[String], Option[String], Long, Long)]) = p match {
    case part: GraftLogPartition =>
      (part.dir, Seq((part.file, part.cols, part.dvFile,
        part.start, part.length)))
    case g: GraftLogGroupPartition =>
      (g.dir, g.files.map { case (f, cols, dv) =>
        (f, cols, dv, 0L, Long.MaxValue) })
    case other => throw new IllegalArgumentException(
      s"unexpected partition $other")
  }

  /** Projection map: required field → cell index in THIS FILE's line
    * layout (the entry's own column list; pre-evolution entries carry
    * the full table schema). -1 = the column post-dates the file: its
    * rows read NULL, the schema-evolution contract. -2 = the `_file`
    * metadata column, -3 = the `_pos` row ordinal: both served by the
    * reader, never parsed from a cell. */
  private def cellIndexOf(partCols: Seq[String]): (Array[Int], Int) = {
    val fileCols: Seq[String] =
      if (partCols.nonEmpty) partCols else tableSchema.fieldNames.toSeq
    // a file written before a RENAME COLUMN carries the column under
    // its recorded former name — resolve through the trail rather
    // than serving NULL for data the file does hold
    def indexOf(name: String): Int = fileCols.indexOf(name) match {
      case -1 if partCols.nonEmpty =>
        tableSchema.fields.find(_.name == name)
          .flatMap(f => GraftLog.formerNames(f).collectFirst {
            case fn if fileCols.contains(fn) => fileCols.indexOf(fn)
          }).getOrElse(-1)
      case i => i
    }
    (required.fields.map(f =>
      if (f.name == "_file" && !fileCols.contains("_file")) -2
      else if (f.name == "_pos" && !fileCols.contains("_pos")) -3
      else indexOf(f.name)), fileCols.length)
  }

  /** Vectorized read path — the contract Parquet's vectorized reader
    * honors and the repo's own SeriesSource demonstrates: rows
    * materialize 4096 at a time into `OnHeapColumnVector`s and reach
    * the engine as ColumnarBatch (the plan shows BatchScan →
    * ColumnarToRow), so whole-stage codegen consumes columns without
    * per-row iterator/GenericInternalRow overhead. Decoding walks tab
    * positions in place and materializes ONLY projected cells — column
    * pruning skips both the parse and the allocation. Batch reads only;
    * the row reader below serves streaming and the API fallback. */
  override def supportColumnarReads(p: InputPartition): Boolean = columnar

  override def createColumnarReader(p: InputPartition): PartitionReader[
      org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
    val (dir, files) = filesOf(p)
    // per-field decode tag bound once: 0=long 1=int 2=double 3=string
    val tag: Array[Int] = required.fields.map(_.dataType match {
      case LongType => 0
      case IntegerType => 1
      case DoubleType => 2
      case StringType => 3
      case other => throw new IllegalArgumentException(
        s"graft-log does not decode $other")
    })
    val BatchRows = 4096

    /** Per-file batch filler: fills up to `max` rows into `vecs` from
      * row 0, returns rows filled (0 = exhausted). Two shapes - the
      * native gcol block cursor (decompresses ONLY projected chunks,
      * honors the byte-range split, skips blocks whose footer stats
      * refute a pushed filter) and the legacy line cursor for
      * `.tsv(.gz)` parts. */
    trait Cursor {
      def fill(vecs: Array[OnHeapColumnVector], max: Int): Int
      def close(): Unit
    }

    final class GcolCursor(f: String, partCols: Seq[String],
        dv: Option[String], start: Long, length: Long) extends Cursor {
      private val file = new File(dir, f)
      private val ch = java.nio.channels.FileChannel.open(
        file.toPath, java.nio.file.StandardOpenOption.READ)
      // a corrupt/truncated part must not leak the just-opened channel:
      // the ctor throws before `cur` is assigned, so close() could
      // never reach it — close here and rethrow
      private val footer =
        try GraftColFile.readFooter(ch, file)
        catch { case e: Throwable => ch.close(); throw e }
      private val idx: Array[Int] = cellIndexOf(partCols)._1
      private val nChunks = footer.cols.length
      private val nameBytes = f.getBytes(StandardCharsets.UTF_8)
      private val dvArr: Array[Long] =
        dv.map(GraftLogDv.read(dir, _)).getOrElse(Array.empty)
      private val rangeEnd =
        if (length == Long.MaxValue) Long.MaxValue else start + length
      // range assignment (a block belongs to the range containing its
      // start offset) + footer-stats block skipping - the in-file
      // analogue of manifest file skipping, evaluated through the SAME
      // mayMatch as planning (rename trails, NaN degradation included)
      private val blocks = footer.blocks.filter { b =>
        b.offset >= start && b.offset < rangeEnd &&
          (blockFilters.isEmpty || {
            val pseudo = LogEntry(-1L, "add", f, b.rows,
              dataChange = true, b.stats,
              cols = if (partCols.nonEmpty) partCols else footer.cols)
            blockFilters.forall(fl =>
              GraftLogScan.mayMatch(tableSchema, pseudo, fl))
          })
      }
      private var bi = 0
      // per required field: plain cells OR a dict-index view whose
      // distinct values are decoded ONCE per block - a long is parsed
      // per DISTINCT, not per row, and string bytes are shared
      private var plainCells: Array[Array[String]] = _
      private var dIdx: Array[Array[Byte]] = _
      private var dNull: Array[Array[Boolean]] = _
      private var dLong: Array[Array[Long]] = _
      private var dInt: Array[Array[Int]] = _
      private var dDouble: Array[Array[Double]] = _
      private var dBytes: Array[Array[Array[Byte]]] = _
      // typed binary chunks: per-row values + null flags, no parsing
      private var bLong: Array[Array[Long]] = _
      private var bDouble: Array[Array[Double]] = _
      private var bNulls: Array[Array[Boolean]] = _
      private var rowIn = 0
      private var blockRows = 0
      private var firstOrd = 0L
      private var dvPtr = 0

      private def lowerBound(a: Array[Long], v: Long): Int = {
        var lo = 0; var hi = a.length
        while (lo < hi) {
          val m = (lo + hi) >>> 1
          if (a(m) < v) lo = m + 1 else hi = m
        }
        lo
      }

      private def isNullCell(s: String): Boolean =
        s.length == 1 && s.charAt(0) == '\u0000'

      private def loadBlock(): Boolean = {
        if (bi >= blocks.length) return false
        val b = blocks(bi); bi += 1
        // decode each DISTINCT projected chunk once (a duplicated
        // projection must not decompress twice)
        val byCi = idx.filter(ci => ci >= 0 && ci < nChunks).distinct
          .map(ci => ci -> GraftColFile.readChunk(ch, b, ci)).toMap
        val nJ = idx.length
        plainCells = new Array(nJ); dIdx = new Array(nJ)
        dNull = new Array(nJ); dLong = new Array(nJ)
        dInt = new Array(nJ); dDouble = new Array(nJ)
        dBytes = new Array(nJ)
        bLong = new Array(nJ); bDouble = new Array(nJ)
        bNulls = new Array(nJ)
        var j = 0
        while (j < nJ) {
          val ci = idx(j)
          if (ci >= 0 && ci < nChunks) byCi(ci) match {
            case GraftColFile.PlainChunk(cs) => plainCells(j) = cs
            case GraftColFile.LongsChunk(vs, ns) =>
              bLong(j) = vs; bNulls(j) = ns
            case GraftColFile.DoublesChunk(vs, ns) =>
              bDouble(j) = vs; bNulls(j) = ns
            case GraftColFile.LongDictChunk(dvs, dns, ix) =>
              // typed dict: the distinct values arrive as binary —
              // nothing to parse on the matching-type path. A
              // MISMATCHED required type goes through the canonical
              // text exactly like a plain chunk would (one render +
              // parse per DISTINCT), so the same cell fails or
              // converts identically whatever encoding the block
              // happened to choose — never a silent toInt truncation.
              dIdx(j) = ix; dNull(j) = dns
              def lText(d: Int): String = java.lang.Long.toString(dvs(d))
              tag(j) match {
                case 0 => dLong(j) = dvs
                case 1 => dInt(j) = Array.tabulate(dvs.length)(d =>
                  if (dns(d)) 0
                  else java.lang.Integer.parseInt(lText(d)))
                case 2 => dDouble(j) = Array.tabulate(dvs.length)(d =>
                  if (dns(d)) 0d
                  else java.lang.Double.parseDouble(lText(d)))
                case _ => dBytes(j) = Array.tabulate(dvs.length)(d =>
                  if (dns(d)) null
                  else lText(d).getBytes(StandardCharsets.UTF_8))
              }
            case GraftColFile.DoubleDictChunk(dvs, dns, ix) =>
              dIdx(j) = ix; dNull(j) = dns
              def dText(d: Int): String =
                java.lang.Double.toString(dvs(d))
              tag(j) match {
                case 2 => dDouble(j) = dvs
                case 0 => dLong(j) = Array.tabulate(dvs.length)(d =>
                  if (dns(d)) 0L
                  else java.lang.Long.parseLong(dText(d)))
                case 1 => dInt(j) = Array.tabulate(dvs.length)(d =>
                  if (dns(d)) 0
                  else java.lang.Integer.parseInt(dText(d)))
                case _ => dBytes(j) = Array.tabulate(dvs.length)(d =>
                  if (dns(d)) null
                  else dText(d).getBytes(StandardCharsets.UTF_8))
              }
            case GraftColFile.DictChunk(dict, ix) =>
              dIdx(j) = ix
              dNull(j) = dict.map(isNullCell)
              tag(j) match {
                case 0 => dLong(j) = dict.map(s =>
                  if (isNullCell(s)) 0L
                  else java.lang.Long.parseLong(s))
                case 1 => dInt(j) = dict.map(s =>
                  if (isNullCell(s)) 0
                  else java.lang.Integer.parseInt(s))
                case 2 => dDouble(j) = dict.map(s =>
                  if (isNullCell(s)) 0d
                  else java.lang.Double.parseDouble(s))
                case _ => dBytes(j) = dict.map(s =>
                  if (isNullCell(s)) null
                  else s.getBytes(StandardCharsets.UTF_8))
              }
          }
          j += 1
        }
        rowIn = 0
        blockRows = b.rows.toInt
        firstOrd = b.firstOrdinal
        dvPtr = lowerBound(dvArr, firstOrd)
        true
      }

      override def fill(vecs: Array[OnHeapColumnVector],
          max: Int): Int = {
        var r = 0
        while (r < max) {
          if (plainCells == null || rowIn >= blockRows) {
            if (!loadBlock()) return r
          }
          val ord = firstOrd + rowIn
          if (dvPtr < dvArr.length && dvArr(dvPtr) == ord) {
            dvPtr += 1; rowIn += 1
          } else {
            var j = 0
            while (j < tag.length) {
              val ci = idx(j)
              if (ci == -2) vecs(j).putByteArray(r, nameBytes)
              else if (ci == -3) vecs(j).putLong(r, ord)
              else if (ci < 0 || ci >= nChunks) vecs(j).putNull(r)
              else if (bLong(j) != null) {
                // binary integral chunk, served under the REQUIRED
                // type (an int→long/double-widened column reads old
                // files' values through the numeric conversion)
                if (bNulls(j)(rowIn)) vecs(j).putNull(r)
                else {
                  val v = bLong(j)(rowIn)
                  tag(j) match {
                    case 0 => vecs(j).putLong(r, v)
                    case 1 => vecs(j).putInt(r, v.toInt)
                    case 2 => vecs(j).putDouble(r, v.toDouble)
                    case _ => vecs(j).putByteArray(r,
                      java.lang.Long.toString(v)
                        .getBytes(StandardCharsets.UTF_8))
                  }
                }
              } else if (bDouble(j) != null) {
                if (bNulls(j)(rowIn)) vecs(j).putNull(r)
                else {
                  val v = bDouble(j)(rowIn)
                  tag(j) match {
                    case 2 => vecs(j).putDouble(r, v)
                    case 0 => vecs(j).putLong(r, v.toLong)
                    case 1 => vecs(j).putInt(r, v.toInt)
                    case _ => vecs(j).putByteArray(r,
                      java.lang.Double.toString(v)
                        .getBytes(StandardCharsets.UTF_8))
                  }
                }
              } else if (dIdx(j) != null) {
                val di = dIdx(j)(rowIn) & 0xff
                if (dNull(j)(di)) vecs(j).putNull(r)
                else tag(j) match {
                  case 0 => vecs(j).putLong(r, dLong(j)(di))
                  case 1 => vecs(j).putInt(r, dInt(j)(di))
                  case 2 => vecs(j).putDouble(r, dDouble(j)(di))
                  case _ => vecs(j).putByteArray(r, dBytes(j)(di))
                }
              } else {
                val cell = plainCells(j)(rowIn)
                if (isNullCell(cell))
                  vecs(j).putNull(r) // the null sentinel cell
                else tag(j) match {
                  case 0 => vecs(j).putLong(r,
                    java.lang.Long.parseLong(cell))
                  case 1 => vecs(j).putInt(r,
                    java.lang.Integer.parseInt(cell))
                  case 2 => vecs(j).putDouble(r,
                    java.lang.Double.parseDouble(cell))
                  case _ => vecs(j).putByteArray(r,
                    cell.getBytes(StandardCharsets.UTF_8))
                }
              }
              j += 1
            }
            rowIn += 1
            r += 1
          }
        }
        r
      }
      override def close(): Unit = ch.close()
    }

    final class LineCursor(f: String, cols: Seq[String],
        dv: Option[String]) extends Cursor {
      private val in = GraftLogReaderFactory.openLines(dir, f)
      private val ixNc = cellIndexOf(cols)
      private val idx: Array[Int] = ixNc._1
      private val nCells = math.max(ixNc._2, 1)
      private val bounds = new Array[Int](nCells + 2)
      private val nameBytes = f.getBytes(StandardCharsets.UTF_8)
      private val dvArr: Array[Long] =
        dv.map(GraftLogDv.read(dir, _)).getOrElse(Array.empty)
      private var dvPtr = 0
      private var ord = -1L

      /** Next non-DV'd line; null = done. `ord` always describes the
        * line just returned. EVERY line counts as a row — an empty
        * line IS a single-column empty-string cell (well-formed files
        * never yield spurious empties), and skipping it would both
        * drop the row and shift every later DV ordinal by one. */
      private def readLine(): String = {
        while (true) {
          val l = in.readLine()
          if (l == null) return null
          ord += 1
          if (dvPtr < dvArr.length && dvArr(dvPtr) == ord) dvPtr += 1
          else return l
        }
        null // unreachable
      }

      override def fill(vecs: Array[OnHeapColumnVector],
          max: Int): Int = {
        var r = 0
        var line = readLine()
        while (line != null) {
          // tab walk: cell ci spans (bounds(ci), bounds(ci+1))
          var nt = 0; var i = 0
          bounds(0) = -1
          val len = line.length
          while (i < len && nt < nCells) {
            if (line.charAt(i) == '\t') { nt += 1; bounds(nt) = i }
            i += 1
          }
          bounds(nt + 1) = len
          val cellCount = nt + 1
          var j = 0
          while (j < tag.length) {
            val ci = idx(j)
            if (ci == -2) vecs(j).putByteArray(r, nameBytes)
            else if (ci == -3) vecs(j).putLong(r, ord)
            else if (ci < 0 || ci >= cellCount) vecs(j).putNull(r)
            else {
              val s = bounds(ci) + 1; val e = bounds(ci + 1)
              if (e - s == 1 && line.charAt(s) == '\u0000')
                vecs(j).putNull(r) // the null sentinel cell
              else tag(j) match {
                case 0 => vecs(j).putLong(r,
                  java.lang.Long.parseLong(line, s, e, 10))
                case 1 => vecs(j).putInt(r,
                  java.lang.Integer.parseInt(line, s, e, 10))
                case 2 => vecs(j).putDouble(r,
                  java.lang.Double.parseDouble(line.substring(s, e)))
                case _ => vecs(j).putByteArray(r,
                  line.substring(s, e).getBytes(StandardCharsets.UTF_8))
              }
            }
            j += 1
          }
          r += 1
          if (r >= max) return r
          line = readLine()
        }
        r
      }
      override def close(): Unit = in.close()
    }

    new PartitionReader[ColumnarBatch] {
      private var fi = 0
      private var cur: Cursor = _
      private var batch: ColumnarBatch = _

      private def advance(): Boolean = {
        if (cur != null) return true
        if (fi >= files.size) return false
        val (f, cols, dv, start, length) = files(fi); fi += 1
        cur =
          if (GraftColFile.isCol(f))
            new GcolCursor(f, cols, dv, start, length)
          else {
            // mirror the row path's guard: LineCursor has no range
            // support, so a byte-range split reaching it would
            // re-read the whole legacy file once PER split and
            // silently duplicate rows N-fold
            require(start == 0L && length == Long.MaxValue,
              s"byte-range split of non-columnar part $f " +
                s"($start+$length) — the line path cannot honor ranges")
            new LineCursor(f, cols, dv)
          }
        true
      }

      override def next(): Boolean = {
        if (batch != null) { batch.close(); batch = null }
        while (advance()) {
          val vecs = required.fields.map(fd =>
            new OnHeapColumnVector(BatchRows, fd.dataType))
          val n = cur.fill(vecs, BatchRows)
          if (n == 0) {
            cur.close(); cur = null
            vecs.foreach(_.close())
          } else {
            batch = new ColumnarBatch(vecs.toArray[ColumnVector], n)
            return true
          }
        }
        false
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = {
        if (batch != null) { batch.close(); batch = null }
        if (cur != null) { cur.close(); cur = null }
      }
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case part: GraftLogPartition =>
        fileReader(part.dir, part.file, part.cols, part.dvFile,
          part.start, part.length)
      // a partition-value group: chain its files through one reader
      case g: GraftLogGroupPartition =>
        new PartitionReader[InternalRow] {
          private var i = 0
          private var cur: PartitionReader[InternalRow] = _
          override def next(): Boolean = {
            while (true) {
              if (cur == null) {
                if (i >= g.files.size) return false
                val (f, cols, dv) = g.files(i)
                cur = fileReader(g.dir, f, cols, dv)
                i += 1
              }
              if (cur.next()) return true
              cur.close(); cur = null
            }
            false // unreachable
          }
          override def get(): InternalRow = cur.get()
          override def close(): Unit = if (cur != null) cur.close()
        }
      case other => throw new IllegalArgumentException(
        s"unexpected partition $other")
    }

  private def fileReader(dir: String, file: String,
      partCols: Seq[String], dvFile: Option[String],
      start: Long = 0L,
      length: Long = Long.MaxValue): PartitionReader[InternalRow] =
    if (GraftColFile.isCol(file))
      gcolRowReader(dir, file, partCols, dvFile, start, length)
    else {
      // a legacy line part has no sub-file structure to split on —
      // a ranged partition reaching here would re-read the whole
      // file per split and silently duplicate rows N-fold
      require(start == 0L && length == Long.MaxValue,
        s"byte-range split of non-columnar part $file " +
          s"($start+$length) — the line path cannot honor ranges")
      lineRowReader(dir, file, partCols, dvFile)
    }

  /** Row reader over the NATIVE gcol blocks — the streaming source's
    * path: only PROJECTED chunks decompress (the line shim would
    * rebuild full rows and decode every column), deletion vectors and
    * `_pos` ride the footer's global ordinals, and dict chunks share
    * each distinct string across the block's rows. */
  private def gcolRowReader(dir: String, file: String,
      partCols: Seq[String], dvFile: Option[String],
      start: Long = 0L,
      length: Long = Long.MaxValue): PartitionReader[InternalRow] = {
    val f = new File(dir, file)
    val ch = java.nio.channels.FileChannel.open(
      f.toPath, java.nio.file.StandardOpenOption.READ)
    val fullFooter =
      try GraftColFile.readFooter(ch, f)
      catch { case e: Throwable => ch.close(); throw e }
    // honor a byte-range split exactly like the columnar cursor: a
    // block belongs to the range containing its start offset — so if
    // a ranged partition ever reaches the row path (columnar=false,
    // or a future fallback) it reads its share once, not the whole
    // file per split
    val rangeEnd =
      if (length == Long.MaxValue) Long.MaxValue else start + length
    val footer = fullFooter.copy(blocks = fullFooter.blocks.filter(
      b => b.offset >= start && b.offset < rangeEnd))
    val (cellIdx, _) = cellIndexOf(partCols)
    val nChunks = footer.cols.length
    val fileName = UTF8String.fromString(file)
    val dvArr: Array[Long] =
      dvFile.map(GraftLogDv.read(dir, _)).getOrElse(Array.empty)
    new PartitionReader[InternalRow] {
      private var bi = 0
      private var chunks: Array[GraftColFile.Chunk] = _
      private var rowIn = 0
      private var blockRows = 0
      private var firstOrd = 0L
      private var dvPtr = 0
      private var current: InternalRow = _

      private def loadBlock(): Boolean = {
        if (bi >= footer.blocks.length) return false
        val b = footer.blocks(bi); bi += 1
        val byCi = cellIdx.filter(ci => ci >= 0 && ci < nChunks)
          .distinct
          .map(ci => ci -> GraftColFile.readChunk(ch, b, ci)).toMap
        chunks = cellIdx.map(ci =>
          if (ci >= 0 && ci < nChunks) byCi(ci) else null)
        rowIn = 0
        blockRows = b.rows.toInt
        firstOrd = b.firstOrdinal
        // sorted DV consumed from the block's first global ordinal
        var lo = 0; var hi = dvArr.length
        while (lo < hi) {
          val m = (lo + hi) >>> 1
          if (dvArr(m) < firstOrd) lo = m + 1 else hi = m
        }
        dvPtr = lo
        true
      }

      override def next(): Boolean = {
        while (true) {
          if (chunks == null || rowIn >= blockRows) {
            if (!loadBlock()) return false
          }
          val ord = firstOrd + rowIn
          if (dvPtr < dvArr.length && dvArr(dvPtr) == ord) {
            dvPtr += 1; rowIn += 1
          } else {
            val vals = new Array[Any](required.fields.length)
            var j = 0
            while (j < vals.length) {
              val ci = cellIdx(j)
              if (ci == -2) vals(j) = fileName
              else if (ci == -3) vals(j) = java.lang.Long.valueOf(ord)
              else if (ci < 0 || ci >= nChunks) vals(j) = null
              else {
                val cell = chunks(j).cell(rowIn)
                vals(j) =
                  if (cell == GraftLog.NullCell) null
                  else required.fields(j).dataType match {
                    case LongType => java.lang.Long.valueOf(cell)
                    case IntegerType => java.lang.Integer.valueOf(cell)
                    case DoubleType => java.lang.Double.valueOf(cell)
                    case StringType => UTF8String.fromString(cell)
                    case other => throw new IllegalArgumentException(
                      s"graft-log does not decode $other")
                  }
              }
              j += 1
            }
            rowIn += 1
            current = new GenericInternalRow(vals)
            return true
          }
        }
        false // unreachable
      }
      override def get(): InternalRow = current
      override def close(): Unit = ch.close()
    }
  }

  private def lineRowReader(dir: String, file: String,
      partCols: Seq[String],
      dvFile: Option[String]): PartitionReader[InternalRow] = {
    // ONE projection map for both read paths — cellIndexOf carries
    // the schema-evolution and rename-trail resolution, so the row
    // reader (the streaming source's path) serves renamed columns
    // from pre-rename files exactly like the columnar batch path.
    val (cellIdx, _) = cellIndexOf(partCols)
    val fileName = UTF8String.fromString(file)
    val dvArr: Array[Long] =
      dvFile.map(GraftLogDv.read(dir, _)).getOrElse(Array.empty)
    new PartitionReader[InternalRow] {
      private val in = GraftLogReaderFactory.openLines(dir, file)
      private var current: InternalRow = _
      private var dvPtr = 0
      private var ord = -1L
      override def next(): Boolean = {
        var line: String = null
        var found = false
        while (!found) {
          line = in.readLine()
          if (line == null) return false
          // every line is a row (empty = single-column empty cell) —
          // same ordinal contract as the vectorized and line cursors
          ord += 1
          if (dvPtr < dvArr.length && dvArr(dvPtr) == ord) dvPtr += 1
          else found = true
        }
        val cells = line.split("\t", -1)
        // Decode ONLY the projected columns — column pruning's payoff
        // in a row format is skipped parsing (a columnar format would
        // skip the I/O too; the scan-level contract is the same).
        val vals = new Array[Any](required.fields.length)
        var j = 0
        while (j < vals.length) {
          val ci = cellIdx(j)
          if (ci == -2) { vals(j) = fileName; j += 1 }
          else if (ci == -3) { vals(j) = java.lang.Long.valueOf(ord); j += 1 }
          else {
          // ci >= cells.length = a cols-less entry read under a WIDER
          // schema (e.g. the typed feed's _change_type): NULL, same
          // as the columnar path's bounds guard
          val cell = if (ci < 0 || ci >= cells.length) GraftLog.NullCell
            else cells(ci)
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
  /** Line reader dispatching on extension: `.gcol` parts (current
    * writer) reconstruct TSV lines from the columnar blocks, `.gz`
    * parts (the pre-r10 writer) stream through GZIPInputStream, bare
    * `.tsv` (legacy tables) read plain — mixed-vintage tables read
    * file by file with no rewrite. */
  def openLines(dir: String, file: String): TextLines =
    if (GraftColFile.isCol(file))
      GraftColFile.lineReader(new File(dir, file))
    else {
      val raw = Files.newInputStream(Paths.get(dir, file))
      val in = if (file.endsWith(".gz")) new GZIPInputStream(raw) else raw
      val br =
        new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      new TextLines {
        override def readLine(): String = br.readLine()
        override def close(): Unit = br.close()
      }
    }
}
