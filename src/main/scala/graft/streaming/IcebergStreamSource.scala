package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.Iceberg

/** `spark.readStream.format("graft-iceberg")` — the
  * [[DeltaStreamProvider]] twin over the Iceberg metadata chain:
  * SNAPSHOT IDS are the offsets, batch planning is the snapshot-diff
  * manifest walk ([[Iceberg.addedFilesIn]] — each append snapshot's
  * own manifest-list names its new manifest, only status=ADDED
  * entries count), and the shared executor-side Group reader
  * resolves columns BY PARQUET FIELD ID — so a stream over a RENAMED
  * table reads pre-rename files correctly, something a by-name
  * reader cannot do. Non-append snapshots refuse loudly unless
  * `skipOverwriteSnapshots` (Iceberg's own
  * streaming-skip-overwrite-snapshots escape hatch).
  *
  * Options: `path` (required), `skipOverwriteSnapshots` (default
  * false), `startingSnapshotId` (exclusive; a snapshot id or `latest`;
  * default 0 = full history), `maxSnapshotsPerTrigger`, `maxFilesPerTrigger` /
  * `maxBytesPerTrigger` (admission control that SPLITS within a
  * snapshot — offsets are (snapshotId, fileIndex); manifest byte
  * sizes are the byte currency), `vectorizedRead` (default true —
  * ColumnarBatch emission), `filter` (a SQL predicate the planner
  * prunes files with — identity partition tuples + manifest value
  * bounds, [[StreamFilter]]; the query must still `.filter(...)` the
  * same predicate for exactness), `branch` (stream a named BRANCH's
  * lineage instead of published main — the WAP auditor's view;
  * after `fastForward` the same checkpoint continues on main with no
  * re-delivery, offsets being snapshot ids). Scope: primitive columns;
  * identity-PARTITIONED tables stream too — each file's manifest
  * tuple rides its InputPartition and the reader emits the stripped
  * partition columns as per-row constants (q197). Only snapshots
  * reachable from the MAIN branch head stream (WAP-staged branches
  * and rolled-back snapshots are unpublished history); a mid-stream
  * schema change (new/retyped field id) fails the stream loudly,
  * while metadata-only renames stream through. */
class IcebergStreamProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-iceberg"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IcebergStreamSource.checkedSchema(
      IcebergStreamSource.pathOf(options))._1

  // writes hand the DataFrame's own schema + partitionBy transforms
  // to getTable (new tables have no metadata to infer from)
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new IcebergStreamTable(schema,
      new CaseInsensitiveStringMap(properties), partitioning)
}

private[streaming] object IcebergStreamSource {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-iceberg needs .option(\"path\", <tableDir>)")
    p
  }

  def checkedSchema(tableDir: String): (StructType, Map[String, Int]) = {
    val (schema, ids) = Iceberg.streamSchema(tableDir)
    schema.fields.foreach(f => require(f.dataType match {
      case LongType | IntegerType | DoubleType | FloatType |
           BooleanType | StringType | TimestampType |
           TimestampNTZType | DateType => true
      case _ => false
    }, s"graft-iceberg: unsupported streaming column type " +
      s"${f.dataType} for ${f.name}"))
    (schema, ids)
  }

  /** The schema-change signature (see [[IcebergMicroBatchStream]]'s
    * guard): (field id → type shape) when the table resolves by
    * field id — renames keep it stable — falling back to
    * (name → type shape) on name-mapped tables. */
  def schemaSig(tableDir: String): Map[String, String] = {
    val (sch, ids) = Iceberg.streamSchema(tableDir)
    if (ids.nonEmpty)
      ids.map { case (n, id) =>
        id.toString ->
          graft.sources.DeltaLog.schemaShape(sch(n).dataType).json }
    else
      sch.fields.map(f =>
        f.name -> graft.sources.DeltaLog.schemaShape(f.dataType).json)
        .toMap
  }

  def requireUnchangedSchema(tableDir: String,
                             startSig: Map[String, String]): Unit =
    require(schemaSig(tableDir) == startSig,
      s"the schema of $tableDir CHANGED mid-stream (a field id was " +
        "added, dropped or retyped) — streaming on would silently " +
        "drop the new columns under the query-start schema. Restart " +
        "the query to pick up the evolved schema (files written " +
        "before the change read NULL for new columns).")
}

private class IcebergStreamTable(schema: StructType,
                                 options: CaseInsensitiveStringMap,
                                 declaredPartitioning: Array[Transform] =
                                   Array.empty)
    extends Table with SupportsRead with OpenFormatMetadata
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def dataSchema: StructType = schema
  override def name(): String =
    s"graft-iceberg:${IcebergStreamSource.pathOf(options)}"
  override def columns()
      : Array[org.apache.spark.sql.connector.catalog.Column] =
    schema.fields.map(f =>
      org.apache.spark.sql.connector.catalog.Column.create(
        f.name, f.dataType, f.nullable))
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE).asJava

  /** The METADATA's identity spec as transforms once the table
    * exists (the DataFrameWriter validates partitionBy against
    * this); a table with no metadata yet reports whatever the write
    * declared. */
  override def partitioning(): Array[Transform] = {
    val dir = IcebergStreamSource.pathOf(options)
    val fromMeta = scala.util.Try {
      if (graft.sources.Iceberg.versions(dir).isEmpty)
        Seq.empty[(String, String)]
      else graft.sources.Iceberg.currentSpecFields(dir)
    }.getOrElse(Seq.empty)
    if (fromMeta.nonEmpty)
      fromMeta.collect { case (c, "identity") =>
        org.apache.spark.sql.connector.expressions.Expressions
          .identity(c): Transform
      }.toArray
    else declaredPartitioning
  }

  /** `df.write.format("graft-iceberg")` — the native DSv2 write
    * ([[IcebergDsv2WriteBuilder]]): partitionBy(...) arrives as
    * identity transforms (derived transforms write through
    * [[graft.sources.Iceberg.commitAppendHidden]]). */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val partCols = declaredPartitioning.toSeq.map { t =>
      require(t.name == "identity" && t.references.length == 1 &&
          t.references()(0).fieldNames.length == 1,
        s"graft-iceberg write: unsupported partition transform $t — " +
          "derived transforms write through Iceberg.commitAppendHidden")
      t.references()(0).fieldNames()(0)
    }
    new IcebergDsv2WriteBuilder(IcebergStreamSource.pathOf(options),
      info, partCols)
  }
  // one builder serves both surfaces: batch planning gets pushdown
  // (filters/columns/statistics/runtime filters — BatchRead.scala),
  // streaming scans delegate to [[IcebergStreamScan]] untouched
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new OpenFormatScanBuilder((pushed, required, limit) =>
      IcebergBatchScan(schema, options, pushed, required, limit))
}

private class IcebergStreamScan(schema: StructType,
                                options: CaseInsensitiveStringMap)
    extends Scan {
  override def readSchema(): StructType = schema
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new IcebergMicroBatchStream(schema,
      IcebergStreamSource.pathOf(options),
      options.getBoolean("skipOverwriteSnapshots", false),
      Option(options.get("startingSnapshotId")),
      options.getLong("maxSnapshotsPerTrigger", Long.MaxValue),
      options.getLong("maxFilesPerTrigger", Long.MaxValue),
      options.getLong("maxBytesPerTrigger", Long.MaxValue),
      options.getBoolean("vectorizedRead", true),
      Option(options.get("filter")),
      Option(options.get("branch")))
}

/** The offset is (snapshot id, files consumed WITHIN it) — the
  * [[VersionOffset]] twin (ids are monotonic in this writer; the
  * snapshot-diff planner keys on them exactly as
  * [[Iceberg.consumeIncremental]] does). `index` lets admission
  * control SPLIT one huge append snapshot across micro-batches (a
  * committed snapshot's manifest is immutable, so exactly-once
  * holds). Legacy checkpoints wrote the bare id — deserialized as
  * fully consumed. */
private case class SnapshotOffset(snapshotId: Long,
                                  index: Long = Long.MaxValue)
    extends Offset {
  override def json(): String =
    s"""{"snapshotId":$snapshotId,"index":$index}"""
}

private object SnapshotOffset {
  private val Json =
    """\{"snapshotId":(-?\d+),"index":(-?\d+)\}""".r
  def parse(json: String): SnapshotOffset = json.trim match {
    case Json(s, i) => SnapshotOffset(s.toLong, i.toLong)
    case bare => SnapshotOffset(bare.toLong) // legacy: whole snapshot
  }
}

private class IcebergMicroBatchStream(schema: StructType,
                                      tableDir: String,
                                      skipOverwriteSnapshots: Boolean,
                                      startingSnapshotId: Option[String],
                                      maxSnapshotsPerTrigger: Long,
                                      maxFilesPerTrigger: Long,
                                      maxBytesPerTrigger: Long,
                                      vectorizedRead: Boolean = true,
                                      filterSql: Option[String] = None,
                                      branch: Option[String] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // the `filter` option's prune-safe decomposition, built once at
  // query start (fails loudly on unparseable SQL)
  private val pruner = StreamFilter.pruner(filterSql, schema)

  // SCHEMA CHANGES FAIL LOUDLY: Iceberg schema evolution is a
  // metadata-version bump, not a snapshot, so it never appears
  // "inside" an offset range — instead each trigger compares the
  // table's CURRENT schema signature with the query-start one. The
  // signature is (field id → type shape) when the table resolves by
  // field id — so a RENAME (same ids, same types, the q193 lifecycle)
  // streams straight through, while an ADD COLUMN fails the stream
  // with a restart message rather than silently dropping the new
  // column under the stale schema. Name-mapped tables fall back to
  // (name → type shape).
  private val startSig: Map[String, String] =
    IcebergStreamSource.schemaSig(tableDir)
  private def requireUnchangedSchema(): Unit =
    IcebergStreamSource.requireUnchangedSchema(tableDir, startSig)

  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(Iceberg.streamHead(tableDir, branch))

  // "latest" = backfill the existing table with one batch read and
  // stream only snapshots committed after query start
  override def initialOffset(): Offset = startingSnapshotId match {
    case Some("latest") =>
      SnapshotOffset(Iceberg.streamHead(tableDir, branch))
    case Some(s) =>
      // descriptive refusal for every malformed spelling, overflow
      // included (the shared startingVersion discipline)
      val parsed = scala.util.Try(s.toLong).toOption
        .filter(_ => s.nonEmpty && s.forall(_.isDigit))
      require(parsed.isDefined,
        "graft-iceberg: startingSnapshotId must be a snapshot id " +
          s"or 'latest', got '$s'")
      SnapshotOffset(parsed.get)
    case None => SnapshotOffset(0L)
  }

  override def latestOffset(): Offset =
    SnapshotOffset(availableNowCap
      .getOrElse(Iceberg.streamHead(tableDir, branch)))

  // admission control — the [[DeltaMicroBatchStream]] rationale: a
  // deep backlog drains in bounded batches, not one giant task set;
  // maxFilesPerTrigger / maxBytesPerTrigger split WITHIN a snapshot
  // (manifest byte sizes are the currency), at least one file always
  // admitted so the stream makes progress
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val from = start.asInstanceOf[SnapshotOffset]
    val cap = latestOffset().asInstanceOf[SnapshotOffset].snapshotId
    if (cap < from.snapshotId) return from
    val bounded =
      if (maxSnapshotsPerTrigger >= cap - from.snapshotId) cap
      else from.snapshotId + maxSnapshotsPerTrigger
    if (maxFilesPerTrigger == Long.MaxValue &&
        maxBytesPerTrigger == Long.MaxValue)
      return SnapshotOffset(bounded)
    // LAZY walk: stopping the iterator stops the manifest reads too,
    // so a deep backlog costs O(admitted snapshots) per trigger
    val byS = Iceberg.addedFilesSnapshotIterator(tableDir,
      from.snapshotId - 1, bounded, skipOverwriteSnapshots, branch)
    var endS = from.snapshotId
    var endI = from.index
    var nFiles = 0L
    var nBytes = 0L
    var stop = false
    while (!stop && byS.hasNext) {
      val (s, fs) = byS.next()
      var i =
        if (s == from.snapshotId)
          math.min(from.index, fs.size.toLong).toInt
        else 0
      endS = s
      endI = i.toLong
      while (i < fs.size && !stop) {
        if (nFiles > 0 && (nFiles + 1 > maxFilesPerTrigger ||
            nBytes + fs(i).size > maxBytesPerTrigger)) stop = true
        else {
          nFiles += 1
          nBytes += fs(i).size
          i += 1
          endI = i.toLong
        }
      }
    }
    if (nFiles == 0) from else SnapshotOffset(endS, endI)
  }

  override def deserializeOffset(json: String): Offset =
    SnapshotOffset.parse(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    requireUnchangedSchema()
    val s = start.asInstanceOf[SnapshotOffset]
    val e = end.asInstanceOf[SnapshotOffset]
    val planned = Iceberg.addedFilesBySnapshot(tableDir, s.snapshotId - 1,
        e.snapshotId, skipOverwriteSnapshots, branch)
      .flatMap { case (sid, fs) =>
        val lo =
          if (sid == s.snapshotId)
            math.min(s.index, fs.size.toLong).toInt
          else 0
        val hi =
          if (sid == e.snapshotId)
            math.min(e.index, fs.size.toLong).toInt
          else fs.size
        fs.slice(lo, hi)
      }
    // the `filter` option's per-file pruning — identity partition
    // tuples + manifest value bounds, AFTER the offsets are fixed
    // (pruning changes what is read, never the (snapshot, index)
    // bookkeeping, so replay is identical with or without it)
    val kept = pruner match {
      case Some(p) => planned.filter(f => p.keep(f.partitionValues, f.bounds))
      case None => planned
    }
    StreamFilter.record(tableDir, s"$s..$e", planned.size, kept.size)
    kept
      .map(f =>
        DeltaFilePartition(f.path, f.partitionValues): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val (_, ids) = IcebergStreamSource.checkedSchema(tableDir)
    new DeltaFileReaderFactory(schema.json, ids,
      columnar = vectorizedRead)
  }
}

object IcebergStreamQueries {
  /** q193 — STREAMING READ OF THE METADATA CHAIN, POST-RENAME: drain
    * the renamed lifecycle table (even keys appended, column renamed
    * metadata-only, odd keys appended under the new name) through
    * `readStream.format("graft-iceberg")`. The landed rows equal
    * full orders with the `priority` column IFF the snapshot-diff
    * planner delivered both appends exactly once AND the
    * executor-side reader resolved the PRE-rename files by parquet
    * field id — a by-name reader NULLs the renamed column for half
    * the table and hash-mismatches. */
  def icebergStreamRead(spark: org.apache.spark.sql.SparkSession,
                        dir: String): org.apache.spark.sql.DataFrame = {
    val t = Iceberg.ordersIcebergRenameTable(spark, dir)
    val work = java.nio.file.Files
      .createTempDirectory("graft_istream").toString
    spark.readStream.format("graft-iceberg").option("path", t).load()
      .writeStream.format("parquet")
      .option("path", s"$work/data")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    spark.read.parquet(s"$work/data")
      .orderBy(org.apache.spark.sql.functions.col("o_orderkey"))
  }

  val icebergStreamReadSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  o_orderdate, o_orderpriority AS priority
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q197 — STREAMING AN IDENTITY-PARTITIONED ICEBERG TABLE: the
    * partition column exists only in each file's manifest tuple
    * (data files land hive-style without it), so the snapshot-diff
    * planner must hand the tuple to the reader and the reader must
    * emit it as a per-row constant — a planner that dropped the
    * tuple NULLs the status column for every row and
    * hash-mismatches the full-orders oracle. */
  def icebergStreamPartitioned(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val t = Iceberg.ordersIcebergPartAppendTable(spark, dir)
    val work = java.nio.file.Files
      .createTempDirectory("graft_ipart").toString
    spark.readStream.format("graft-iceberg").option("path", t).load()
      .writeStream.format("parquet")
      .option("path", s"$work/data")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    spark.read.parquet(s"$work/data")
      .orderBy(org.apache.spark.sql.functions.col("o_orderkey"))
  }

  val icebergStreamPartitionedSql: String =
    """SELECT * FROM orders ORDER BY o_orderkey"""

  /** q203 — STREAMING THE WAP AUDIT BRANCH: the pre-publish staged
    * table (evens committed on main, odds staged onto `audit`, NO
    * fast-forward) drains with `branch=audit` — the auditor's view.
    * The result equals FULL orders IFF the ancestry walk followed
    * the branch ref's lineage (branch head → staged snapshot → main
    * base): a walk from main's head misses the odds; one that
    * ignored ancestry and took every snapshot would also pull
    * unrelated staged/rolled-back ids on richer histories
    * (spec-held); and the offset cap at the BRANCH head (not max id)
    * is what lets a later fastForward hand the main stream these
    * same snapshots without loss (IcebergStreamSourceSpec). */
  def icebergBranchStream(spark: org.apache.spark.sql.SparkSession,
                          dir: String): org.apache.spark.sql.DataFrame = {
    val t = Iceberg.ordersIcebergWapStageTable(spark, dir)
    val work = java.nio.file.Files
      .createTempDirectory("graft_ibranch").toString
    spark.readStream.format("graft-iceberg").option("path", t)
      .option("branch", "audit").load()
      .writeStream.format("parquet")
      .option("path", s"$work/data")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    spark.read.parquet(s"$work/data")
      .orderBy(org.apache.spark.sql.functions.col("o_orderkey"))
  }

  val icebergBranchStreamSql: String =
    """SELECT * FROM orders ORDER BY o_orderkey"""
}
