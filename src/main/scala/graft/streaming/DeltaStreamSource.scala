package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.DeltaLog

/** `spark.readStream.format("graft-delta")` — a REAL Structured
  * Streaming source over the open Delta log, the `readStream
  * .format("delta")` the reference's bronze layer would use if its
  * Kafka topic were a lakehouse table
  * (reference: spark/streaming_bronze.py:71-77 reads a stream and
  * lands bronze; this source is the same contract with the LOG as
  * the offset authority).
  *
  * Spark-first by construction: this is the DataSource V2
  * [[MicroBatchStream]] API — Spark's OWN streaming engine drives
  * the lifecycle (offset tracking in the query checkpoint, batch
  * planning, task scheduling, recovery), and this class only answers
  * the three questions a source must: what is the latest offset
  * (the log's newest version), what files does a version range add
  * ([[DeltaLog.addedFilesIn]] — dataChange=false OPTIMIZE commits
  * contribute NOTHING, data-removing commits refuse loudly unless
  * `skipChangeCommits`), and how to read one file's rows on an
  * EXECUTOR (a parquet Group reader; one [[InputPartition]] per
  * file, so a 1000-file commit fans out across the cluster — the
  * driver only ever lists paths).
  *
  * Exactly-once: offsets are committed by the engine AFTER the sink,
  * so a crash replays the last batch into an idempotent sink —
  * exactly the [[DeltaLog.consumeChanges]] contract, now with
  * Spark's checkpoint machinery doing the bookkeeping (spec-held
  * restart proof in DeltaStreamSourceSpec).
  *
  * Scope (loud, not guessed): unmapped tables with primitive
  * columns; PARTITIONED tables stream too — each file's
  * log-recorded partitionValues ride its InputPartition and the
  * reader emits them as per-row constants. Options: `path`
  * (required), `skipChangeCommits` (default false),
  * `startingVersion` (default: all history), `maxVersionsPerTrigger`
  * (admission control).
  */
class DeltaStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-delta"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DeltaStreamSource.tableSchema(DeltaStreamSource.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DeltaStreamTable(schema,
      new CaseInsensitiveStringMap(properties))
}

private[streaming] object DeltaStreamSource {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-delta needs .option(\"path\", <tableDir>)")
    p
  }

  /** Schema from the log, restricted to the streaming scope: the
    * reader converts primitive leaves only, and refusing here beats
    * a task-side crash after the query started. */
  def tableSchema(tableDir: String): StructType = {
    val st = DeltaLog.replay(tableDir,
      DeltaLog.versions(tableDir).last)
    require(st.columnMapping.isEmpty,
      "graft-delta streams unmapped tables")
    st.schema.fields.foreach(f => require(f.dataType match {
      case LongType | IntegerType | DoubleType | FloatType |
           BooleanType | StringType | TimestampType |
           TimestampNTZType | DateType => true
      case _ => false
    }, s"graft-delta: unsupported streaming column type " +
      s"${f.dataType} for ${f.name}"))
    st.schema
  }
}

private class DeltaStreamTable(schema: StructType,
                               options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-delta:${DeltaStreamSource.pathOf(options)}"
  override def columns()
      : Array[org.apache.spark.sql.connector.catalog.Column] =
    schema.fields.map(f =>
      org.apache.spark.sql.connector.catalog.Column.create(
        f.name, f.dataType, f.nullable))
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new DeltaStreamScan(schema, options)
    }
}

private class DeltaStreamScan(schema: StructType,
                              options: CaseInsensitiveStringMap)
    extends Scan {
  override def readSchema(): StructType = schema
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new DeltaMicroBatchStream(schema,
      DeltaStreamSource.pathOf(options),
      options.getBoolean("skipChangeCommits", false),
      Option(options.get("startingVersion")).map(_.toLong),
      options.getLong("maxVersionsPerTrigger", Long.MaxValue),
      options.getLong("maxFilesPerTrigger", Long.MaxValue),
      options.getLong("maxBytesPerTrigger", Long.MaxValue))
}

/** The offset is (log version, files consumed WITHIN it) — Delta's
  * own streaming-source offset design: `index` counts how many of
  * `version`'s added files are already landed, so admission control
  * can SPLIT one huge backfill commit across micro-batches
  * (exactly-once is preserved because a committed version's file
  * list is immutable). A fully-consumed version is (v, nFiles(v)).
  * Legacy checkpoints wrote the bare version long (whole-commit
  * batches) — deserialized as (v, MaxValue) = fully consumed. */
private case class VersionOffset(version: Long,
                                 index: Long = Long.MaxValue)
    extends Offset {
  override def json(): String =
    s"""{"version":$version,"index":$index}"""
}

private object VersionOffset {
  private val Json =
    """\{"version":(-?\d+),"index":(-?\d+)\}""".r
  def parse(json: String): VersionOffset = json.trim match {
    case Json(v, i) => VersionOffset(v.toLong, i.toLong)
    case bare => VersionOffset(bare.toLong) // legacy: whole version
  }
}

private class DeltaMicroBatchStream(schema: StructType, tableDir: String,
                                    skipChangeCommits: Boolean,
                                    startingVersion: Option[Long],
                                    maxVersionsPerTrigger: Long,
                                    maxFilesPerTrigger: Long,
                                    maxBytesPerTrigger: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow: the engine asks the source to PIN the end
  // of the stream up front, then drains to exactly that point — a
  // commit racing the drain belongs to the next run
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(DeltaLog.versions(tableDir).last)

  override def initialOffset(): Offset =
    VersionOffset(startingVersion.map(_ - 1).getOrElse(-1L))

  override def latestOffset(): Offset =
    VersionOffset(availableNowCap
      .getOrElse(DeltaLog.versions(tableDir).last))

  // SupportsAdmissionControl spelling: ADMISSION CONTROL — a stream
  // catching up on a deep backlog must not plan its whole history as
  // one batch (at 100 TB that is thousands of commits of files in a
  // single task set, one sink transaction, no progress checkpoints).
  // maxVersionsPerTrigger caps versions per batch;
  // maxFilesPerTrigger / maxBytesPerTrigger go FINER and split
  // WITHIN a version (the Kafka maxOffsetsPerTrigger analog — one
  // 10k-file backfill commit drains in bounded batches, not one
  // giant task set). At least one file is always admitted so the
  // stream makes progress. AvailableNow still drains to the pinned
  // cap, just in bounded batches.
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val from = start.asInstanceOf[VersionOffset]
    val cap = latestOffset().asInstanceOf[VersionOffset].version
    // cap == from.version is NOT terminal: a file-capped batch can
    // leave the cap version partially consumed (index < nFiles) —
    // only a cap strictly behind the start version has nothing left
    if (cap < from.version) return from
    // addition-overflow guard: the default limit is Long.MaxValue
    val bounded =
      if (maxVersionsPerTrigger >= cap - from.version) cap
      else from.version + maxVersionsPerTrigger
    if (maxFilesPerTrigger == Long.MaxValue &&
        maxBytesPerTrigger == Long.MaxValue)
      return VersionOffset(bounded)
    // file/byte admission: walk the range's per-version file lists
    // (O(new commits) driver metadata) and stop at the first file
    // that would cross either cap — but never before admitting one
    val byV = DeltaLog.addedFilesByVersion(tableDir,
      from.version - 1, bounded, skipChangeCommits, Some(schema))
    var endV = from.version
    var endI = from.index
    var nFiles = 0L
    var nBytes = 0L
    var stop = false
    byV.foreach { case (v, fs) =>
      if (!stop) {
        var i =
          if (v == from.version)
            math.min(from.index, fs.size.toLong).toInt
          else 0
        endV = v
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
    }
    if (nFiles == 0) from else VersionOffset(endV, endI)
  }

  override def deserializeOffset(json: String): Offset =
    VersionOffset.parse(json)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset]
    val e = end.asInstanceOf[VersionOffset]
    // one partition PER FILE: a commit that added 1000 files fans
    // out as 1000 tasks — the driver never touches row data. Each
    // partition carries the file's log-recorded partitionValues so
    // the reader reconstructs partition columns as constants. The
    // boundary versions honor the offsets' in-version file indexes
    // (a split backfill commit reads each file exactly once).
    DeltaLog.addedFilesByVersion(tableDir, s.version - 1, e.version,
        skipChangeCommits, Some(schema))
      .flatMap { case (v, fs) =>
        val lo =
          if (v == s.version) math.min(s.index, fs.size.toLong).toInt
          else 0
        val hi =
          if (v == e.version) math.min(e.index, fs.size.toLong).toInt
          else fs.size
        fs.slice(lo, hi)
      }
      .map(f =>
        DeltaFilePartition(f.path, f.partitionValues): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DeltaFileReaderFactory(schema.json)
}

private case class DeltaFilePartition(path: String,
    partitionValues: Map[String, String] = Map.empty)
  extends InputPartition

object DeltaStreamQueries {
  /** q192 — STREAMING READ OF THE OPEN LOG: drain the append/OPTIMIZE
    * lifecycle table through `readStream.format("graft-delta")`
    * (Trigger.AvailableNow, parquet sink, Spark-checkpointed offsets)
    * and return the landed rows. The result equals full orders IFF
    * the source delivered each append exactly once AND kept the
    * OPTIMIZE commit silent — a source that leaked the compaction
    * doubles every row; one that lost a commit drops a third of
    * them; both hash-mismatch. This is the real DSv2 MicroBatchStream
    * executing under Spark's own streaming engine, not a batch
    * emulation. */
  def deltaStreamRead(spark: org.apache.spark.sql.SparkSession,
                      dir: String): org.apache.spark.sql.DataFrame = {
    val t = DeltaLog.ordersAppendCompactTable(spark, dir)
    val work = java.nio.file.Files
      .createTempDirectory("graft_dstream").toString
    spark.readStream.format("graft-delta").option("path", t).load()
      .writeStream.format("parquet")
      .option("path", s"$work/data")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    spark.read.parquet(s"$work/data")
      .orderBy(org.apache.spark.sql.functions.col("o_orderkey"))
  }

  val deltaStreamReadSql: String =
    """SELECT * FROM orders ORDER BY o_orderkey"""

  /** q195 — STREAMING LAKEHOUSE ETL, EXACTLY-ONCE BOTH ENDS: the
    * medallion bronze→silver hop entirely over the open format
    * (reference: spark/batch_silver.py filters/projects bronze into
    * silver; here the hop is STREAMING). Source = the DSv2
    * graft-delta stream (offsets in Spark's checkpoint); transform =
    * filter + projection; sink = [[DeltaLog.commitAppendIdempotent]]
    * keyed by the micro-batch id, so a batch REDELIVERED after a
    * crash between sink commit and engine checkpoint is skipped by
    * the txn watermark — end-to-end exactly-once with both formats'
    * own machinery, no external coordinator
    * (DeltaStreamSourceSpec holds the planted-crash proof). The
    * result must hash-equal the batch-transformed oracle: a source
    * that duplicated a commit, a sink that re-applied a batch, or a
    * transform that drifted from batch semantics all mismatch. */
  def deltaStreamEtl(spark: org.apache.spark.sql.SparkSession,
                     dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val src = DeltaLog.ordersAppendCompactTable(spark, dir)
    val work = java.nio.file.Files
      .createTempDirectory("graft_detl").toString
    val silver = s"$work/silver"
    spark.readStream.format("graft-delta").option("path", src).load()
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                       id: Long) =>
        if (!batch.isEmpty)
          DeltaLog.commitAppendIdempotent(
            batch, silver, "silver-etl", id): Unit
      }
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    DeltaLog.read(spark, silver)
      .orderBy(col("o_orderkey"))
  }

  val deltaStreamEtlSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_orderstatus = 'O'
      |ORDER BY o_orderkey""".stripMargin

  /** q196 — STREAMING A PARTITIONED TABLE: the partition column
    * exists only in the LOG's per-file partitionValues (the data
    * files are written without it), so the stream reader must emit
    * it as a per-file CONSTANT reconstructed from the add action —
    * a reader that ignored partitionValues NULLs the status column
    * for every row and hash-mismatches the full-orders oracle. */
  def deltaStreamPartitioned(spark: org.apache.spark.sql.SparkSession,
                             dir: String): org.apache.spark.sql.DataFrame = {
    val t = DeltaLog.ordersPartitionedTable(spark, dir)
    val work = java.nio.file.Files
      .createTempDirectory("graft_dpart").toString
    spark.readStream.format("graft-delta").option("path", t).load()
      .writeStream.format("parquet")
      .option("path", s"$work/data")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    spark.read.parquet(s"$work/data")
      .orderBy(org.apache.spark.sql.functions.col("o_orderkey"))
  }

  val deltaStreamPartitionedSql: String =
    """SELECT * FROM orders ORDER BY o_orderkey"""
}

/** Executor-side reader: parquet Group API → [[InternalRow]].
  * Column lookup resolves BY FIELD ID first (when `fieldIds` maps
  * the table's ids and the file carries parquet ids — the Iceberg
  * rule, which survives renames) and falls back BY NAME (the
  * unmapped-Delta rule). A column absent from an older file reads
  * NULL — the same schema-on-read rule the batch scan applies. */
private class DeltaFileReaderFactory(schemaJson: String,
    fieldIds: Map[String, Int] = Map.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val file = partition.asInstanceOf[DeltaFilePartition].path
    // partition columns live only in the table's metadata — their
    // per-file value arrives with the partition and is emitted as a
    // CONSTANT for every row of the file (string-decoded once here,
    // exactly what Spark's own PartitioningAwareFileIndex does)
    val constants: Map[String, Any] = {
      val pv = partition.asInstanceOf[DeltaFilePartition].partitionValues
      schema.fields.flatMap { f =>
        pv.get(f.name).map { s =>
          f.name -> (if (s == null) null else f.dataType match {
            case LongType => s.toLong
            case IntegerType => s.toInt
            case DoubleType => s.toDouble
            case FloatType => s.toFloat
            case BooleanType => s.toBoolean
            case StringType => UTF8String.fromString(s)
            case DateType =>
              // Delta partitionValues stringify dates as yyyy-MM-dd;
              // Iceberg identity manifest tuples stringify the avro
              // date logical type as its epoch-day INT — accept both
              if (s.matches("-?\\d+")) s.toInt
              else java.time.LocalDate.parse(s).toEpochDay.toInt
            case other => throw new IllegalArgumentException(
              s"unsupported partition column type $other for ${f.name}")
          })
        }
      }.toMap
    }
    new PartitionReader[InternalRow] {
      private val reader = ParquetReader
        .builder(new GroupReadSupport(), new Path(file)).build()
      private var current: org.apache.parquet.example.data.Group = _
      // table-field → file-field index, computed ONCE per file
      // (-1 = absent); id match wins over name match
      private var idx: Array[Int] = _
      private def fieldIdx(
          ft: org.apache.parquet.schema.GroupType): Array[Int] =
        schema.fields.map { f =>
          val byId = fieldIds.get(f.name).flatMap { id =>
            ft.getFields.asScala.zipWithIndex.collectFirst {
              case (t, i) if t.getId != null &&
                t.getId.intValue == id => i
            }
          }
          byId.getOrElse(
            if (ft.containsField(f.name)) ft.getFieldIndex(f.name)
            else -1)
        }
      override def next(): Boolean = {
        current = reader.read()
        current != null
      }
      override def get(): InternalRow = {
        val fileType = current.getType
        if (idx == null) idx = fieldIdx(fileType)
        val vals = schema.fields.zipWithIndex.map { case (f, j) =>
          val i = idx(j)
          if (constants.contains(f.name)) constants(f.name)
          else if (i < 0) null
          else {
            if (current.getFieldRepetitionCount(i) == 0) null
            else f.dataType match {
              case LongType => current.getLong(i, 0)
              case IntegerType => current.getInteger(i, 0)
              case DoubleType => current.getDouble(i, 0)
              case FloatType => current.getFloat(i, 0)
              case BooleanType => current.getBoolean(i, 0)
              case StringType =>
                UTF8String.fromBytes(current.getBinary(i, 0).getBytes)
              // Spark's default parquet timestamp is INT96 (julian
              // day + nanos-of-day, little-endian); newer writers
              // use INT64 micros — decode either to internal micros
              case TimestampType | TimestampNTZType =>
                val prim = fileType.getType(i).asPrimitiveType()
                  .getPrimitiveTypeName
                if (prim == org.apache.parquet.schema.PrimitiveType
                      .PrimitiveTypeName.INT96) {
                  val buf = java.nio.ByteBuffer
                    .wrap(current.getInt96(i, 0).getBytes)
                    .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                  val nanosOfDay = buf.getLong
                  val julianDay = buf.getInt
                  (julianDay - 2440588).toLong * 86400000000L +
                    nanosOfDay / 1000L
                } else current.getLong(i, 0)
              case DateType => current.getInteger(i, 0)
              case other => throw new IllegalArgumentException(
                s"graft-delta reader: unsupported type $other")
            }
          }
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = reader.close()
    }
  }
}
