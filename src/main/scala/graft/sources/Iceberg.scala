package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Minimal reader/writer for the OPEN Apache Iceberg table layout —
  * the Delta twin of [[DeltaLog]] (the north star names both formats;
  * reference: the lakehouse's open-table-format tier).
  *
  * The public layout this module speaks (Iceberg spec, Hadoop-catalog
  * convention):
  *
  *   table/metadata/v<N>.metadata.json   table metadata: schema,
  *       snapshot list, current-snapshot-id; one IMMUTABLE file per
  *       commit — the log is the metadata.json chain, not a delta log
  *   table/metadata/version-hint.text    current N (Hadoop catalog's
  *       pointer; absent → highest vN wins)
  *   snapshot.manifest-list              an AVRO file enumerating the
  *       snapshot's manifests (manifest_path, length, spec id, ...)
  *   manifest files                      AVRO files enumerating data
  *       files: status (1=ADDED/0=EXISTING live, 2=DELETED),
  *       data_file{file_path, file_format, record_count, size}
  *
  * Both metadata hops are avro + JSON read DRIVER-SIDE with the plain
  * avro library (on Spark's classpath) — exactly what an Iceberg
  * client's planning phase does: metadata cost scales with manifest
  * count, never data size. The data read is a plain parquet scan of
  * the live files, so pushdown/pruning apply unchanged.
  *
  * Scope (documented, deliberate): format-version 1, unpartitioned
  * tables (partition pruning through an open log is proven on the
  * Delta side — [[DeltaLog.readWhere]]), parquet data files, the
  * required manifest fields only (no column stats/bounds, no delete
  * files — those are v2 row-level features; [[read]] `require`s
  * format-version 1 so a table needing them fails loudly). Snapshot
  * ids are sequential, not random: deterministic for the oracle gate,
  * legal per the spec (any unique long).
  *
  * Cited reference behavior: spark/batch_silver.py:152-164 (open-
  * format table writes), spark/load_warehouse.py:73-87 (warehouse
  * loads that a format-agnostic reader would replace). */
object Iceberg {

  private val mapper = new ObjectMapper()

  private def metaDir(tableDir: String) = s"$tableDir/metadata"

  // ---------------------------------------------------------------
  // Avro shapes (required fields of the spec's manifest-list and
  // manifest entry records)
  // ---------------------------------------------------------------

  private val manifestFileSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null}
      |]}""".stripMargin)

  // lower/upper bounds ride as the spec's field-id → single-value-
  // serialized bytes pairs (avro spells non-string-key maps as arrays
  // of key/value records)
  private val manifestEntrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"},
      |{"name":"lower_bounds","type":["null",{"type":"array","items":
      |{"type":"record","name":"k_v","fields":[
      |{"name":"key","type":"int"},{"name":"value","type":"bytes"}]}}],
      |"default":null},
      |{"name":"upper_bounds","type":["null",{"type":"array","items":"k_v"}],
      |"default":null}
      |]}}]}""".stripMargin)

  private def writeAvro(path: String, schema: Schema,
                        records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(path))
    try records.foreach(w.append) finally w.close()
  }

  /** Read every record of an avro file, BY NAME field access (a real
    * client's files carry more fields and their own order). */
  private def readAvro(path: String): Seq[GenericRecord] = {
    val r = new DataFileReader[GenericRecord](
      new File(stripFileUri(path)),
      new GenericDatumReader[GenericRecord]())
    try { val b = Seq.newBuilder[GenericRecord]
      while (r.hasNext) b += r.next(); b.result() }
    finally r.close()
  }

  private def stripFileUri(p: String): String =
    if (p.startsWith("file:")) p.stripPrefix("file:") else p

  // ---------------------------------------------------------------
  // Schema conversion (Iceberg JSON schema <-> Spark StructType)
  // ---------------------------------------------------------------

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  private def icebergTypeToSpark(t: String): DataType = t match {
    case "boolean"                  => BooleanType
    case "int"                      => IntegerType
    case "long"                     => LongType
    case "float"                    => FloatType
    case "double"                   => DoubleType
    case "date"                     => DateType
    case "timestamp"                => TimestampNTZType // no zone
    case "timestamptz"              => TimestampType
    case "string"                   => StringType
    case "binary"                   => BinaryType
    case DecimalRe(p, s)            => DecimalType(p.toInt, s.toInt)
    case other => throw new IllegalArgumentException(
      s"unsupported Iceberg type '$other' (reader speaks the v1 " +
        "primitives; nested/uuid/fixed types out of scope)")
  }

  private def sparkTypeToIceberg(t: DataType): String = t match {
    case BooleanType        => "boolean"
    case IntegerType        => "int"
    case ShortType | ByteType => "int"
    case LongType           => "long"
    case FloatType          => "float"
    case DoubleType         => "double"
    case DateType           => "date"
    case TimestampNTZType   => "timestamp"
    case TimestampType      => "timestamptz"
    case StringType         => "string"
    case BinaryType         => "binary"
    case d: DecimalType     => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(
      s"unsupported Spark type $other for Iceberg v1 export")
  }

  private def schemaFromMetadata(meta: ObjectNode): StructType = {
    // v1 writes "schema"; v2 moved to "schemas" + current-schema-id —
    // accept both spellings (v1 tables written by newer clients carry
    // both)
    val schemaNode =
      if (meta.has("schema")) meta.get("schema")
      else {
        val id = meta.get("current-schema-id").asInt
        meta.get("schemas").elements().asScala
          .find(_.get("schema-id").asInt == id)
          .getOrElse(throw new IllegalArgumentException(
            s"current-schema-id $id not in schemas list"))
      }
    StructType(schemaNode.get("fields").elements().asScala.map { f =>
      StructField(f.get("name").asText,
        icebergTypeToSpark(f.get("type").asText),
        nullable = !f.get("required").asBoolean)
    }.toSeq)
  }

  private def schemaToJson(schema: StructType): ObjectNode = {
    val s = mapper.createObjectNode()
    s.put("type", "struct").put("schema-id", 0)
    val fields = s.putArray("fields")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fn = fields.addObject()
      fn.put("id", i + 1).put("name", f.name)
        .put("required", !f.nullable)
        .put("type", sparkTypeToIceberg(f.dataType))
    }
    s
  }

  // ---------------------------------------------------------------
  // Metadata chain
  // ---------------------------------------------------------------

  /** Committed metadata versions, ascending (the vN of
    * `metadata/v<N>.metadata.json`). */
  def versions(tableDir: String): Seq[Int] =
    Option(new File(metaDir(tableDir)).listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".metadata.json") =>
        n.stripPrefix("v").stripSuffix(".metadata.json") }
      .collect { case n if n.forall(_.isDigit) => n.toInt }
      .sorted.toSeq

  /** Current metadata version: `version-hint.text` if present (the
    * Hadoop catalog's pointer), else the highest vN on disk. */
  private def currentVersion(tableDir: String): Int = {
    val hint = new File(metaDir(tableDir), "version-hint.text")
    if (hint.isFile)
      new String(Files.readAllBytes(hint.toPath), "UTF-8").trim.toInt
    else {
      val vs = versions(tableDir)
      require(vs.nonEmpty, s"no metadata/v*.metadata.json under $tableDir")
      vs.last
    }
  }

  private def loadMetadata(tableDir: String, v: Int): ObjectNode = {
    val f = new File(metaDir(tableDir), s"v$v.metadata.json")
    require(f.isFile, s"missing metadata file ${f.getPath}")
    val meta = mapper.readTree(
      new String(Files.readAllBytes(f.toPath), "UTF-8"))
      .asInstanceOf[ObjectNode]
    val fv = meta.get("format-version").asInt
    require(fv == 1,
      s"unsupported Iceberg format-version $fv (reader supports 1: " +
        "no delete files / row-level v2 features)")
    meta
  }

  /** Snapshot ids recorded in the current metadata, ascending. */
  def snapshotIds(tableDir: String): Seq[Long] = {
    val meta = loadMetadata(tableDir, currentVersion(tableDir))
    meta.get("snapshots").elements().asScala
      .map(_.get("snapshot-id").asLong).toSeq.sorted
  }

  /** Test seam: manifest avro files the last read planned over. */
  @volatile private[graft] var lastManifestsRead: Int = 0

  /** Test seam: data files the last read handed to the scan (after
    * any bounds pruning) — the q145/q104 files-scanned discipline. */
  @volatile private[graft] var lastFilesPlanned: Int = 0

  /** One planned data file: path + the manifest's per-field-id value
    * bounds (absent for files/columns without stats — which then
    * never prune, the superset contract). */
  private case class PlannedFile(path: String,
      lower: Map[Int, Array[Byte]], upper: Map[Int, Array[Byte]])

  private def boundsMap(df: GenericRecord,
                        field: String): Map[Int, Array[Byte]] =
    df.getSchema.getField(field) match {
      case null => Map.empty
      case _ => Option(df.get(field)) match {
        case None => Map.empty
        case Some(arr: java.util.Collection[_]) =>
          arr.asScala.map { kv =>
            val r = kv.asInstanceOf[GenericRecord]
            val buf = r.get("value").asInstanceOf[java.nio.ByteBuffer]
            val bytes = new Array[Byte](buf.remaining())
            buf.duplicate().get(bytes)
            r.get("key").asInstanceOf[Int] -> bytes
          }.toMap
        case _ => Map.empty
      }
    }

  /** Live data files of snapshot `snapshotId`: manifest-list hop,
    * then each manifest's entries with status != 2 (DELETED). Both
    * hops are driver-side metadata reads. */
  private def planFiles(tableDir: String, meta: ObjectNode,
                        snapshotId: Long): Seq[PlannedFile] = {
    val snap = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong == snapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $snapshotId not in metadata (have " +
          s"${snapshotIds(tableDir).mkString(",")})"))
    val manifests = readAvro(snap.get("manifest-list").asText)
      .map(_.get("manifest_path").toString)
    lastManifestsRead = manifests.size
    manifests.flatMap { m =>
      readAvro(m).flatMap { e =>
        val status = e.get("status").asInstanceOf[Int]
        if (status == 2) None // DELETED — not part of this snapshot
        else {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val fmt = df.get("file_format").toString
          require(fmt.equalsIgnoreCase("PARQUET"),
            s"unsupported data file format $fmt")
          Some(PlannedFile(df.get("file_path").toString,
            boundsMap(df, "lower_bounds"), boundsMap(df, "upper_bounds")))
        }
      }
    }
  }

  /** Latest snapshot (current-snapshot-id of the current metadata). */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val meta = loadMetadata(tableDir, currentVersion(tableDir))
    readSnapshotFrom(spark, tableDir, meta,
      meta.get("current-snapshot-id").asLong)
  }

  /** Time travel: the table exactly as of `snapshotId` — every
    * snapshot in the metadata's list stays addressable, the spec's
    * time-travel contract. */
  def readSnapshot(spark: SparkSession, tableDir: String,
                   snapshotId: Long): DataFrame = {
    val meta = loadMetadata(tableDir, currentVersion(tableDir))
    readSnapshotFrom(spark, tableDir, meta, snapshotId)
  }

  private def readSnapshotFrom(spark: SparkSession, tableDir: String,
      meta: ObjectNode, snapshotId: Long): DataFrame =
    scanPlanned(spark, schemaFromMetadata(meta),
      planFiles(tableDir, meta, snapshotId))

  private def scanPlanned(spark: SparkSession, schema: StructType,
                          files: Seq[PlannedFile]): DataFrame = {
    lastFilesPlanned = files.size
    if (files.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema)
    else
      spark.read.schema(schema).parquet(
        files.map(f => stripFileUri(f.path)).sorted: _*)
  }

  /** Iceberg's single-value serialization for `long`: 8 bytes
    * little-endian. The only bound type this engine writes/prunes on
    * (documented scope — long key/measure columns are where range
    * skipping pays). */
  private def longBound(bytes: Array[Byte]): Option[Long] =
    if (bytes.length != 8) None
    else Some(java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)

  /** Column name → field id from the metadata schema (external
    * tables carry their own ids — never assume position). */
  private def fieldIds(meta: ObjectNode): Map[String, Int] = {
    val schemaNode =
      if (meta.has("schema")) meta.get("schema")
      else meta.get("schemas").elements().asScala
        .find(_.get("schema-id").asInt == meta.get("current-schema-id").asInt)
        .get
    schemaNode.get("fields").elements().asScala
      .map(f => f.get("name").asText -> f.get("id").asInt).toMap
  }

  /** RANGE-PRUNED read of the latest snapshot: keep only files whose
    * manifest [lower, upper] bounds can intersect every `(col, lo,
    * hi)` range — Iceberg data skipping, decided driver-side over
    * manifest rows exactly as an Iceberg client's planner does.
    * Superset contract (the Snapshots.pruneFiles / DeltaLog.readWhere
    * discipline): a file or column WITHOUT bounds never prunes, false
    * positives cost a file read, false negatives cannot happen —
    * callers re-apply the exact predicate. [[lastFilesPlanned]]
    * records the surviving file count for spec ceilings. */
  def readPrunedRange(spark: SparkSession, tableDir: String,
                      ranges: Seq[(String, Long, Long)]): DataFrame = {
    val meta = loadMetadata(tableDir, currentVersion(tableDir))
    val ids = fieldIds(meta)
    ranges.foreach { case (c, _, _) =>
      require(ids.contains(c), s"no column '$c' in table schema") }
    val files = planFiles(tableDir, meta,
      meta.get("current-snapshot-id").asLong)
    val kept = files.filter { f =>
      ranges.forall { case (c, lo, hi) =>
        val id = ids(c)
        (f.lower.get(id).flatMap(longBound),
          f.upper.get(id).flatMap(longBound)) match {
          case (Some(mn), Some(mx)) => mn <= hi && mx >= lo
          case _ => true // no stats can never prove no match
        }
      }
    }
    scanPlanned(spark, schemaFromMetadata(meta), kept)
  }

  // ---------------------------------------------------------------
  // Writer (overwrite/append snapshots through the metadata chain)
  // ---------------------------------------------------------------

  /** Driver-side parquet footer read — metadata, never a scan: the
    * record count the spec requires per data file, plus min/max of
    * every top-level INT64 column (merged across row groups) for the
    * manifest's value bounds. One footer open serves both. */
  private def parquetFooter(path: String): (Long, Map[String, (Long, Long)]) = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val bounds = scala.collection.mutable.Map.empty[String, (Long, Long)]
      r.getFooter.getBlocks.asScala.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          val isLong = c.getPrimitiveType.getPrimitiveTypeName ==
            org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
          val st = c.getStatistics
          if (isLong && c.getPath.size == 1 && st != null &&
            !st.isEmpty && st.hasNonNullValue) {
            val name = c.getPath.toDotString
            val mn = st.genericGetMin.asInstanceOf[java.lang.Long].longValue
            val mx = st.genericGetMax.asInstanceOf[java.lang.Long].longValue
            val merged = bounds.get(name)
              .map { case (a, b2) => (math.min(a, mn), math.max(b2, mx)) }
              .getOrElse((mn, mx))
            bounds(name) = merged
          }
        }
      }
      (r.getRecordCount, bounds.toMap)
    } finally r.close()
  }

  private def longBoundBytes(v: Long): java.nio.ByteBuffer = {
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(v); b.flip(); b
  }

  private def manifestEntry(path: String, status: Int,
                            ids: Map[String, Int]): GenericRecord = {
    val dfSchema = manifestEntrySchema.getField("data_file").schema()
    val kvSchema = dfSchema.getField("lower_bounds").schema()
      .getTypes.get(1).getElementType
    val df = new GenericData.Record(dfSchema)
    df.put("file_path", path)
    df.put("file_format", "PARQUET")
    val (rows, bounds) = parquetFooter(path)
    df.put("record_count", rows)
    df.put("file_size_in_bytes", new File(path).length())
    val known = bounds.toSeq
      .flatMap { case (name, b) => ids.get(name).map(id => (id, b)) }
      .sortBy(_._1)
    def kvs(pick: ((Long, Long)) => Long): java.util.List[GenericRecord] =
      known.map { case (id, b) =>
        val r = new GenericData.Record(kvSchema)
        r.put("key", id)
        r.put("value", longBoundBytes(pick(b)))
        r: GenericRecord
      }.asJava
    if (known.nonEmpty) {
      df.put("lower_bounds", kvs(_._1))
      df.put("upper_bounds", kvs(_._2))
    }
    val e = new GenericData.Record(manifestEntrySchema)
    e.put("status", status)
    e.put("snapshot_id", null)
    e.put("data_file", df)
    e
  }

  private def commit(df: DataFrame, tableDir: String,
                     overwrite: Boolean): Long = {
    Files.createDirectories(Paths.get(metaDir(tableDir)))
    val vs = versions(tableDir)
    val v = if (vs.isEmpty) 1 else vs.last + 1
    val prevMeta = if (vs.isEmpty) None else Some(loadMetadata(tableDir, vs.last))
    prevMeta.foreach { m =>
      val prevSchema = schemaFromMetadata(m)
      require(prevSchema == StructType(df.schema.fields.map(f =>
          StructField(f.name, f.dataType, f.nullable))),
        s"schema mismatch: table has $prevSchema, commit has ${df.schema}")
    }
    val snapshotId: Long = prevMeta.map(
      _.get("snapshots").elements().asScala
        .map(_.get("snapshot-id").asLong).maxOption.getOrElse(0L))
      .getOrElse(0L) + 1L
    // data files
    val sub = s"data/part-${java.util.UUID.randomUUID}"
    df.write.parquet(s"$tableDir/$sub")
    val parts = Option(new File(tableDir, sub).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    // one new manifest for the added files
    val manifestPath =
      s"${metaDir(tableDir)}/snap-$snapshotId-m0.avro"
    val colIds = df.schema.fields.zipWithIndex
      .map { case (f, i) => f.name -> (i + 1) }.toMap
    writeAvro(manifestPath, manifestEntrySchema,
      parts.map(f => manifestEntry(f.getPath, 1, colIds)).toSeq)
    // manifest list: append keeps the prior snapshot's manifests (its
    // files stay EXISTING); overwrite references only the new one
    // carried-forward manifests KEEP their original added_snapshot_id
    // — incremental readers diff snapshots by exactly that field
    val prevManifests: Seq[(String, Long, Any)] =
      if (overwrite || prevMeta.isEmpty) Seq.empty
      else {
        val curId = prevMeta.get.get("current-snapshot-id").asLong
        val curSnap = prevMeta.get.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong == curId).get
        readAvro(curSnap.get("manifest-list").asText)
          .map(r => (r.get("manifest_path").toString,
            r.get("manifest_length").asInstanceOf[Long],
            r.get("added_snapshot_id")))
      }
    val listPath =
      s"${metaDir(tableDir)}/snap-$snapshotId-manifest-list.avro"
    val listRecords = (prevManifests :+
      (manifestPath, new File(manifestPath).length(),
        snapshotId: Any)).map {
        case (p, len, addedBy) =>
          val r = new GenericData.Record(manifestFileSchema)
          r.put("manifest_path", p)
          r.put("manifest_length", len)
          r.put("partition_spec_id", 0)
          r.put("added_snapshot_id", addedBy)
          r
      }
    writeAvro(listPath, manifestFileSchema, listRecords)
    // new metadata json: full snapshot history + the new snapshot
    val meta = mapper.createObjectNode()
    meta.put("format-version", 1)
    meta.put("table-uuid", java.util.UUID.nameUUIDFromBytes(
      tableDir.getBytes("UTF-8")).toString)
    meta.put("location", tableDir)
    meta.put("last-updated-ms", 0L)
    meta.put("last-column-id", df.schema.fields.length)
    meta.set[ObjectNode]("schema", schemaToJson(df.schema))
    val specs = meta.putArray("partition-specs")
    specs.addObject().put("spec-id", 0).putArray("fields")
    meta.put("default-spec-id", 0)
    meta.putObject("properties")
    meta.put("current-snapshot-id", snapshotId)
    val snaps: ArrayNode = meta.putArray("snapshots")
    prevMeta.foreach(_.get("snapshots").elements().asScala
      .foreach(s => snaps.add(s)))
    val sn = snaps.addObject()
    sn.put("snapshot-id", snapshotId)
    sn.put("timestamp-ms", 0L)
    sn.putObject("summary").put("operation",
      if (overwrite) "overwrite" else "append")
    sn.put("manifest-list", listPath)
    // publish: tmp + hard-link CAS like the Delta commit (metadata
    // files are immutable; losing the race means another writer owns
    // vN — no retry here, callers of the gated builders never race)
    val tmp = Files.createTempFile(
      Paths.get(metaDir(tableDir)), s".v$v-", ".json.tmp")
    Files.write(tmp,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(meta)
        .getBytes("UTF-8"))
    try Files.createLink(
      Paths.get(metaDir(tableDir), s"v$v.metadata.json"), tmp)
    finally Files.deleteIfExists(tmp)
    // version-hint is advisory (reader falls back to max vN)
    val hint = Files.createTempFile(
      Paths.get(metaDir(tableDir)), ".hint-", ".tmp")
    Files.write(hint, v.toString.getBytes("UTF-8"))
    Files.move(hint, Paths.get(metaDir(tableDir), "version-hint.text"),
      StandardCopyOption.ATOMIC_MOVE)
    snapshotId
  }

  /** Commit `df` as a new snapshot REPLACING the table contents
    * (overwrite: the new manifest list references only the new
    * manifest). Returns the snapshot id. */
  def commitOverwrite(df: DataFrame, tableDir: String): Long =
    commit(df, tableDir, overwrite = true)

  /** Commit `df` as a new snapshot APPENDING to the table (the new
    * manifest list carries the previous snapshot's manifests plus one
    * new manifest). Returns the snapshot id. */
  def commitAppend(df: DataFrame, tableDir: String): Long =
    commit(df, tableDir, overwrite = false)

  /** INCREMENTAL APPEND SCAN — Iceberg's snapshot-diff read (the
    * [[DeltaLog.changesSince]] twin): rows of data files ADDED by
    * snapshots in (`fromSnapshotExclusive`, `toSnapshot`], each
    * tagged `_snapshot_id`. Planning is pure metadata: the `to`
    * snapshot's manifest-list names each manifest's
    * `added_snapshot_id`, so the diff is a filter over manifest rows
    * — never a data diff. Every snapshot in the range must be an
    * `append` (the spec's contract for incremental reads: an
    * overwrite in the range means removed rows the diff cannot
    * express — refused loudly, exactly as Iceberg's own incremental
    * scan refuses). Within a selected manifest only status=ADDED
    * entries count; EXISTING entries were carried forward from an
    * earlier snapshot and would double-read. */
  def readIncremental(spark: SparkSession, tableDir: String,
      fromSnapshotExclusive: Long, toSnapshot: Long): DataFrame = {
    val meta = loadMetadata(tableDir, currentVersion(tableDir))
    val snaps = meta.get("snapshots").elements().asScala.toSeq
    val inRange = snaps.filter { s =>
      val id = s.get("snapshot-id").asLong
      id > fromSnapshotExclusive && id <= toSnapshot
    }
    require(inRange.exists(_.get("snapshot-id").asLong == toSnapshot),
      s"snapshot $toSnapshot not in metadata after $fromSnapshotExclusive")
    inRange.foreach { s =>
      val op = Option(s.get("summary"))
        .flatMap(su => Option(su.get("operation"))).map(_.asText)
      require(op.contains("append"),
        s"snapshot ${s.get("snapshot-id").asLong} is ${op.getOrElse("?")} " +
          "— incremental read is defined only over appends")
    }
    val ids = inRange.map(_.get("snapshot-id").asLong).toSet
    val toSnap = snaps.find(_.get("snapshot-id").asLong == toSnapshot).get
    val manifests = readAvro(toSnap.get("manifest-list").asText)
      .flatMap { r =>
        Option(r.get("added_snapshot_id"))
          .map(_.asInstanceOf[Long])
          .filter(ids.contains)
          .map(sid => (r.get("manifest_path").toString, sid))
      }
    lastManifestsRead = manifests.size
    val schema = schemaFromMetadata(meta)
    val parts = manifests.map { case (m, sid) =>
      val files = readAvro(m).flatMap { e =>
        if (e.get("status").asInstanceOf[Int] != 1) None // ADDED only
        else Some(e.get("data_file").asInstanceOf[GenericRecord]
          .get("file_path").toString)
      }
      scanPlanned(spark, schema, files.map(p =>
          PlannedFile(p, Map.empty, Map.empty)))
        .withColumn("_snapshot_id", org.apache.spark.sql.functions.lit(sid))
    }
    parts.reduceOption(_ unionByName _).getOrElse {
      import org.apache.spark.sql.types.{LongType, StructField}
      spark.createDataFrame(java.util.Collections.emptyList[Row](),
        StructType(schema.fields :+
          StructField("_snapshot_id", LongType, nullable = false)))
    }
  }

  /** Every path a snapshot's plan touches: its manifest-list, its
    * manifests, and every data file its manifest entries name —
    * INCLUDING status=DELETED entries (they reference the path even
    * though the snapshot does not read it; treating them as live is
    * the superset that can only under-delete, never break a read). */
  private def snapshotRefs(snap: com.fasterxml.jackson.databind.JsonNode)
      : Set[String] = {
    val ml = snap.get("manifest-list").asText
    val manifests = readAvro(ml).map(_.get("manifest_path").toString)
    (Set(ml) ++ manifests ++ manifests.flatMap { m =>
      readAvro(m).map(_.get("data_file").asInstanceOf[GenericRecord]
        .get("file_path").toString)
    }).map(stripFileUri)
  }

  /** EXPIRE SNAPSHOTS — Iceberg's retention maintenance (the
    * [[DeltaLog.vacuum]] twin): drop all but the newest `keepLast`
    * snapshots from the metadata and delete every manifest-list,
    * manifest, and data file referenced ONLY by expired snapshots.
    * Publishes a new metadata version (the normal commit path — the
    * metadata chain stays append-only and auditable); older
    * vN.metadata.json files survive, but time travel to an expired
    * snapshot fails on its missing manifests rather than reading
    * wrong data — Iceberg's own contract. The current snapshot is
    * always retained. Returns the deleted paths.
    *
    * Scale: pure driver-side metadata work — reference counting over
    * manifest rows, proportional to manifests+files, never data. */
  def expireSnapshots(tableDir: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val v = currentVersion(tableDir)
    val meta = loadMetadata(tableDir, v)
    val snaps = meta.get("snapshots").elements().asScala.toSeq
    if (snaps.size <= keepLast) return Seq.empty
    val (expired, kept) = snaps.splitAt(snaps.size - keepLast)
    val curId = meta.get("current-snapshot-id").asLong
    require(kept.exists(_.get("snapshot-id").asLong == curId),
      s"retention $keepLast would expire the CURRENT snapshot $curId")
    val keepRefs = kept.flatMap(snapshotRefs).toSet
    val dead = expired.flatMap(snapshotRefs).toSet -- keepRefs
    // publish the trimmed metadata BEFORE deleting files: a reader
    // racing the expire sees either the old metadata with files
    // intact or the new one that never names them
    val next = meta.deepCopy[ObjectNode]()
    val arr = next.putArray("snapshots")
    kept.foreach(arr.add)
    val tmp = Files.createTempFile(
      Paths.get(metaDir(tableDir)), s".v${v + 1}-", ".json.tmp")
    Files.write(tmp,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(next)
        .getBytes("UTF-8"))
    try Files.createLink(
      Paths.get(metaDir(tableDir), s"v${v + 1}.metadata.json"), tmp)
    finally Files.deleteIfExists(tmp)
    val hint = Files.createTempFile(
      Paths.get(metaDir(tableDir)), ".hint-", ".tmp")
    Files.write(hint, (v + 1).toString.getBytes("UTF-8"))
    Files.move(hint, Paths.get(metaDir(tableDir), "version-hint.text"),
      StandardCopyOption.ATOMIC_MOVE)
    dead.toSeq.sorted.filter(p => Files.deleteIfExists(Paths.get(p)))
  }

  // ---------------------------------------------------------------
  // Gated queries (q147/q148)
  // ---------------------------------------------------------------

  /** Session-cached two-snapshot Iceberg table over the orders
    * testdata: snapshot 1 = even order keys, snapshot 2 = OVERWRITE
    * with odd keys — the q128/q129 twin, so the two open formats are
    * gated by the same semantics. */
  private[graft] def ordersIcebergTable(spark: SparkSession,
                                        dir: String): String =
    DeltaLog.cachedTable(spark, dir, "iceberg") { (o, t) =>
      import org.apache.spark.sql.functions.{lit, pmod}
      commitOverwrite(o.filter(pmod(col("o_orderkey"), lit(2)) === 0), t)
      commitOverwrite(o.filter(pmod(col("o_orderkey"), lit(2)) === 1), t)
    }

  /** q147 — ICEBERG READ (latest): plan through
    * metadata.json → manifest-list avro → manifest avro and scan the
    * live files. Equals the odd half of orders iff the second
    * overwrite snapshot's manifest list replaced the first. */
  def icebergRead(spark: SparkSession, dir: String): DataFrame =
    read(spark, ordersIcebergTable(spark, dir))
      .orderBy(col("o_orderkey"))

  val icebergReadSql: String =
    """SELECT * FROM orders WHERE o_orderkey % 2 = 1 ORDER BY o_orderkey"""

  /** q148 — ICEBERG TIME TRAVEL: pins snapshot 1 (the even half),
    * proving every snapshot in the metadata stays addressable. */
  def icebergTimeTravel(spark: SparkSession, dir: String): DataFrame =
    readSnapshot(spark, ordersIcebergTable(spark, dir), 1L)
      .orderBy(col("o_orderkey"))

  val icebergTimeTravelSql: String =
    """SELECT * FROM orders WHERE o_orderkey % 2 = 0 ORDER BY o_orderkey"""

  /** Session-cached APPEND-lifecycle Iceberg table: three appends
    * (order keys mod 3) — the [[DeltaLog.commitAppend]] twin. Each
    * append's manifest-list carries the prior snapshot's manifests
    * plus one new manifest, so the read plans over all three. */
  private[graft] def ordersIcebergAppendTable(spark: SparkSession,
                                              dir: String): String =
    DeltaLog.cachedTable(spark, dir, "icebergapp") { (o, t) =>
      import org.apache.spark.sql.functions.{lit, pmod}
      (0 to 2).foreach { m =>
        commitAppend(o.filter(pmod(col("o_orderkey"), lit(3)) === m), t)
      }
    }

  /** q153 — ICEBERG APPEND READBACK: reading the third append
    * snapshot must return the union of all three appends — an append
    * whose manifest-list dropped a prior manifest, or a planner that
    * read only the newest manifest, loses a third of the rows and
    * hash-mismatches. IcebergSpec separately asserts the latest plan
    * touches exactly 3 manifests and expiration keeps it readable. */
  def icebergAppendRead(spark: SparkSession, dir: String): DataFrame =
    read(spark, ordersIcebergAppendTable(spark, dir))
      .orderBy(col("o_orderkey"))

  val icebergAppendReadSql: String =
    """SELECT * FROM orders ORDER BY o_orderkey"""

  /** q156 — ICEBERG INCREMENTAL READ: the snapshot-diff over the
    * append lifecycle's last two snapshots. Each consumed row is
    * tagged with the snapshot that appended it (keys ≡ id−1 mod 3 by
    * construction); snapshot 1's rows must NOT appear even though its
    * manifest rides in snapshot 3's manifest-list — the
    * added_snapshot_id filter is the gate. */
  def icebergIncrementalRead(spark: SparkSession, dir: String): DataFrame =
    readIncremental(spark, ordersIcebergAppendTable(spark, dir),
        fromSnapshotExclusive = 1L, toSnapshot = 3L)
      .orderBy(col("o_orderkey"))

  val icebergIncrementalReadSql: String =
    """SELECT o.*, o_orderkey % 3 + 1 AS _snapshot_id
      |FROM orders o WHERE o_orderkey % 3 <> 0
      |ORDER BY o_orderkey""".stripMargin

  /** q151's probe range: keys are dense from 0 at every SF, so the
    * range covers the low tail of a range-clustered layout — most
    * files' bounds exclude it entirely. */
  private[graft] val PruneKeyLo = 100L
  private[graft] val PruneKeyHi = 999L

  /** Session-cached RANGE-CLUSTERED Iceberg table: orders
    * `repartitionByRange(8)` on the key before the snapshot commit,
    * so each data file's manifest bounds span a disjoint key slice —
    * the layout that makes bounds pruning pay (the q100→q104
    * cluster-then-skip shape, here through the open format's own
    * stats). */
  private[graft] def ordersIcebergRangeTable(spark: SparkSession,
                                             dir: String): String =
    DeltaLog.cachedTable(spark, dir, "icebergr") { (o, t) =>
      commitOverwrite(o.repartitionByRange(8, col("o_orderkey")), t)
    }

  /** q151 — ICEBERG BOUNDS-PRUNED READ: a key-range predicate is
    * answered by [[readPrunedRange]], which drops files whose
    * manifest lower/upper bounds exclude the range before the scan
    * exists — Iceberg data skipping end-to-end (footer stats →
    * manifest bounds → planner pruning). The oracle is the plain
    * full-table filter, so pruning that dropped a matching file
    * hash-mismatches; IcebergSpec bounds files-planned via the seam. */
  def icebergPrunedRead(spark: SparkSession, dir: String): DataFrame =
    readPrunedRange(spark, ordersIcebergRangeTable(spark, dir),
        Seq(("o_orderkey", PruneKeyLo, PruneKeyHi)))
      .filter(col("o_orderkey").between(PruneKeyLo, PruneKeyHi))
      .orderBy(col("o_orderkey"))

  val icebergPrunedReadSql: String =
    s"""SELECT * FROM orders
       |WHERE o_orderkey BETWEEN $PruneKeyLo AND $PruneKeyHi
       |ORDER BY o_orderkey""".stripMargin
}
