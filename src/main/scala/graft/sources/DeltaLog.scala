package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}

/** Minimal reader/writer for the OPEN Delta Lake transaction-log
  * format (the public protocol: a `_delta_log/` directory of
  * zero-padded `<version>.json` commit files, each line one action —
  * `protocol`, `metaData`, `add`, `remove`, `commitInfo`), plus an
  * export from [[Snapshots]] tables into that layout.
  *
  * The reference pipeline is a *Delta* lakehouse (reference:
  * spark/batch_silver.py:152-164 writes silver as Delta;
  * spark/batch_gold.py:156-157 relies on its atomic overwrite).
  * [[Snapshots]] reproduces those semantics Delta-free; this module
  * closes the remaining *format* distance: tables whose commit history
  * is spelled exactly as the open spec spells it — readable by any
  * Delta client and produced/consumed here with no Delta jars.
  *
  * Scope (documented, deliberate): JSON commits plus parquet
  * CHECKPOINTS ([[checkpoint]] writes the spec's one-row-per-action
  * shape + `_last_checkpoint`; session-backed replays seed from it
  * and read only the JSON tail — O(commits since checkpoint), the
  * reason the format has checkpoints at all). No deletion vectors, no
  * column mapping: those are `protocol`-gated features, and [[replay]]
  * `require`s minReaderVersion == 1 so a log that needs them fails
  * loudly instead of reading wrong data.
  *
  * Scale: log replay is DRIVER-SIDE over commit files — metadata
  * proportional to file count, never data size; this is exactly what
  * Delta's own client does (its driver materializes the add-file list
  * from the log/checkpoint). The data read itself is a plain parquet
  * scan of the active files, so Catalyst pushdown/pruning apply
  * unchanged. Partitioned tables reconstruct partition columns from
  * `add.partitionValues` as per-group literal columns — one read per
  * distinct partition tuple, unioned; at real partition counts a
  * production reader would hand Spark a partitioned FileIndex, but
  * the semantics (values from the LOG, not from paths) are the spec's.
  */
object DeltaLog {

  private val mapper = new ObjectMapper()

  private def logDir(tableDir: String) = s"$tableDir/_delta_log"

  private def commitFile(tableDir: String, v: Long) =
    new File(logDir(tableDir), f"$v%020d.json")

  /** Committed versions, ascending — the sorted numeric names of the
    * `<version>.json` files under `_delta_log`. */
  def versions(tableDir: String): Seq[Long] =
    Option(new File(logDir(tableDir)).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".json"))
      .map(_.getName.stripSuffix(".json").toLong)
      .sorted.toSeq

  /** Replayed state of the table at `version`: the latest metaData
    * and the active (added, never since removed) files. */
  private[graft] case class State(
      schema: StructType, partitionColumns: Seq[String],
      addPartitionValues: Map[String, Map[String, String]]) {
    def files: Seq[String] = addPartitionValues.keys.toSeq.sorted
  }

  /** Test seam: JSON commit files the last replay actually read —
    * a checkpoint-seeded replay reads only the tail. */
  @volatile private[graft] var lastJsonCommitsRead: Int = 0

  private class Replayer {
    var schema: StructType = null
    var partCols: Seq[String] = Seq.empty
    // insertion-ordered so `files` ties break deterministically
    val adds = scala.collection.mutable.LinkedHashMap
      .empty[String, Map[String, String]]
    def applyLine(line: String): Unit = {
      val node = mapper.readTree(line)
      if (node.has("protocol")) {
        val r = node.get("protocol").get("minReaderVersion").asInt
        require(r == 1,
          s"unsupported Delta minReaderVersion $r (reader supports 1: " +
            "no deletion vectors / column mapping)")
      }
      if (node.has("metaData")) {
        val md = node.get("metaData")
        schema = DataType.fromJson(md.get("schemaString").asText)
          .asInstanceOf[StructType]
        partCols = md.get("partitionColumns").elements().asScala
          .map(_.asText).toSeq
      }
      if (node.has("add")) {
        val a = node.get("add")
        val pv =
          if (a.has("partitionValues"))
            a.get("partitionValues").properties().asScala
              .map(e => e.getKey -> e.getValue.asText).toMap
          else Map.empty[String, String]
        adds.put(a.get("path").asText, pv)
      }
      if (node.has("remove"))
        adds.remove(node.get("remove").get("path").asText)
    }
    def state(version: Long): State = {
      require(schema != null, s"log through $version carries no metaData")
      State(schema, partCols, adds.toMap)
    }
  }

  private[graft] def replay(tableDir: String, version: Long): State =
    replayMaybeCheckpointed(None, tableDir, version)

  /** Replay to `version`. With a session available, a `_last_checkpoint`
    * at version c ≤ `version` seeds the state from the checkpoint
    * parquet and only the JSON commits in (c, version] are read —
    * O(tail), the reason the format has checkpoints at all. Without a
    * session (or for time travel BEFORE the checkpoint) the pure-JSON
    * path replays from 0: same answer, linear cost, still
    * metadata-sized. */
  private def replayMaybeCheckpointed(spark: Option[SparkSession],
      tableDir: String, version: Long): State = {
    val vs = versions(tableDir)
    require(vs.nonEmpty, s"no _delta_log commits under $tableDir")
    require(vs.contains(version),
      s"version $version not in log (have ${vs.mkString(",")})")
    val r = new Replayer
    val from: Long = (spark, lastCheckpointVersion(tableDir)) match {
      case (Some(s), Some(c)) if c <= version =>
        seedFromCheckpoint(s, tableDir, c, r); c + 1
      case _ => Long.MinValue
    }
    val tail = vs.filter(v => v >= from && v <= version)
    lastJsonCommitsRead = tail.size
    tail.foreach { v =>
      Files.readAllLines(commitFile(tableDir, v).toPath).asScala
        .filter(_.nonEmpty).foreach(r.applyLine)
    }
    r.state(version)
  }

  /** Latest snapshot. */
  def read(spark: SparkSession, tableDir: String): DataFrame =
    readVersion(spark, tableDir, versions(tableDir).last)

  /** Time travel: the table exactly as of commit `version`. Schema
    * comes from the log's metaData (not parquet footers); partition
    * columns come from the log's per-file `partitionValues`. */
  def readVersion(spark: SparkSession, tableDir: String,
                  version: Long): DataFrame = {
    val st = replayMaybeCheckpointed(Some(spark), tableDir, version)
    val dataSchema = StructType(
      st.schema.filterNot(f => st.partitionColumns.contains(f.name)))
    def resolve(p: String) =
      if (p.startsWith("/") || p.contains("://")) p else s"$tableDir/$p"
    if (st.addPartitionValues.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        st.schema)
    else if (st.partitionColumns.isEmpty)
      spark.read.schema(dataSchema)
        .parquet(st.files.map(resolve): _*)
    else {
      // ONE scan of every live file + a broadcast join against the
      // log's per-file partitionValues, keyed on the file basename
      // (unique by construction in any real Delta table — UUID part
      // names; required loudly here). Partition columns are restored
      // as typed casts FROM THE LOG, the spec's source of truth —
      // file paths are opaque. A per-partition-tuple scan would build
      // a union of thousands of plans at real partition counts; this
      // stays one scan + one broadcast hash join at any count.
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.functions.{broadcast, input_file_name,
        regexp_extract}
      import org.apache.spark.sql.types.{StringType, StructField}
      def base(p: String) = p.substring(p.lastIndexOf('/') + 1)
      val names = st.files.map(base)
      require(names.distinct.size == names.size,
        "duplicate data-file basenames in one snapshot — cannot key " +
          "partitionValues by file identity")
      val pvRows: java.util.List[Row] = st.addPartitionValues.toSeq
        .map { case (p, pv) =>
          Row.fromSeq(base(p) +:
            st.partitionColumns.map(c => pv.get(c).filter(_ != null).orNull))
        }.asJava
      val pvT = StructType(StructField("_file", StringType) +:
        st.partitionColumns.map(c =>
          StructField(s"_pv_$c", StringType, nullable = true)))
      val pvDf = spark.createDataFrame(pvRows, pvT)
      spark.read.schema(dataSchema).parquet(st.files.map(resolve): _*)
        .withColumn("_file",
          regexp_extract(input_file_name(), "[^/]+$", 0))
        .join(broadcast(pvDf), Seq("_file"))
        .select(st.schema.map { f =>
          if (st.partitionColumns.contains(f.name))
            col(s"_pv_${f.name}").cast(f.dataType).as(f.name)
          else col(f.name)
        }: _*)
    }
  }

  // ---------------------------------------------------------------
  // Checkpoints (the open spec's replay shortcut)
  // ---------------------------------------------------------------

  private def checkpointFile(tableDir: String, v: Long) =
    new File(logDir(tableDir), f"$v%020d.checkpoint.parquet")

  private def lastCheckpointVersion(tableDir: String): Option[Long] = {
    val f = new File(logDir(tableDir), "_last_checkpoint")
    if (!f.isFile) None
    else Some(mapper.readTree(
      new String(Files.readAllBytes(f.toPath), "UTF-8"))
      .get("version").asLong)
  }

  /** Write a checkpoint of the CURRENT latest version: one parquet
    * file in the spec's checkpoint shape — one row per live action,
    * top-level nullable `protocol` / `metaData` / `add` structs —
    * plus the `_last_checkpoint` pointer. Replay cost for later reads
    * drops from O(commits) to O(commits since checkpoint); JSON
    * commits stay on disk (history auditable, pre-checkpoint time
    * travel still replays them). Returns the checkpointed version. */
  def checkpoint(spark: SparkSession, tableDir: String): Long = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val v = versions(tableDir).last
    val st = replay(tableDir, v)
    val protocolT = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val metaDataT = StructType(Seq(
      StructField("id", StringType),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType))))
    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType)))
    val ckptT = StructType(Seq(
      StructField("protocol", protocolT, nullable = true),
      StructField("metaData", metaDataT, nullable = true),
      StructField("add", addT, nullable = true)))
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(Row(1, 2), null, null))
    rows.add(Row(null,
      Row("ckpt", st.schema.json, st.partitionColumns), null))
    st.files.foreach { f =>
      rows.add(Row(null, null,
        Row(f, st.addPartitionValues(f), 0L, 0L, true)))
    }
    // stage through a temp dir: Spark writes a directory, the spec
    // wants a single file at <v>.checkpoint.parquet
    val tmp = Files.createTempDirectory("dl_ckpt").toString + "/w"
    spark.createDataFrame(rows, ckptT).coalesce(1).write.parquet(tmp)
    val part = new File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, checkpointFile(tableDir, v).toPath,
      StandardCopyOption.REPLACE_EXISTING)
    graft.util.Fs.deleteRecursively(new File(tmp).getParentFile)
    val lc = mapper.createObjectNode()
    lc.put("version", v).put("size", rows.size.toLong)
    val tmpLc = Files.createTempFile(
      Paths.get(logDir(tableDir)), "._last_checkpoint-", ".tmp")
    Files.write(tmpLc, mapper.writeValueAsString(lc).getBytes("UTF-8"))
    Files.move(tmpLc, Paths.get(logDir(tableDir), "_last_checkpoint"),
      StandardCopyOption.ATOMIC_MOVE)
    v
  }

  private def seedFromCheckpoint(spark: SparkSession, tableDir: String,
                                 v: Long, r: Replayer): Unit = {
    spark.read.parquet(checkpointFile(tableDir, v).getPath)
      .collect().foreach { row =>
        if (!row.isNullAt(row.fieldIndex("protocol"))) {
          val p = row.getStruct(row.fieldIndex("protocol"))
          require(p.getInt(0) == 1,
            s"unsupported Delta minReaderVersion ${p.getInt(0)}")
        }
        if (!row.isNullAt(row.fieldIndex("metaData"))) {
          val m = row.getStruct(row.fieldIndex("metaData"))
          r.schema = DataType.fromJson(m.getString(1))
            .asInstanceOf[StructType]
          r.partCols = m.getSeq[String](2)
        }
        if (!row.isNullAt(row.fieldIndex("add"))) {
          val a = row.getStruct(row.fieldIndex("add"))
          r.adds.put(a.getString(0),
            Option(a.getMap[String, String](1)).map(_.toMap)
              .getOrElse(Map.empty))
        }
      }
  }

  // ---------------------------------------------------------------
  // Writer: overwrite-semantics commits + Snapshots export
  // ---------------------------------------------------------------

  /** Publish commit `v`. Returns false if another writer claimed `v`
    * first — the open protocol's put-if-absent commit CAS (what Delta
    * does on an object store with conditional PUT). The claim is
    * `Files.createLink` FROM the fully-written tmp: atomic
    * create-if-absent AND the published file carries complete content
    * in the same instant — a rename (ATOMIC_MOVE) would silently
    * REPLACE an existing commit on POSIX, letting two racers clobber
    * each other; a claim-then-fill would expose an empty commit to
    * readers. A crashed writer leaves only a dot-tmp the version
    * listing never sees. */
  private def writeActions(tableDir: String, v: Long,
                           actions: Seq[ObjectNode]): Boolean = {
    Files.createDirectories(Paths.get(logDir(tableDir)))
    val tmp = Files.createTempFile(
      Paths.get(logDir(tableDir)), s".$v-", ".json.tmp")
    Files.write(tmp,
      actions.map(mapper.writeValueAsString).mkString("", "\n", "\n")
        .getBytes("UTF-8"))
    try { Files.createLink(commitFile(tableDir, v).toPath, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  private def protocolAction: ObjectNode = {
    val p = mapper.createObjectNode()
    p.putObject("protocol").put("minReaderVersion", 1)
      .put("minWriterVersion", 2)
    p
  }

  private def metaDataAction(schema: StructType,
                             partCols: Seq[String]): ObjectNode = {
    val m = mapper.createObjectNode()
    val md = m.putObject("metaData")
    md.put("id", java.util.UUID.nameUUIDFromBytes(
      schema.json.getBytes("UTF-8")).toString)
    md.putObject("format").put("provider", "parquet")
      .putObject("options")
    md.put("schemaString", schema.json)
    val pc = md.putArray("partitionColumns")
    partCols.foreach(pc.add)
    md.putObject("configuration")
    md.put("createdTime", 0L)
    m
  }

  private def addAction(path: String, size: Long): ObjectNode = {
    val a = mapper.createObjectNode()
    val add = a.putObject("add")
    add.put("path", path)
    add.putObject("partitionValues")
    add.put("size", size)
    add.put("modificationTime", 0L)
    add.put("dataChange", true)
    a
  }

  private def removeAction(path: String): ObjectNode = {
    val r = mapper.createObjectNode()
    r.putObject("remove").put("path", path)
      .put("dataChange", true)
    r
  }

  /** Commit `df` as the table's next version with OVERWRITE semantics
    * (previous adds removed — the reference's
    * `.mode("overwrite")` Delta writes, spark/batch_gold.py:156).
    * Data files land under `part-v<version>/`; the first commit also
    * carries protocol + metaData. Returns the committed version. */
  def commitOverwrite(df: DataFrame, tableDir: String): Long = {
    // data dir named by UUID, not by version: two racing writers must
    // not collide at the DATA write — only the log CAS decides order
    val sub = s"part-${java.util.UUID.randomUUID}"
    df.write.parquet(s"$tableDir/$sub")
    val files = Option(new File(tableDir, sub).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val adds = files.map(f => addAction(s"$sub/${f.getName}", f.length))
    // lost CAS ⇒ another writer advanced the log; recompute the
    // version AND the removes from the new latest state and retry —
    // the loop makes progress by construction (each failure means a
    // new committed version exists)
    var v = -1L
    var done = false
    while (!done) {
      val vs = versions(tableDir)
      v = if (vs.isEmpty) 0L else vs.last + 1
      val head: Seq[ObjectNode] =
        if (vs.isEmpty)
          Seq(protocolAction, metaDataAction(df.schema, Seq.empty))
        else replay(tableDir, vs.last).files.map(removeAction)
      done = writeActions(tableDir, v, head ++ adds)
    }
    v
  }

  // ---------------------------------------------------------------
  // Gated queries (q128/q129)
  // ---------------------------------------------------------------

  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** Session-cached two-commit Delta table over the orders testdata:
    * commit 0 = even order keys, commit 1 = OVERWRITE with odd keys.
    * The halves are disjoint, so a reader that ignored commit 1's
    * remove actions would return both and row-count-mismatch — replay
    * correctness is the gate, not just file listing. Built once per
    * (session, sfDir) like the q104 snapshot (testdata is read-only,
    * so no rewrite eviction is needed); temp dirs of stopped sessions
    * are reclaimed on the next call. */
  private[graft] def ordersDeltaTable(spark: SparkSession,
                                      dir: String): String = {
    tableCache.keySet.asScala.toSeq.foreach { k =>
      if (k._1.sparkContext.isStopped)
        Option(tableCache.remove(k)).foreach(p =>
          graft.util.Fs.deleteRecursively(new File(p).getParentFile))
    }
    val canon = new File(dir).getCanonicalPath
    tableCache.computeIfAbsent((spark, canon), _ => {
      val work = Files.createTempDirectory("graft_delta").toString
      val t = s"$work/orders_delta"
      val o = graft.Tables.load(spark, canon, "orders")
      commitOverwrite(o.filter(
        org.apache.spark.sql.functions.pmod(col("o_orderkey"), lit(2)) === 0), t)
      commitOverwrite(o.filter(
        org.apache.spark.sql.functions.pmod(col("o_orderkey"), lit(2)) === 1), t)
      t
    })
  }

  /** q128 — DELTA LOG READ (latest): replays the open-format
    * transaction log and returns the current snapshot. Equals the odd
    * half of orders iff commit 1's remove actions were honored. */
  def deltaRead(spark: SparkSession, dir: String): DataFrame =
    read(spark, ordersDeltaTable(spark, dir))
      .orderBy(col("o_orderkey"))

  val deltaReadSql: String =
    """SELECT * FROM orders WHERE o_orderkey % 2 = 1 ORDER BY o_orderkey"""

  /** q129 — DELTA TIME TRAVEL: pins commit 0, proving replay stops at
    * the requested version (the even half, before the overwrite). */
  def deltaTimeTravel(spark: SparkSession, dir: String): DataFrame =
    readVersion(spark, ordersDeltaTable(spark, dir), 0L)
      .orderBy(col("o_orderkey"))

  val deltaTimeTravelSql: String =
    """SELECT * FROM orders WHERE o_orderkey % 2 = 0 ORDER BY o_orderkey"""

  /** VACUUM: delete data files no longer referenced by any of the
    * last `keepVersions` snapshots (Delta's VACUUM with a
    * version-count retention horizon instead of a wall-clock one —
    * deterministic in tests, same reader contract: time travel to a
    * retained version keeps working; travel past the horizon fails on
    * missing files rather than reading wrong data). Only files under
    * the table root are candidates; the log itself is never touched
    * (history stays auditable, as Delta's VACUUM leaves it). Returns
    * the deleted relative paths. */
  def vacuum(tableDir: String, keepVersions: Int): Seq[String] = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val vs = versions(tableDir)
    if (vs.isEmpty) return Seq.empty
    val keep = vs.takeRight(keepVersions)
    val live: Set[String] = keep.flatMap(v => replay(tableDir, v).files).toSet
    // every file any version EVER added (relative paths only — the
    // log is the complete registry, no directory walk needed)
    val everAdded: Seq[String] = vs.flatMap { v =>
      Files.readAllLines(commitFile(tableDir, v).toPath).asScala
        .filter(_.nonEmpty)
        .map(mapper.readTree)
        .filter(_.has("add"))
        .map(_.get("add").get("path").asText)
    }.distinct.filterNot(p => p.startsWith("/") || p.contains("://"))
    // return only what THIS call removed (already-gone files make a
    // second vacuum a no-op, not a repeat report)
    everAdded.filterNot(live.contains)
      .filter(p => Files.deleteIfExists(Paths.get(tableDir, p)))
  }

  /** Export every committed version of a [[Snapshots]] table as a
    * Delta-layout table — version k of the log reproduces version
    * `versions(k)` of the snapshots (each Snapshots version is a full
    * table state, so each commit is an overwrite). Data files are
    * hard-linked where the filesystem allows (copy fallback): the
    * export is metadata work, not a data rewrite. */
  def exportSnapshots(spark: SparkSession, snapshotsDir: String,
                      deltaDir: String): Seq[Long] = {
    val schema = Snapshots.read(spark, snapshotsDir).schema
    var prev: Seq[String] = Seq.empty
    Snapshots.versions(snapshotsDir).zipWithIndex.map { case (sv, i) =>
      val sub = s"part-v$i"
      Files.createDirectories(Paths.get(deltaDir, sub))
      val parts = Option(
          new File(s"$snapshotsDir/v=$sv").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      val rels = parts.map { f =>
        val dest = Paths.get(deltaDir, sub, f.getName)
        try Files.createLink(dest, f.toPath)
        catch { case _: UnsupportedOperationException | _: java.io.IOException =>
          Files.copy(f.toPath, dest, StandardCopyOption.REPLACE_EXISTING) }
        s"$sub/${f.getName}"
      }.toSeq
      val head: Seq[ObjectNode] =
        if (i == 0) Seq(protocolAction, metaDataAction(schema, Seq.empty))
        else prev.map(removeAction)
      require(writeActions(deltaDir, i.toLong,
        head ++ rels.zip(parts.map(_.length))
          .map { case (p, s) => addAction(p, s) }),
        s"export target $deltaDir already carries commit $i — " +
          "export into a fresh directory")
      prev = rels
      i.toLong
    }
  }
}
