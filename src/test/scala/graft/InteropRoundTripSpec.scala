package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions.col

/** ONE consolidated FOREIGN-CLIENT round trip per format: a table is
  * written here with every interop-sensitive feature stacked
  * (checkpoint + deletion vectors + column mapping + rename for
  * Delta; WAP branch + rollback + rename for Iceberg), then read
  * back by a hand-authored replay that uses ONLY the public file
  * formats — raw JSON commits, the checkpoint parquet, the metadata
  * chain, parquet footers — never this repo's replayer. What a real
  * external client would reject, this spec rejects. */
class InteropRoundTripSpec extends SparkSuite {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  test("Delta foreign replay: checkpoint features, mapping ids, DV accounting") {
    val dir = Files.createTempDirectory("interop").toString + "/t"
    val nested = spark.sql(
      """SELECT id AS k,
        |  named_struct('a', id * 2, 'b', CONCAT('x', id)) AS nest
        |FROM range(0, 60)""".stripMargin)
    sources.DeltaLog.commitOverwriteMapped(nested, dir)
    sources.DeltaLog.deleteWhere(spark, dir, col("k") % 4 === 0)
    sources.DeltaLog.renameColumnMapped(dir, "nest.a", "alpha")
    sources.DeltaLog.checkpoint(spark, dir)

    // ---- the foreign client: _last_checkpoint -> checkpoint
    // parquet -> trailing JSON commits, all via public formats ----
    val logDir = s"$dir/_delta_log"
    val last = mapper.readTree(new String(Files.readAllBytes(
      Paths.get(logDir, "_last_checkpoint")), "UTF-8"))
    val ckptV = last.get("version").asLong
    val ckpt = f"$logDir/$ckptV%020d.checkpoint.parquet"
    val cp = spark.read.parquet(ckpt).cache()

    // (1) PROTOCOL: reader v3 REQUIRES both feature lists in the
    // checkpoint — a real client replaying from it rejects the
    // table otherwise (the round-10 ADVICE fix, asserted at the
    // foreign surface)
    val proto = cp.select("protocol.*")
      .where(col("minReaderVersion").isNotNull).collect().head
    assert(proto.getAs[Int]("minReaderVersion") == 3)
    assert(proto.getAs[Int]("minWriterVersion") == 7)
    val rf = proto.getAs[scala.collection.Seq[String]]("readerFeatures")
    val wf = proto.getAs[scala.collection.Seq[String]]("writerFeatures")
    assert(rf != null && rf.contains("deletionVectors"))
    assert(wf != null && wf.contains("deletionVectors"))

    // (2) METADATA: parse schemaString ourselves; the maxColumnId
    // invariant an external WRITER allocates against — it must be
    // >= every recursively-assigned mapping id, post-rename
    val metaRows = cp.select("metaData.*")
      .where(col("schemaString").isNotNull).collect()
    // trailing JSON commits may carry a newer metaData — foreign
    // clients take the LAST metaData seen across checkpoint + tail
    val tailMeta = new java.io.File(logDir).listFiles().toSeq
      .filter(f => f.getName.matches("\\d{20}\\.json") &&
        f.getName.takeWhile(_ != '.').toLong > ckptV)
      .sortBy(_.getName)
      .flatMap(f => Files.readAllLines(f.toPath).asScala)
      .map(mapper.readTree).filter(_.has("metaData"))
    val (schemaJson, confMap) =
      if (tailMeta.nonEmpty) {
        val m = tailMeta.last.get("metaData")
        (m.get("schemaString").asText,
          m.get("configuration").properties().asScala
            .map(e => e.getKey -> e.getValue.asText).toMap)
      } else {
        val m = metaRows.head
        (m.getAs[String]("schemaString"),
          m.getAs[scala.collection.Map[String, String]]("configuration")
            .toMap)
      }
    assert(confMap("delta.columnMapping.mode") == "name")
    val schemaNode = mapper.readTree(schemaJson)
    def ids(node: com.fasterxml.jackson.databind.JsonNode): Seq[Long] =
      node.get("fields").elements().asScala.toSeq.flatMap { f =>
        val own = f.get("metadata").get("delta.columnMapping.id")
          .asLong
        val nestedIds = f.get("type") match {
          case t if t.isObject && t.get("type").asText == "struct" =>
            ids(t)
          case _ => Seq.empty
        }
        own +: nestedIds
      }
    val assigned = ids(schemaNode)
    val maxColumnId = confMap("delta.columnMapping.maxColumnId").toLong
    assert(assigned.size == 4, s"4 recursive ids expected: $assigned")
    assert(maxColumnId >= assigned.max,
      s"an external writer allocating ${maxColumnId + 1} would " +
        s"collide with assigned id ${assigned.max}")
    // the renamed leaf KEPT its id and physicalName (rename was
    // metadata-only)
    val nestField = schemaNode.get("fields").elements().asScala
      .find(_.get("name").asText == "nest").get
    val leafNames = nestField.get("type").get("fields").elements()
      .asScala.map(_.get("name").asText).toSeq
    assert(leafNames.contains("alpha") && !leafNames.contains("a"))

    // (3) FILES + DV ACCOUNTING: live adds = checkpoint adds minus
    // tail removes plus tail adds; foreign row accounting =
    // sum(file rows) - sum(DV cardinality) must equal OUR reader
    case class FAdd(path: String, dvCard: Long)
    val cpAdds = cp.select("add.path", "add.deletionVector.cardinality")
      .where(col("add.path").isNotNull).collect()
      .map(r => FAdd(r.getString(0),
        if (r.isNullAt(1)) 0L else r.getLong(1)))
    val tail = new java.io.File(logDir).listFiles().toSeq
      .filter(f => f.getName.matches("\\d{20}\\.json") &&
        f.getName.takeWhile(_ != '.').toLong > ckptV)
      .sortBy(_.getName)
      .flatMap(f => Files.readAllLines(f.toPath).asScala)
      .map(mapper.readTree)
    val live = scala.collection.mutable.LinkedHashMap.empty[String, FAdd]
    cpAdds.foreach(a => live(a.path) = a)
    tail.foreach { n =>
      if (n.has("add")) {
        val a = n.get("add")
        val dv =
          if (a.has("deletionVector") && !a.get("deletionVector").isNull)
            a.get("deletionVector").get("cardinality").asLong
          else 0L
        live(a.get("path").asText) = FAdd(a.get("path").asText, dv)
      }
      if (n.has("remove")) live.remove(n.get("remove").get("path").asText)
    }
    val foreignRows = live.values.map { a =>
      spark.read.parquet(s"$dir/${a.path}").count() - a.dvCard
    }.sum
    assert(foreignRows == sources.DeltaLog.read(spark, dir).count(),
      "foreign (file rows - DV cardinality) accounting must equal " +
        "our merge-on-read result")
    // and the physical files spell col-<uuid> names that the
    // schemaString's physicalName annotations resolve exactly
    val physTop = schemaNode.get("fields").elements().asScala
      .map(_.get("metadata").get("delta.columnMapping.physicalName")
        .asText).toSet
    val fileCols = spark.read
      .parquet(s"$dir/${live.keys.head}").schema.fieldNames.toSet
    assert(fileCols == physTop,
      s"data files spell $fileCols; schemaString annotates $physTop")
    cp.unpersist(): Unit
  }

  test("Delta foreign replay: multi-part checkpoint + cdc change feed") {
    val dir = Files.createTempDirectory("interop2").toString + "/t"
    sources.DeltaLog.commitOverwrite(
      (1L to 12L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    sources.DeltaLog.setTableProperties(dir,
      Map("delta.enableChangeDataFeed" -> "true"))
    sources.DeltaLog.mergeInto(spark, dir,
      Seq((2L, "m2"), (13L, "m13")).toDF("k", "s"), Seq("k"))
    val v = sources.DeltaLog.checkpoint(spark, dir,
      maxActionsPerPart = 3L)
    val logDir = s"$dir/_delta_log"

    // ---- foreign client, public formats only ----
    // (1) _last_checkpoint declares parts; every spec-named part
    // file exists; their union replays to our row count
    val last = mapper.readTree(new String(Files.readAllBytes(
      Paths.get(logDir, "_last_checkpoint")), "UTF-8"))
    assert(last.has("parts"), "multi-part checkpoint must declare parts")
    val n = last.get("parts").asInt
    assert(n > 1)
    val partPaths = (1 to n).map(i =>
      f"$logDir/$v%020d.checkpoint.$i%010d.$n%010d.parquet")
    partPaths.foreach(p =>
      assert(new java.io.File(p).isFile, s"missing checkpoint part $p"))
    val cp = spark.read.parquet(partPaths: _*)
    assert(cp.select("protocol.minReaderVersion")
      .where(col("`protocol`.`minReaderVersion`").isNotNull)
      .count() == 1, "exactly one protocol row across all parts")
    assert(cp.select("metaData.schemaString")
      .where(col("`metaData`.`schemaString`").isNotNull)
      .count() == 1, "exactly one metaData row across all parts")
    val adds = cp.select("add.path")
      .where(col("`add`.`path`").isNotNull)
      .collect().map(_.getString(0)).toSeq
    val foreignRows = adds
      .map(p => spark.read.parquet(s"$dir/$p").count()).sum
    assert(foreignRows == sources.DeltaLog.read(spark, dir).count(),
      "parts-reconstructed state must equal our read")
    // the checkpoint metaData (wherever its part landed) carries the
    // FULL configuration, CDF flag included
    val conf = cp.select("metaData.configuration")
      .where(col("`metaData`.`schemaString`").isNotNull)
      .collect().head
      .getAs[scala.collection.Map[String, String]](0)
    assert(conf("delta.enableChangeDataFeed") == "true")

    // (2) CHANGE FEED, foreign spelling: the MERGE commit carries a
    // cdc action; a real CDF reader takes the named _change_data
    // file's rows (with their in-file _change_type) — they must
    // equal our readChanges for that commit row-for-row
    val mergeV = 2L
    val nodes = Files.readAllLines(
      Paths.get(f"$logDir/$mergeV%020d.json")).asScala
      .filter(_.nonEmpty).map(mapper.readTree).toSeq
    val cdcPaths = nodes.filter(_.has("cdc"))
      .map(_.get("cdc").get("path").asText)
    assert(cdcPaths.nonEmpty, "a CDF-enabled MERGE must stamp cdc actions")
    assert(cdcPaths.forall(_.startsWith("_change_data/")))
    val foreignChanges = spark.read
      .parquet(cdcPaths.map(p => s"$dir/$p"): _*)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("s"),
        r.getAs[String]("_change_type"))).toSet
    val ourChanges = sources.DeltaLog
      .readChanges(spark, dir, mergeV, mergeV)
      .select("k", "s", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2))).toSet
    assert(foreignChanges == ourChanges,
      s"foreign CDF read $foreignChanges != ours $ourChanges")
    assert(foreignChanges.map(_._3) ==
      Set("update_preimage", "update_postimage", "insert"))

    // (3) the STREAMING arc over the same log: graft-delta-cdf —
    // planning across the multi-part checkpoint + property commit +
    // cdc-action MERGE — must agree with the batch readChanges
    // row-for-row over the full history
    val out = Files.createTempDirectory("interop2s").toString
    val q = spark.readStream.format("graft-delta-cdf")
      .option("path", dir).load()
      .writeStream.format("parquet")
      .option("path", s"$out/sink")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$out/sink")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("s"),
        r.getAs[String]("_change_type"),
        r.getAs[Long]("_commit_version"))).toSet
    val batchAll = sources.DeltaLog.readChanges(spark, dir, 0L,
        sources.DeltaLog.versions(dir).last)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("s"),
        r.getAs[String]("_change_type"),
        r.getAs[Long]("_commit_version"))).toSet
    assert(streamed == batchAll,
      "the CDF stream must replay the checkpointed cdc history " +
        "exactly as the batch reader")
  }

  test("Iceberg foreign replay: snapshot-log publishes only, ids survive rename") {
    val work = Files.createTempDirectory("interop2").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      (1L to 6L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    sources.Iceberg.commitAppendToBranch(
      Seq((98L, "staged")).toDF("k", "s"), dir, "audit")
    val published = sources.Iceberg.commitAppend(
      Seq((7L, "s7")).toDF("k", "s"), dir)
    sources.Iceberg.commitAppend(Seq((8L, "s8")).toDF("k", "s"), dir)
    sources.Iceberg.rollbackTo(dir, published)
    sources.Iceberg.renameColumn(dir, "s", "label")
    sources.Iceberg.commitAppend(
      Seq((9L, "s9")).toDF("k", "label"), dir)

    // ---- the foreign client: version-hint -> metadata json ----
    val metaDir = s"$dir/metadata"
    val hint = new String(Files.readAllBytes(
      Paths.get(metaDir, "version-hint.text")), "UTF-8").trim.toInt
    val meta = mapper.readTree(new String(Files.readAllBytes(
      Paths.get(metaDir, s"v$hint.metadata.json")), "UTF-8"))
    val current = meta.get("current-snapshot-id").asLong
    val byId = meta.get("snapshots").elements().asScala
      .map(s => s.get("snapshot-id").asLong -> s).toMap
    // main ancestry via parent-snapshot-id (the spec's chain)
    val ancestry = Iterator.iterate(Option(current)) { cur =>
      cur.flatMap(id => Option(byId(id).get("parent-snapshot-id"))
        .filterNot(_.isNull).map(_.asLong))
    }.takeWhile(_.isDefined).map(_.get).toSet
    // (1) snapshot-log = CURRENT transitions only: every entry must
    // resolve to PUBLISHED history (a FOR TIMESTAMP AS OF through a
    // WAP-staged id would leak the audit window) — except entries
    // whose snapshot was later rolled PAST, which must still never
    // name the branch-staged snapshot
    val staged = meta.get("refs").get("audit").get("snapshot-id").asLong
    val logIds = meta.get("snapshot-log").elements().asScala
      .map(_.get("snapshot-id").asLong).toSeq
    assert(!logIds.contains(staged),
      "snapshot-log must never name a WAP-staged snapshot")
    assert(logIds.last == current,
      "the last snapshot-log entry is the current snapshot")
    assert(!ancestry.contains(staged))
    // (2) the rolled-back snapshot is OFF the main ancestry but the
    // rollback TRANSITION is in the log (a foreign time traveler
    // sees history move back)
    assert(logIds.count(_ == published) >= 2,
      "rollback re-publishes the restored snapshot in snapshot-log")
    // (3) parquet FIELD IDS survive the rename: pre-rename and
    // post-rename data files both carry the same id for the renamed
    // column — the foreign resolution rule
    def fileIds(p: String): Map[Int, String] = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(p),
          new org.apache.hadoop.conf.Configuration())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFileMetaData.getSchema.getFields.asScala
        .map(f => f.getId.intValue -> f.getName).toMap
      finally r.close()
    }
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    val dataFiles = walk(new java.io.File(s"$dir/data"))
      .filter(_.getName.endsWith(".parquet")).sortBy(_.lastModified)
    val first = fileIds(dataFiles.head.getPath)
    val lastF = fileIds(dataFiles.last.getPath)
    assert(first(2) == "s" && lastF(2) == "label",
      s"field id 2 must be stable across the rename: $first / $lastF")
    // (4) current schema resolves id 2 to the NEW name
    val curSchemaId = meta.get("current-schema-id").asInt
    val curSchema = meta.get("schemas").elements().asScala
      .find(_.get("schema-id").asInt == curSchemaId).get
    val idToName = curSchema.get("fields").elements().asScala
      .map(f => f.get("id").asInt -> f.get("name").asText).toMap
    assert(idToName(2) == "label")
  }
}
