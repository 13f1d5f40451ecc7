package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit, pmod}
import org.apache.spark.sql.streaming.Trigger

/** `readStream.format("graft-iceberg-cdf")` — append snapshots as
  * inserts (plus the un-delete guard spec below), v2 position-delete snapshots as exactly their
  * newly-deleted rows, refusals for the value-level shapes. */
class IcebergCdfStreamSourceSpec extends SparkSuite {
  import spark.implicits._

  private def drainTo(dir: String, out: String, ckpt: String,
      startingSnapshotId: Option[Long] = None): Unit = {
    val r0 = spark.readStream.format("graft-iceberg-cdf")
      .option("path", dir)
    val q = startingSnapshotId
      .fold(r0)(s => r0.option("startingSnapshotId", s.toString))
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("appends + stacked position deletes stream as row-level changes") {
    val work = Files.createTempDirectory("icdf").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      (1L to 10L).map(i => (i, s"s$i")).toDF("k", "s"), dir) // snap 1
    sources.Iceberg.deleteWhere(spark, dir,
      pmod(col("k"), lit(2L)) === 0) // snap 2: evens die
    sources.Iceberg.commitAppend(
      (11L to 12L).map(i => (i, s"s$i")).toDF("k", "s"), dir) // snap 3
    // snap 4: k<=4 — but 2 and 4 are ALREADY dead; only 1,3 are new
    sources.Iceberg.deleteWhere(spark, dir, col("k") <= 4L)
    drainTo(dir, s"$work/out", s"$work/ckpt")
    val got = spark.read.parquet(s"$work/out")
      .select("k", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    val want =
      (1L to 10L).map(k => (k, "insert", 1L)) ++
        Seq(2L, 4L, 6L, 8L, 10L).map(k => (k, "delete", 2L)) ++
        (11L to 12L).map(k => (k, "insert", 3L)) ++
        Seq(1L, 3L).map(k => (k, "delete", 4L))
    assert(got == want,
      "each delete snapshot emits EXACTLY its newly-deleted rows")
    // position-delete partitions included, the drain rode the
    // VECTORIZED path (filtered-copy over the listed positions)
    assert(streaming.RowReadSupport.lastReadPath == "columnar",
      "the CDF drain must ride the vectorized read path")
    // incremental: a later delete flows alone from the checkpoint
    sources.Iceberg.deleteWhere(spark, dir, col("k") === 11L)
    drainTo(dir, s"$work/out", s"$work/ckpt")
    val after = spark.read.parquet(s"$work/out")
      .select("k", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    assert(after == want :+ ((11L, "delete", 5L)),
      "exactly the new snapshot's delete — nothing redelivered")
  }

  test("an UN-DELETE (restore dropping pos-deletes on retained files) refuses") {
    // snapshot 1 appends, snapshot 2 position-deletes; a FORGED
    // snapshot 3 (foreign restore-as-overwrite: snapshot 1's
    // manifest-list verbatim — same data files, delete file gone,
    // parent = 2) resurrects the evens. The file-set diff sees
    // identical data files and would stream NOTHING — the guard must
    // refuse loudly instead of silently diverging a MERGE silver.
    val work = Files.createTempDirectory("icdfundel").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      (1L to 6L).map(i => (i, s"s$i")).toDF("k", "s"), dir) // snap 1
    sources.Iceberg.deleteWhere(spark, dir,
      pmod(col("k"), lit(2L)) === 0) // snap 2
    // forge snap 3 on top: clone the latest metadata, append a
    // snapshot node reusing snap 1's manifest-list, advance the ref
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    val v = new String(java.nio.file.Files.readAllBytes(
      metaDir.resolve("version-hint.text")), "UTF-8").trim.toInt
    val meta = mapper.readTree(java.nio.file.Files.readAllBytes(
        metaDir.resolve(s"v$v.metadata.json")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val snaps = meta.get("snapshots")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    import scala.jdk.CollectionConverters._
    val snap1 = snaps.elements().asScala
      .find(_.get("snapshot-id").asLong == 1L).get
    val forged = snaps.addObject()
    forged.put("snapshot-id", 3L)
    forged.put("parent-snapshot-id", 2L)
    forged.put("sequence-number", 3L)
    forged.put("timestamp-ms",
      snap1.get("timestamp-ms").asLong + 2000L)
    forged.put("manifest-list", snap1.get("manifest-list").asText)
    forged.putObject("summary").put("operation", "overwrite")
    meta.put("current-snapshot-id", 3L)
    val refs = meta.get("refs")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    refs.putObject("main").put("snapshot-id", 3L)
      .put("type", "branch")
    java.nio.file.Files.write(
      metaDir.resolve(s"v${v + 1}.metadata.json"),
      mapper.writeValueAsString(meta).getBytes("UTF-8"))
    java.nio.file.Files.write(metaDir.resolve("version-hint.text"),
      (v + 1).toString.getBytes("UTF-8"))
    val e = intercept[Exception] {
      drainTo(dir, s"$work/out", s"$work/ckpt")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("un-delete")),
      s"expected the un-delete refusal, got: ${messages(e)}")
  }

  test("eqDeletePreimages: delete rows carry FULL pre-images, pruned, stacked-safe") {
    val work = Files.createTempDirectory("icdfpre").toString
    val dir = s"$work/t"
    // range-clustered parent: 4 files with disjoint k ranges, so the
    // planner's key-bounds prune has something to prove
    sources.Iceberg.commitAppend(
      (1L to 100L).map(i => (i, s"s$i")).toDF("k", "s")
        .repartitionByRange(4, col("k")), dir)           // snap 1
    // upsert round 1: eq-delete {3,7} + re-append new versions
    sources.Iceberg.deleteWhereEquality(spark, dir,
      Seq(3L, 7L).toDF("k"))                              // snap 2
    sources.Iceberg.commitAppend(
      Seq((3L, "S3"), (7L, "S7")).toDF("k", "s"), dir)    // snap 3
    // upsert round 2, STACKED: k=7 again (its live row is now snap
    // 3's "S7" — the old "s7" is dead by value and must NOT be
    // resurrected as a pre-image) plus a fresh key
    sources.Iceberg.deleteWhereEquality(spark, dir,
      Seq(7L, 50L).toDF("k"))                             // snap 4
    sources.Iceberg.commitAppend(
      Seq((7L, "T7"), (50L, "T50")).toDF("k", "s"), dir)  // snap 5
    val q = spark.readStream.format("graft-iceberg-cdf")
      .option("path", dir).option("eqDeletePreimages", "true").load()
      .writeStream.format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$work/out")
      .select("k", "s", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
      .sortBy(t => (t._4, t._1, t._2)).toSeq
    // batch pre-image derivation: each delete snapshot's doomed keys
    // joined against its PARENT snapshot's state
    val want =
      (1L to 100L).map(i => (i, s"s$i", "insert", 1L)) ++
        Seq((3L, "s3", "delete", 2L), (7L, "s7", "delete", 2L)) ++
        Seq((3L, "S3", "insert", 3L), (7L, "S7", "insert", 3L)) ++
        Seq((7L, "S7", "delete", 4L), (50L, "s50", "delete", 4L)) ++
        Seq((7L, "T7", "insert", 5L), (50L, "T50", "insert", 5L))
    assert(got == want.sortBy(t => (t._4, t._1, t._2)),
      s"pre-images must equal the batch derivation; got " +
        got.filter(_._3 == "delete").mkString(","))
    // the price was O(matching files): the key-bounds prune planned
    // fewer parent files than the snapshot holds
    assert(sources.Iceberg.lastPreimageFilesPlanned <
      sources.Iceberg.lastPreimageFilesTotal,
      s"key-bounds prune off: planned " +
        s"${sources.Iceberg.lastPreimageFilesPlanned} of " +
        s"${sources.Iceberg.lastPreimageFilesTotal}")
    // and WITHOUT the option the same history still streams the wire
    // shape (null-filled non-key columns) — the default is unchanged
    val q2 = spark.readStream.format("graft-iceberg-cdf")
      .option("path", dir).load()
      .writeStream.format("parquet")
      .option("path", s"$work/out2")
      .option("checkpointLocation", s"$work/ckpt2")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val wire = spark.read.parquet(s"$work/out2")
      .filter(col("_change_type") === "delete")
      .select("k", "s").collect().map(r => (r.getLong(0), r.isNullAt(1)))
    assert(wire.nonEmpty && wire.forall(_._2),
      "the default wire shape must keep null-filled non-key columns")
  }

  test("an overwrite ADDING pos-delete files serves MoR change rows") {
    // snapshot 1 appends; snapshot 2 position-deletes. A FORGED
    // snapshot 3 replays snapshot 2's state as operation=overwrite
    // with parent = 1 — the shape a foreign merge-on-read
    // UPDATE/MERGE writer commits: retained data files plus NEW
    // delete files. Round 16 (the position-delta MERGE round) gave
    // this shape its exact CDF spelling: the added pos-deletes
    // stream their TARGETED rows as `delete` pre-images and any
    // added data files as `insert`s — the stream serves it instead
    // of refusing.
    val work = Files.createTempDirectory("icdfadddel").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      (1L to 6L).map(i => (i, s"s$i")).toDF("k", "s"), dir) // snap 1
    sources.Iceberg.deleteWhere(spark, dir,
      pmod(col("k"), lit(2L)) === 0) // snap 2: adds a pos-delete file
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    val v = new String(java.nio.file.Files.readAllBytes(
      metaDir.resolve("version-hint.text")), "UTF-8").trim.toInt
    val meta = mapper.readTree(java.nio.file.Files.readAllBytes(
        metaDir.resolve(s"v$v.metadata.json")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val snaps = meta.get("snapshots")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    import scala.jdk.CollectionConverters._
    val snap2 = snaps.elements().asScala
      .find(_.get("snapshot-id").asLong == 2L).get
    val forged = snaps.addObject()
    forged.put("snapshot-id", 3L)
    forged.put("parent-snapshot-id", 1L)
    forged.put("sequence-number", 3L)
    forged.put("timestamp-ms",
      snap2.get("timestamp-ms").asLong + 2000L)
    forged.put("manifest-list", snap2.get("manifest-list").asText)
    forged.putObject("summary").put("operation", "overwrite")
    meta.put("current-snapshot-id", 3L)
    val refs = meta.get("refs")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    refs.putObject("main").put("snapshot-id", 3L)
      .put("type", "branch")
    java.nio.file.Files.write(
      metaDir.resolve(s"v${v + 1}.metadata.json"),
      mapper.writeValueAsString(meta).getBytes("UTF-8"))
    java.nio.file.Files.write(metaDir.resolve("version-hint.text"),
      (v + 1).toString.getBytes("UTF-8"))
    // start the stream AFTER snapshot 1 so only the forged overwrite
    // is in range: its added pos-delete streams the even keys as
    // delete pre-images with their full pre-image rows
    drainTo(dir, s"$work/out", s"$work/ckpt",
      startingSnapshotId = Some(1L))
    val got = spark.read.parquet(s"$work/out")
      .select("k", "s", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    assert(got === Seq((2L, "s2", "delete"), (4L, "s4", "delete"),
      (6L, "s6", "delete")),
      s"MoR overwrite must stream its pos-delete pre-images, got $got")
  }

  test("an overwrite ADDING eq-delete files streams doomed keys (r17)") {
    // the eq twin of the pos-delete overwrite above (r16 verdict
    // item 5): snapshot 1 appends, snapshot 2 equality-deletes; a
    // FORGED snapshot 3 replays snapshot 2's state as
    // operation=overwrite with parent = 1 — the combined CDC-upsert
    // commit a Flink-style writer lands as ONE overwrite snapshot.
    // The added eq-delete streams its doomed keys as `delete` rows.
    val work = Files.createTempDirectory("icdfaddeq").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      (1L to 6L).map(i => (i, s"s$i")).toDF("k", "s"), dir) // snap 1
    sources.Iceberg.deleteWhereEquality(spark, dir,
      Seq(2L, 5L).toDF("k")) // snap 2: adds an eq-delete file
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    val v = new String(java.nio.file.Files.readAllBytes(
      metaDir.resolve("version-hint.text")), "UTF-8").trim.toInt
    val meta = mapper.readTree(java.nio.file.Files.readAllBytes(
        metaDir.resolve(s"v$v.metadata.json")))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val snaps = meta.get("snapshots")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    import scala.jdk.CollectionConverters._
    val snap2 = snaps.elements().asScala
      .find(_.get("snapshot-id").asLong == 2L).get
    val forged = snaps.addObject()
    forged.put("snapshot-id", 3L)
    forged.put("parent-snapshot-id", 1L)
    forged.put("sequence-number", 3L)
    forged.put("timestamp-ms",
      snap2.get("timestamp-ms").asLong + 2000L)
    forged.put("manifest-list", snap2.get("manifest-list").asText)
    forged.putObject("summary").put("operation", "overwrite")
    meta.put("current-snapshot-id", 3L)
    val refs = meta.get("refs")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    refs.putObject("main").put("snapshot-id", 3L)
      .put("type", "branch")
    java.nio.file.Files.write(
      metaDir.resolve(s"v${v + 1}.metadata.json"),
      mapper.writeValueAsString(meta).getBytes("UTF-8"))
    java.nio.file.Files.write(metaDir.resolve("version-hint.text"),
      (v + 1).toString.getBytes("UTF-8"))
    drainTo(dir, s"$work/out", s"$work/ckpt",
      startingSnapshotId = Some(1L))
    val got = spark.read.parquet(s"$work/out")
      .select("k", "s", "_change_type").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getString(2))).sorted.toSeq
    assert(got === Seq((2L, None, "delete"), (5L, None, "delete")),
      s"eq-adding overwrite must stream its doomed keys, got $got")
  }

  test("partitioned tables stream deletes with partition values reconstructed") {
    val work = Files.createTempDirectory("icdfpart").toString
    val dir = s"$work/t"
    // identity-partitioned, hive-stripped data files: 'p' exists
    // ONLY in the manifest tuples
    sources.Iceberg.commitAppendPartitioned(
      Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b")).toDF("k", "p"),
      dir, Seq("p")) // snap 1
    // POS-delete across both partitions: the delete rows are read
    // out of the stripped data files — partition values must come
    // from the per-file manifest tuples threaded into the partition
    sources.Iceberg.deleteWhere(spark, dir,
      pmod(col("k"), lit(2L)) === 0) // snap 2: 2(a), 4(b) die
    // EQUALITY-delete keyed (k, p) — partition key ⊆ primary key:
    // the delete file itself carries p
    sources.Iceberg.deleteWhereEquality(spark, dir,
      Seq((3L, "b")).toDF("k", "p")) // snap 3
    drainTo(dir, s"$work/out", s"$work/ckpt")
    val got = spark.read.parquet(s"$work/out")
      .select("k", "p", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
      .sortBy(t => (t._4, t._1)).toSeq
    val want = Seq(
      (1L, "a", "insert", 1L), (2L, "a", "insert", 1L),
      (3L, "b", "insert", 1L), (4L, "b", "insert", 1L),
      (2L, "a", "delete", 2L), (4L, "b", "delete", 2L),
      (3L, "b", "delete", 3L))
    assert(got == want,
      s"every arm must carry its partition value: $got")
  }

  test("true overwrite streams as masked file-set diff; escape hatch skips") {
    val work = Files.createTempDirectory("icdfow").toString
    val dir = s"$work/t"
    sources.Iceberg.commitOverwrite(
      (1L to 10L).map(i => (i, s"s$i")).toDF("k", "s"), dir) // snap 1
    sources.Iceberg.deleteWhere(spark, dir,
      pmod(col("k"), lit(2L)) === 0) // snap 2: evens die (pos delete)
    sources.Iceberg.commitOverwrite(
      (21L to 22L).map(i => (i, s"s$i")).toDF("k", "s"), dir) // snap 3
    drainTo(dir, s"$work/out", s"$work/ckpt")
    val got = spark.read.parquet(s"$work/out")
      .select("k", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._3, t._2, t._1)).toSeq
    val want =
      (1L to 10L).map(k => (k, "insert", 1L)) ++
        Seq(2L, 4L, 6L, 8L, 10L).map(k => (k, "delete", 2L)) ++
        // the overwrite's removed side: LIVE rows only — the evens
        // died at snap 2 and must NOT re-emit (double delete)
        Seq(1L, 3L, 5L, 7L, 9L).map(k => (k, "delete", 3L)) ++
        Seq(21L, 22L).map(k => (k, "insert", 3L))
    assert(got == want,
      s"overwrite must stream as the masked file-set diff: $got")
    // the escape hatch: skipOverwriteSnapshots drops snapshot 3 whole
    val q = spark.readStream.format("graft-iceberg-cdf")
      .option("path", dir).option("skipOverwriteSnapshots", "true")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$work/out2")
      .option("checkpointLocation", s"$work/ckpt2")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$work/out2")
      .filter(col("_commit_version") === 3L).count() == 0,
      "skipOverwriteSnapshots must drop the overwrite snapshot whole")
    // a parent state carrying EQUALITY deletes refuses (their
    // value-matched masking cannot be inverted per removed file)
    val dir2 = s"$work/t2"
    sources.Iceberg.commitOverwrite(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir2)
    sources.Iceberg.deleteWhereEquality(spark, dir2, Seq(1L).toDF("k"))
    sources.Iceberg.commitOverwrite(
      Seq((9L, "z")).toDF("k", "s"), dir2)
    val ex = intercept[Exception] {
      drainTo(dir2, s"$work/out3", s"$work/ckpt3")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("EQUALITY deletes")),
      s"expected the equality-delete refusal, got: ${messages(ex)}")
  }

  test("equality deletes stream as key rows; overwrite diffs append-only history") {
    val work = Files.createTempDirectory("icdf2").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      Seq((1L, "P"), (2L, "O")).toDF("k", "st"), dir)
    sources.Iceberg.deleteWhereEquality(spark, dir, Seq("P").toDF("st"))
    drainTo(dir, s"$work/out", s"$work/ckpt")
    val got = spark.read.parquet(s"$work/out")
      .filter(col("_change_type") === "delete")
      .collect().toSeq
    // one delete row per doomed KEY VALUE: the equality column
    // populated, the rest NULL (value-matched CDC — no data file
    // was read to materialize it)
    assert(got.size == 1)
    assert(got.head.getAs[String]("st") == "P")
    assert(got.head.isNullAt(got.head.fieldIndex("k")),
      "non-key columns of an equality delete must be NULL")
    // a true overwrite over a plain append history streams as its
    // file-set diff (round 13 — formerly a refusal)
    val dir2 = s"$work/t2"
    sources.Iceberg.commitAppend(Seq((1L, "a")).toDF("k", "s"), dir2)
    sources.Iceberg.commitOverwrite(Seq((9L, "z")).toDF("k", "s"), dir2)
    drainTo(dir2, s"$work/out2", s"$work/ckpt2")
    val got2 = spark.read.parquet(s"$work/out2")
      .select("k", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    assert(got2 == Seq((1L, "insert", 1L), (1L, "delete", 2L),
      (9L, "insert", 2L)), s"got $got2")
  }

  test("stacked upserts + restart: the q202 MERGE sink converges") {
    // (creation, delete, append, delete, append) with a RESTART
    // between the two upsert generations: offsets checkpoint at
    // snapshot granularity, so the second drain must deliver only
    // snapshots 4-5 and the silver must end at the stacked result
    val work = Files.createTempDirectory("icdf3").toString
    val dir = s"$work/t"
    val silver = s"$work/silver"
    def applyAll(): Unit = {
      val q = spark.readStream.format("graft-iceberg-cdf")
        .option("path", dir).option("maxSnapshotsPerTrigger", "1")
        .load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                         id: Long) =>
          // the q202 sink shape: delete-then-blind-append (the CDC
          // wire orders them), exactly-once via the txn watermark
          val b = batch.persist()
          try if (!b.isEmpty) {
            val inserts = b.filter(col("_change_type") === "insert")
              .drop("_change_type", "_commit_version")
            val deletes = b.filter(col("_change_type") === "delete")
              .select("k")
            if (!deletes.isEmpty)
              sources.DeltaLog.deleteWhereKeys(spark, silver,
                "k", deletes): Unit
            if (!inserts.isEmpty)
              sources.DeltaLog.commitAppendIdempotent(inserts, silver,
                "spec-silver", id): Unit
          } finally b.unpersist(): Unit
        }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    sources.Iceberg.commitAppend(
      (1L to 10L).map(i => (i, s"v0-$i")).toDF("k", "s"), dir)
    sources.Iceberg.upsert(spark, dir,
      Seq((3L, "v1-3"), (6L, "v1-6")).toDF("k", "s"), Seq("k"))
    applyAll()
    // restart: second upsert lands after the first drain
    sources.Iceberg.upsert(spark, dir,
      Seq((6L, "v2-6"), (11L, "v2-11")).toDF("k", "s"), Seq("k"))
    applyAll()
    val got = sources.DeltaLog.read(spark, silver)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = (1L to 10L).map(i => (i, s"v0-$i")).toMap ++
      Map(3L -> "v1-3", 6L -> "v2-6", 11L -> "v2-11")
    assert(got == want.toSet.map((kv: (Long, String)) => (kv._1, kv._2)),
      s"stacked-upsert replay diverged: $got")
    // and it matches the batch sequence-scoped read of the source
    val batch = sources.Iceberg.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == batch, "stream-applied silver != batch MoR read")
  }

  test("q200 gate shape: streamed CDF equals the MoR lifecycle's two arms") {
    val streamed = streaming.IcebergCdfStreamQueries
      .icebergCdfStream(spark, sfDir)
      .select("o_orderkey", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    val orders = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val want = (orders.map(k => (k, "insert", 1L)) ++
      orders.filter(_ % 10 == 0).map(k => (k, "delete", 2L)))
      .sortBy(t => (t._1, t._3))
    assert(streamed.sortBy(t => (t._1, t._3)) == want)
  }
}
