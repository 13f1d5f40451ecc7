package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

/** `readStream.format("graft-iceberg")` — the DSv2 twin over the
  * Iceberg metadata chain: snapshot ids as offsets, snapshot-diff
  * planning, field-id resolution through renames. */
class IcebergStreamSourceSpec extends SparkSuite {
  import spark.implicits._

  private def drain(dir: String, out: String, ckpt: String,
                    extra: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream.format("graft-iceberg").option("path", dir)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("filter option prunes planned files like the batch pushdown read") {
    import org.apache.spark.sql.functions.col
    val work = Files.createTempDirectory("istreamf").toString
    // IDENTITY-PARTITION pruning: three partitions, one file each
    val dir = s"$work/t"
    sources.Iceberg.commitAppendPartitioned(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "p")
        .repartition(col("p")), dir, Seq("p"))
    streaming.StreamFilter.reset(dir)
    drain(dir, s"$work/out", s"$work/ckpt",
      Map("filter" -> "p = 'b'"))
    assert(streaming.StreamFilter.statsFor(dir) == ((3L, 1L)),
      s"partition pruning: ${streaming.StreamFilter.statsFor(dir)}")
    assert(spark.read.parquet(s"$work/out")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "b")))
    // the batch pushdown prunes to the same file count
    sources.Iceberg.readFiltered(spark, dir, col("p") === "b")
      .collect(): Unit
    assert(sources.Iceberg.lastFilesPlanned == 1)
    // MANIFEST-BOUNDS pruning: three appends with disjoint key
    // ranges — a range predicate plans one file, the batch twin agrees
    val dir2 = s"$work/t2"
    Seq(1L to 10L, 11L to 20L, 21L to 30L).foreach(r =>
      sources.Iceberg.commitAppend(
        r.map(i => (i, s"s$i")).toDF("k", "s").coalesce(1), dir2))
    streaming.StreamFilter.reset(dir2)
    drain(dir2, s"$work/out2", s"$work/ckpt2",
      Map("filter" -> "k >= 25"))
    assert(streaming.StreamFilter.statsFor(dir2) == ((3L, 1L)),
      s"bounds pruning: ${streaming.StreamFilter.statsFor(dir2)}")
    assert(spark.read.parquet(s"$work/out2")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      (21L to 30L))
    sources.Iceberg.readFiltered(spark, dir2, col("k") >= 25)
      .collect(): Unit
    assert(sources.Iceberg.lastFilesPlanned == 1)
  }

  test("branch option streams a WAP stage; fast-forward continues main, no re-delivery") {
    import org.apache.spark.sql.functions.col
    val work = Files.createTempDirectory("istreamb").toString
    val dir = s"$work/t"
    def keys(out: String): Seq[Long] = spark.read.parquet(out)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    sources.Iceberg.commitAppend(
      (1L to 4L).map(i => (i, s"s$i")).toDF("k", "s"), dir) // main: snap 1
    sources.Iceberg.commitAppendToBranch(
      (5L to 6L).map(i => (i, s"s$i")).toDF("k", "s"), dir, "audit")
    sources.Iceberg.commitAppendToBranch(
      (7L to 8L).map(i => (i, s"s$i")).toDF("k", "s"), dir, "audit")
    // main is FROZEN: a main stream must not see the staged snapshots
    drain(dir, s"$work/mout", s"$work/mckpt")
    assert(keys(s"$work/mout") == (1L to 4L),
      "staged WAP snapshots must not stream from main")
    // the auditor streams the BRANCH lineage: base + both stages
    drain(dir, s"$work/aout", s"$work/ackpt", Map("branch" -> "audit"))
    assert(keys(s"$work/aout") == (1L to 8L))
    // publish; the MAIN stream's checkpoint continues — exactly the
    // published snapshots it has not seen, nothing re-delivered
    sources.Iceberg.fastForward(dir, "audit")
    drain(dir, s"$work/mout", s"$work/mckpt")
    assert(keys(s"$work/mout") == (1L to 8L),
      "after fast-forward main must deliver ONLY the new snapshots")
    // the audit stream, resumed, has nothing new either
    drain(dir, s"$work/aout", s"$work/ackpt", Map("branch" -> "audit"))
    assert(keys(s"$work/aout") == (1L to 8L))
    // a TAG refuses loudly (frozen history — batch readRef territory)
    sources.Iceberg.setRef(dir,
      "v1", sources.Iceberg.snapshotIds(dir).head, "tag"): Unit
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val e = intercept[Exception] {
      drain(dir, s"$work/tout", s"$work/tckpt", Map("branch" -> "v1"))
    }
    assert(messages(e).exists(m => m.contains("not a branch") &&
      m.contains("readRef")), s"got ${messages(e)}")
  }

  test("appends stream exactly once across restarts; renamed columns resolve by id") {
    val work = Files.createTempDirectory("istream").toString
    val dir = s"$work/t"
    val out = s"$work/out"
    val ckpt = s"$work/ckpt"
    sources.Iceberg.commitAppend(
      (1L to 5L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    drain(dir, out, ckpt)
    def rows: Seq[(Long, String)] = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows.map(_._1) == (1L to 5L))
    // RENAME (metadata-only), then append under the new name: the
    // restart must deliver only the new snapshot, and the files
    // already delivered stay delivered (offset rode the checkpoint)
    sources.Iceberg.renameColumn(dir, "s", "label")
    sources.Iceberg.commitAppend(
      (6L to 8L).map(i => (i, s"s$i")).toDF("k", "label"), dir)
    drain(dir, out, ckpt)
    assert(rows.map(_._1) == (1L to 8L), "exactly the new append")
    // a fresh consumer over the FULL history must resolve the
    // pre-rename files by field id — by-name would NULL `label`
    // for snapshots written before the rename
    drain(dir, s"$work/out2", s"$work/ckpt2")
    val full = spark.read.parquet(s"$work/out2")
    assert(full.schema.fieldNames.toSeq == Seq("k", "label"))
    assert(full.filter(org.apache.spark.sql.functions.col("label")
      .isNull).count() == 0,
      "pre-rename files must resolve by field id, never NULL")
    assert(full.collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq == (1L to 8L).map(i => (i, s"s$i")))
  }

  test("startingSnapshotId skips history at or before the given id") {
    val work = Files.createTempDirectory("istream4").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir)
    sources.Iceberg.commitAppend(
      Seq((3L, "c")).toDF("k", "s"), dir)
    drain(dir, s"$work/out", s"$work/ckpt",
      Map("startingSnapshotId" -> "1"))
    assert(spark.read.parquet(s"$work/out")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(3L),
      "only snapshot 2's rows — snapshot 1 is at the start (exclusive)")
  }

  test("partitioned appends stream with reconstructed partition columns") {
    val work = Files.createTempDirectory("istream3").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppendPartitioned(
      Seq((1L, "red"), (2L, "blue")).toDF("k", "color"), dir, Seq("color"))
    drain(dir, s"$work/out", s"$work/ckpt")
    def rows: Seq[(Long, String)] = spark.read.parquet(s"$work/out")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq((1L, "red"), (2L, "blue")),
      "partition values reconstructed from the manifest tuple")
    // the data files genuinely lack the partition column
    val dataFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/data"))
        .filter(_.getName.endsWith(".parquet"))
    }
    assert(dataFiles.nonEmpty && dataFiles.forall(f =>
      !spark.read.parquet(f.getPath).columns.contains("color")))
    // an incremental append flows with its own tuple
    sources.Iceberg.commitAppendPartitioned(
      Seq((3L, "red")).toDF("k", "color"), dir, Seq("color"))
    drain(dir, s"$work/out", s"$work/ckpt")
    assert(rows == Seq((1L, "red"), (2L, "blue"), (3L, "red")))
  }

  test("non-append snapshots refuse loudly; skipOverwriteSnapshots skips them") {
    val work = Files.createTempDirectory("istream2").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      (1L to 3L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    sources.Iceberg.commitOverwrite(
      Seq((99L, "z")).toDF("k", "s"), dir)
    val e = intercept[Exception] {
      drain(dir, s"$work/out", s"$work/ckpt")
    }
    assert(e.getMessage.contains("append stream cannot express") ||
      Option(e.getCause).exists(
        _.getMessage.contains("append stream cannot express")))
    sources.Iceberg.commitAppend(
      Seq((100L, "w")).toDF("k", "s"), dir)
    drain(dir, s"$work/out2", s"$work/ckpt2",
      Map("skipOverwriteSnapshots" -> "true"))
    assert(spark.read.parquet(s"$work/out2")
      .collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 100L),
      "the overwrite snapshot is skipped whole; appends around it land")
  }

  test("startingSnapshotId=latest skips history; only post-start snapshots stream") {
    val work = Files.createTempDirectory("istreaml").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      (1L to 5L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    drain(dir, s"$work/out", s"$work/ckpt",
      Map("startingSnapshotId" -> "latest"))
    assert(!new java.io.File(s"$work/out").exists() ||
      spark.read.parquet(s"$work/out").count() == 0)
    sources.Iceberg.commitAppend(Seq((9L, "s9")).toDF("k", "s"), dir)
    drain(dir, s"$work/out", s"$work/ckpt",
      Map("startingSnapshotId" -> "latest"))
    assert(spark.read.parquet(s"$work/out")
      .collect().map(_.getLong(0)).toSeq == Seq(9L),
      "exactly the post-start append")
  }

  test("maxFilesPerTrigger splits one backfill snapshot across batches") {
    val work = Files.createTempDirectory("istream9").toString
    val dir = s"$work/t"
    // 3 snapshots x 4 files = 12; cap 3/trigger => >=4 batches, with
    // (snapshotId, fileIndex) offsets splitting WITHIN snapshots
    (0 until 3).foreach { c =>
      sources.Iceberg.commitAppend(
        (1L to 12L).map(i => (c * 12 + i, s"s${c * 12 + i}"))
          .toDF("k", "s").repartition(4), dir)
    }
    drain(dir, s"$work/out", s"$work/ckpt",
      Map("maxFilesPerTrigger" -> "3"))
    assert(spark.read.parquet(s"$work/out")
      .collect().map(_.getLong(0)).sorted.toSeq == (1L to 36L),
      "every file exactly once across the split batches")
    val batches = new java.io.File(s"$work/ckpt/commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 4, s"expected >=4 bounded batches, got $batches")
    // byte-capped: one file per batch (progress guarantee), sizes
    // come from each manifest entry's file_size_in_bytes
    drain(dir, s"$work/out2", s"$work/ckpt2",
      Map("maxBytesPerTrigger" -> "1"))
    assert(spark.read.parquet(s"$work/out2")
      .collect().map(_.getLong(0)).sorted.toSeq == (1L to 36L))
    val byteBatches = new java.io.File(s"$work/ckpt2/commits")
      .listFiles().count(f => f.getName.forall(_.isDigit))
    assert(byteBatches >= 12,
      s"one file per byte-capped batch, got $byteBatches")
  }

  test("racing streaming writers, epoch-stamped summaries: exactly-once per appId") {
    val work = Files.createTempDirectory("istream7").toString
    val srcA = s"$work/a"
    val srcB = s"$work/b"
    val target = s"$work/target"
    (0 until 3).foreach(c => sources.Iceberg.commitAppend(
      (1L to 4L).map(i => (c * 4 + i, s"a${c * 4 + i}"))
        .toDF("k", "s"), srcA))
    (0 until 3).foreach(c => sources.Iceberg.commitAppend(
      (1L to 4L).map(i => (100 + c * 4 + i, s"b${c * 4 + i}"))
        .toDF("k", "s"), srcB))
    // the Delta racing-writers arm on THIS format's machinery:
    // exactly-once rides (streaming-app-id, streaming-epoch-id)
    // stamped into each snapshot summary — Iceberg's own streaming
    // sink rule — with the hard-link metadata CAS deciding order
    def writer(src: String, appId: String) =
      spark.readStream.format("graft-iceberg").option("path", src)
        .option("maxSnapshotsPerTrigger", "1").load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                         id: Long) =>
          if (!batch.isEmpty)
            sources.Iceberg.commitAppendIdempotent(
              batch, target, appId, id): Unit
        }
        .option("checkpointLocation", s"$work/ckpt-$appId")
        .trigger(Trigger.AvailableNow()).start()
    val q1 = writer(srcA, "w1")
    val q2 = writer(srcB, "w2")
    q1.awaitTermination()
    q2.awaitTermination()
    assert(sources.Iceberg.read(spark, target)
      .collect().map(_.getLong(0)).sorted.toSeq ==
      ((1L to 12L) ++ (101L to 112L)),
      "both writers' rows land exactly once through the CAS")
    assert(sources.Iceberg.latestStreamingEpoch(target, "w1").nonEmpty &&
      sources.Iceberg.latestStreamingEpoch(target, "w2").nonEmpty)
    // restart both: epochs already recorded — no new snapshots
    val before = sources.Iceberg.latestSnapshotId(target)
    val q3 = writer(srcA, "w1")
    val q4 = writer(srcB, "w2")
    q3.awaitTermination()
    q4.awaitTermination()
    assert(sources.Iceberg.latestSnapshotId(target) == before,
      "a quiet restart must append nothing")
    // and the DSv2 source drains the interleaved history cleanly
    drain(target, s"$work/out3", s"$work/ckpt-read")
    assert(spark.read.parquet(s"$work/out3")
      .collect().map(_.getLong(0)).sorted.toSeq ==
      ((1L to 12L) ++ (101L to 112L)))
  }

  test("add-column mid-stream fails loudly; rename streams on; restart flows it") {
    val work = Files.createTempDirectory("istream6").toString
    val dir = s"$work/t"
    val out = s"$work/out"
    val ckpt = s"$work/ckpt"
    sources.Iceberg.commitAppend(
      (1L to 3L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    val q = spark.readStream.format("graft-iceberg").option("path", dir)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(50)).start()
    q.processAllAvailable()
    assert(spark.read.parquet(out).count() == 3)
    // a RENAME mid-stream keeps every field id and type — the
    // signature is unchanged and the stream keeps going (files
    // written post-rename resolve by id into the query-start names)
    sources.Iceberg.renameColumn(dir, "s", "label")
    sources.Iceberg.commitAppend(
      Seq((4L, "s4")).toDF("k", "label"), dir)
    q.processAllAvailable()
    assert(spark.read.parquet(out).count() == 4,
      "a rename is not a schema change — the stream rides through it")
    // ADD COLUMN mid-stream: a new field id appears — the stream
    // must FAIL loudly, not silently drop `x` under the stale schema
    val old = sources.Iceberg.read(spark, dir).schema
    sources.Iceberg.evolveSchema(dir,
      org.apache.spark.sql.types.StructType(old.fields :+
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType)))
    sources.Iceberg.commitAppend(
      Seq((5L, "s5", 50L)).toDF("k", "label", "x"), dir)
    val e = intercept[Exception] {
      q.processAllAvailable()
      q.awaitTermination(30000): Unit
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("CHANGED mid-stream")),
      s"expected the loud schema-change failure, got: ${messages(e)}")
    // RESTART: the evolved schema flows; the pre-evolution files
    // read NULL for x, the new snapshot carries its values
    drain(dir, out, ckpt)
    val got = spark.read.option("mergeSchema", "true").parquet(out)
    assert(got.schema.fieldNames.contains("x"))
    assert(got.count() == 5)
    assert(got.filter(org.apache.spark.sql.functions.col("k") === 5L)
      .select("x").collect().head.getLong(0) == 50L,
      "post-restart the evolved column flows with its values")
  }

  test("equality-delete snapshots refuse with a pointer at the batch CDC path") {
    val work = Files.createTempDirectory("istream8").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      Seq((1L, "P"), (2L, "O"), (3L, "P")).toDF("k", "st"), dir)
    // the q174 upsert primitive: a DELETE snapshot removing rows BY
    // VALUE — inexpressible as an append stream, and (unlike a
    // position delete) not even attributable to files the stream
    // already delivered; the refusal names the batch CDC escape
    sources.Iceberg.deleteWhereEquality(spark, dir,
      Seq("P").toDF("st"))
    val e = intercept[Exception] {
      drain(dir, s"$work/out", s"$work/ckpt")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("append stream cannot express") &&
        m.contains("readIncremental")),
      s"the refusal must point at the batch CDC path, got ${messages(e)}")
    // skipOverwriteSnapshots skips the delete snapshot WHOLE (its
    // delete manifest must never leak as data); later appends flow
    sources.Iceberg.commitAppend(Seq((9L, "O")).toDF("k", "st"), dir)
    drain(dir, s"$work/out2", s"$work/ckpt2",
      Map("skipOverwriteSnapshots" -> "true"))
    assert(spark.read.parquet(s"$work/out2")
      .collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 9L),
      "the eq-delete snapshot skips whole; appends around it land")
  }

  test("WAP-staged branch snapshots and rolled-back snapshots never stream") {
    val work = Files.createTempDirectory("istream5").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      (1L to 3L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    // stage an append on a branch — write-audit-publish's audit
    // window: the snapshot EXISTS in the metadata (its id falls in
    // any naive id range) but main's head never moved
    sources.Iceberg.commitAppendToBranch(
      Seq((98L, "staged")).toDF("k", "s"), dir, "audit")
    // a published append AFTER the staged one — the stream must
    // deliver this and NOT the staged rows
    val published = sources.Iceberg.commitAppend(
      Seq((4L, "s4")).toDF("k", "s"), dir)
    drain(dir, s"$work/out", s"$work/ckpt")
    assert(spark.read.parquet(s"$work/out")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L),
      "the audit-branch snapshot is unpublished history — streaming " +
        "it would leak rows main never saw")
    // rollback: appends 5 then rolls back to the pre-5 head — the
    // rolled-back snapshot is in the list but off the main ancestry
    sources.Iceberg.commitAppend(
      Seq((5L, "s5")).toDF("k", "s"), dir)
    sources.Iceberg.rollbackTo(dir, published)
    drain(dir, s"$work/out2", s"$work/ckpt2")
    assert(spark.read.parquet(s"$work/out2")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L),
      "a rolled-back snapshot must not stream")
  }
}
