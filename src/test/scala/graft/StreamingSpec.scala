package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.streaming.Bronze

/** Streaming bronze semantics the oracle gate can't see: multi-batch
  * execution, checkpointed restart idempotence, and partition layout. */
class StreamingSpec extends SparkSuite {

  /** Write df as a single flat parquet FILE (the file-stream source
    * lists leaf files; a nested dir-per-write layout would defeat
    * schema inference). */
  private def writeOneFile(df: org.apache.spark.sql.DataFrame,
                           dest: String): Unit = {
    val tmp = Files.createTempDirectory("onefile").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .get
    Files.createDirectories(java.nio.file.Paths.get(dest).getParent)
    Files.move(part.toPath, java.nio.file.Paths.get(dest))
  }

  test("stream ingest equals batch projection and restart adds nothing") {
    val base = Files.createTempDirectory("bronzespec").toString
    val src = s"$base/src"
    // two source files → at least two micro-batches (maxFilesPerTrigger=1)
    val events = Tables.load(spark, sfDir, "events")
    writeOneFile(events.filter(col("event_id") % 2 === 0), s"$src/a.parquet")
    writeOneFile(events.filter(col("event_id") % 2 === 1), s"$src/b.parquet")

    Bronze.ingest(spark, src, s"$base/sink", s"$base/ckpt",
      maxFilesPerTrigger = Some(1))
    val bronze = spark.read.parquet(s"$base/sink")
    assert(bronze.count() == events.count())
    // append-only at-least-once, dedup downstream: keys survive exactly
    assert(bronze.select("_key").distinct().count() == events.count())
    // partitioned by _source_table (Hive layout)
    assert(new java.io.File(s"$base/sink/_source_table=events").isDirectory)

    // restart over the same checkpoint: offsets recorded, nothing re-ingested
    Bronze.ingest(spark, src, s"$base/sink", s"$base/ckpt")
    assert(spark.read.parquet(s"$base/sink").count() == events.count())
  }

  test("stream-executed near-dup ingest equals the batch operator (q101)") {
    // the stream must reproduce q93 exactly even though its work is
    // split across ≥2 micro-batches (2 staged files, 1 per trigger)
    val viaStream = streaming.DedupIngest.streamNearDupIngest(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viaBatch = graft.ext.Dedup.incrementalNearDup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaStream.nonEmpty)
    assert(viaStream.toSeq == viaBatch.toSeq)
  }

  test("q101 cleans its temp work dir on the failure path too") {
    def q101Dirs: Set[String] = {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      Option(tmp.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("graft_q101")).map(_.getName).toSet
    }
    val before = q101Dirs
    val e = intercept[Exception] {
      streaming.DedupIngest.runIngest(spark, sfDir,
        _ => throw new RuntimeException("planted mid-stream failure"))
    }
    assert(e.getMessage != null)
    val leaked = q101Dirs -- before
    assert(leaked.isEmpty,
      s"failed stream left staging/checkpoint dirs behind: $leaked")
  }

  test("q101 replays a batch killed between sink write and checkpoint commit " +
      "without duplicating it") {
    // the exactly-once claim, exercised through THE REAL SINK: crash
    // after batch 1's output landed but before Spark recorded the
    // commit, restart over the same checkpoint — Spark re-delivers
    // batch 1, the batchId-keyed overwrite replaces its own output,
    // and the final result equals an uninterrupted run's
    val work = java.nio.file.Files.createTempDirectory("q101replay").toString
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        streaming.DedupIngest.runIngestIn(spark, sfDir, work, identity,
          afterBatch = id => if (id == 1)
            throw new RuntimeException("planted crash before commit"))
      }
      assert(e.getMessage.contains("planted crash") ||
        e.getCause.getMessage.contains("planted crash"))
      // batch 1's sink output exists even though its commit never landed
      assert(new java.io.File(s"$work/matches/batch=1").isDirectory,
        "crash was supposed to land AFTER the sink write")
      // restart: re-delivered batch replaces, then the stream finishes
      val replayed = streaming.DedupIngest.runIngestIn(
        spark, sfDir, work, identity, _ => ())
      val clean = streaming.DedupIngest.streamNearDupIngest(spark, sfDir)
      assert(replayed.count() == replayed.dropDuplicates().count(),
        "replay duplicated rows")
      assert(replayed.exceptAll(clean).isEmpty &&
        clean.exceptAll(replayed).isEmpty,
        "replayed result diverges from an uninterrupted run")
    } finally graft.util.Fs.deleteRecursively(new java.io.File(work))
  }

  test("q101 with an all-empty stream still reads back as zero matches") {
    // every micro-batch emptied by the tap → foreachBatch writes
    // nothing → only the seeded batch=-1 sink exists; the read must
    // return an empty frame with the match schema, not a path error
    val out = streaming.DedupIngest.runIngest(spark, sfDir, _.limit(0))
    assert(out.columns.toSeq == Seq("new_id", "corpus_id", "n_shared"))
    assert(out.count() == 0)
  }

  test("T4: concurrent per-topic streams with independent checkpoints") {
    // the reference runs 8 StreamingQueries in one session, one per
    // CDC topic, each with its own sink + checkpoint
    // (streaming_bronze.py:130-144); reproduce with 3 staged topics
    // driven concurrently, then prove checkpoint independence by
    // restarting ONE topic and observing no re-ingest anywhere.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global

    val base = Files.createTempDirectory("multistream").toString
    val events = Tables.load(spark, sfDir, "events")
    val topics = Seq(0, 1, 2)
    topics.foreach { t =>
      writeOneFile(events.filter(col("event_id") % 3 === t),
        s"$base/src$t/a.parquet")
    }
    val runs = topics.map { t =>
      Future(Bronze.ingest(spark, s"$base/src$t",
        s"$base/sink$t", s"$base/ckpt$t"))
    }
    Await.result(Future.sequence(runs), 120.seconds)
    val counts = topics.map(t =>
      t -> spark.read.parquet(s"$base/sink$t").count()).toMap
    assert(counts.values.sum == events.count())
    assert(counts.values.forall(_ > 0))

    // restart topic 1 only: its checkpoint already covers the file —
    // nothing new lands there, and the sibling sinks are untouched
    Bronze.ingest(spark, s"$base/src1", s"$base/sink1", s"$base/ckpt1")
    topics.foreach { t =>
      assert(spark.read.parquet(s"$base/sink$t").count() == counts(t),
        s"topic $t re-ingested after a sibling restart")
    }
  }

  test("raw json payload round-trips through from_json (silver contract)") {
    val base = Files.createTempDirectory("bronzespec2").toString
    val src = s"$base/src"
    writeOneFile(Tables.load(spark, sfDir, "events").limit(100),
      s"$src/a.parquet")
    Bronze.ingest(spark, src, s"$base/sink", s"$base/ckpt")
    val parsed = spark.read.parquet(s"$base/sink")
      .select(col("event_id"),
        from_json(col("_raw_value"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)).as("m"))
      .select(col("event_id"), col("m.event_type").as("et"))
    val direct = Tables.load(spark, sfDir, "events").limit(100)
      .select(col("event_id"), col("event_type").as("et"))
    assert(parsed.exceptAll(direct).isEmpty && direct.exceptAll(parsed).isEmpty)
  }
}
