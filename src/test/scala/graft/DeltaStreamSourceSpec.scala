package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** `readStream.format("graft-delta")` — the DSv2 MicroBatchStream
  * over the open Delta log. Spark's own streaming engine drives
  * offsets/recovery; these specs pin the source's contract: appends
  * stream exactly once across restarts, OPTIMIZE commits are silent,
  * data-removing commits refuse loudly unless skipChangeCommits. */
class DeltaStreamSourceSpec extends SparkSuite {
  import spark.implicits._

  private def drain(dir: String, out: String, ckpt: String,
                    extra: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream.format("graft-delta").option("path", dir)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("appends stream exactly once across restarts; OPTIMIZE is silent") {
    val work = Files.createTempDirectory("dstream").toString
    val dir = s"$work/t"
    val out = s"$work/out"
    val ckpt = s"$work/ckpt"
    def outKeys: Seq[Long] = spark.read.parquet(out)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    sources.DeltaLog.commitAppend(
      (1L to 5L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    sources.DeltaLog.commitAppend(
      (6L to 10L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    drain(dir, out, ckpt)
    assert(outKeys == (1L to 10L))
    // OPTIMIZE (dataChange=false) contributes NOTHING — a source
    // that leaked it would redeliver every row; the next append
    // flows incrementally from the checkpointed offset
    sources.DeltaLog.compact(spark, dir, targetFiles = 1)
    sources.DeltaLog.commitAppend(
      (11L to 12L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    drain(dir, out, ckpt)
    assert(outKeys == (1L to 12L),
      "exactly the new append — no compaction rows, no duplicates")
    // a quiet restart is a no-op (the offset rode Spark's checkpoint)
    drain(dir, out, ckpt)
    assert(outKeys == (1L to 12L))
  }

  test("data-removing commits refuse loudly; skipChangeCommits skips them") {
    val work = Files.createTempDirectory("dstream2").toString
    val dir = s"$work/t"
    sources.DeltaLog.commitAppend(
      (1L to 4L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    drain(dir, s"$work/out", s"$work/ckpt")
    // an OVERWRITE removes data — an append stream cannot express it
    sources.DeltaLog.commitOverwrite(
      Seq((99L, "z")).toDF("k", "s"), dir)
    val e = intercept[Exception] {
      drain(dir, s"$work/out", s"$work/ckpt")
    }
    assert(e.getMessage.contains("removes data") ||
      Option(e.getCause).exists(_.getMessage.contains("removes data")))
    // Delta's own escape hatch: skipChangeCommits skips the whole
    // commit; a later append flows (fresh sink/checkpoint — the
    // failed run above poisoned nothing, but keeps the arms simple)
    sources.DeltaLog.commitAppend(
      Seq((100L, "w")).toDF("k", "s"), dir)
    drain(dir, s"$work/out2", s"$work/ckpt2",
      Map("skipChangeCommits" -> "true"))
    val got = spark.read.parquet(s"$work/out2")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 100L),
      "the overwrite commit is skipped whole; appends around it land")
  }

  test("startingVersion skips history before the given version") {
    val work = Files.createTempDirectory("dstream6").toString
    val dir = s"$work/t"
    sources.DeltaLog.commitAppend(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir)
    sources.DeltaLog.commitAppend(
      Seq((3L, "c")).toDF("k", "s"), dir)
    drain(dir, s"$work/out", s"$work/ckpt",
      Map("startingVersion" -> "1"))
    assert(spark.read.parquet(s"$work/out")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(3L),
      "only version 1's rows — version 0 is before the start")
  }

  test("maxVersionsPerTrigger drains a backlog in bounded batches") {
    val work = Files.createTempDirectory("dstream4").toString
    val dir = s"$work/t"
    (1 to 6).foreach(i => sources.DeltaLog.commitAppend(
      Seq((i.toLong, s"s$i")).toDF("k", "s"), dir))
    // 6 commits, 2 per trigger: AvailableNow must still drain ALL of
    // them (in 3 bounded batches), exactly once
    drain(dir, s"$work/out", s"$work/ckpt",
      Map("maxVersionsPerTrigger" -> "2"))
    assert(spark.read.parquet(s"$work/out")
      .collect().map(_.getLong(0)).sorted.toSeq == (1L to 6L))
    // the progress log shows >1 committed batch — the cap was real
    val batches = new java.io.File(s"$work/ckpt/commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 3, s"expected >=3 bounded batches, got $batches")
  }

  test("q195 shape: stream->txn-sink hop is exactly-once across a sink-side crash") {
    val work = Files.createTempDirectory("dstream5").toString
    val dir = s"$work/bronze"
    val silver = s"$work/silver"
    sources.DeltaLog.commitAppend(
      (1L to 4L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    sources.DeltaLog.commitAppend(
      (5L to 8L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    def silverKeys: Seq[Long] = sources.DeltaLog.read(spark, silver)
      .collect().map(_.getLong(0)).sorted.toSeq
    // CRASH planted AFTER the sink commit, BEFORE the engine records
    // the batch — the tightest window; on restart the engine
    // redelivers the batch under the SAME id and the txn watermark
    // must make the redelivery invisible
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def run(crashOnce: Boolean): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("path", dir).load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                         id: Long) =>
          if (!batch.isEmpty) {
            sources.DeltaLog.commitAppendIdempotent(
              batch, silver, "etl", id): Unit
            if (crashOnce && crashed.compareAndSet(false, true))
              throw new RuntimeException("planted crash after sink commit")
          }
        }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    intercept[Exception] { run(crashOnce = true) }
    val afterCrash = silverKeys // the sink commit happened
    assert(afterCrash.nonEmpty)
    run(crashOnce = false)
    assert(silverKeys == (1L to 8L),
      "the redelivered batch must be skipped by its txn watermark — " +
        "every row exactly once")
    // and the silver table's txn history shows each batch ONCE
    assert(sources.DeltaLog.latestTxnVersion(silver, "etl").nonEmpty)
  }

  test("typed columns survive the executor-side Group reader") {
    val work = Files.createTempDirectory("dstream3").toString
    val dir = s"$work/t"
    val df = spark.sql(
      """SELECT id AS k, CAST(id AS DOUBLE) / 4 AS d,
        |  CONCAT('s', id) AS s, id % 2 = 0 AS b,
        |  TIMESTAMP'2024-03-01 10:00:00' + make_interval(0,0,0,0,0,0,id)
        |    AS ts,
        |  DATE'2024-03-01' + CAST(id AS INT) AS dt
        |FROM range(1, 6)""".stripMargin)
    sources.DeltaLog.commitAppend(df, dir)
    drain(dir, s"$work/out", s"$work/ckpt")
    val got = spark.read.parquet(s"$work/out").orderBy(col("k"))
    val want = df.orderBy(col("k"))
    assert(got.schema == want.schema)
    assert(got.collect().toSeq == want.collect().toSeq,
      "every primitive type round-trips bit-exact through the stream")
  }
}
