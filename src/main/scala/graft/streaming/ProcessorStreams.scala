package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, Trigger, TTLConfig,
  ValueState}

/** Spark 4's ARBITRARY-STATE API: `transformWithState` with a
  * [[StatefulProcessor]] over the RocksDB state store — the successor
  * to `mapGroupsWithState` (typed per-key state handles, TTL,
  * timers, composite state). [[StatefulStreams]] covers the classic
  * API; this module proves the engine speaks the new one with the
  * same batch-equivalence discipline: the stream's converged output
  * must equal the batch groupBy, whatever the micro-batch split.
  *
  * Scale: state is ONE small record per user key in RocksDB
  * (spillable off-heap, the reason transformWithState mandates it),
  * each trigger touches only that batch's keys, and no trigger ever
  * re-scans history — the O(delta) contract every 100 TB streaming
  * aggregate needs.
  */
object ProcessorStreams {

  case class UserEvent(user_id: Long, ts_us: Long)
  case class UserAgg(n: Long, minUs: Long, maxUs: Long)
  case class UserOut(user_id: Long, n_events: Long,
                     first_us: Long, last_us: Long)

  /** Running per-user aggregate in a [[ValueState]]: each micro-batch
    * folds its rows into the key's state and emits the key's CURRENT
    * totals; downstream keeps the last emission per key (the CDC
    * latest-per-key pattern, W1), so the converged answer equals the
    * batch groupBy regardless of trigger boundaries. Only
    * order-insensitive measures (count/min/max) — a running double
    * sum would make the result depend on fold order. */
  class RunningUserAgg extends StatefulProcessor[Long, UserEvent, UserOut] {
    @transient private var state: ValueState[UserAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserAgg]("agg",
        Encoders.product[UserAgg], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timers: TimerValues): Iterator[UserOut] = {
      var agg =
        if (state.exists()) state.get()
        else UserAgg(0L, Long.MaxValue, Long.MinValue)
      rows.foreach { e =>
        agg = UserAgg(agg.n + 1,
          math.min(agg.minUs, e.ts_us), math.max(agg.maxUs, e.ts_us))
      }
      state.update(agg)
      Iterator.single(UserOut(key, agg.n, agg.minUs, agg.maxUs))
    }
  }

  private def stageEventsInto(spark: SparkSession, dir: String,
                              srcDir: String): Unit =
    graft.Tables.load(spark, dir, "events")
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      .repartition(2) // ≥2 files → ≥2 triggers → state genuinely
      .write.parquet(srcDir) // crosses micro-batch boundaries

  /** q175 — STATEFUL PROCESSOR (transformWithState): the per-user
    * running aggregate through the new API, converged across
    * micro-batches. A processor that dropped state between triggers
    * undercounts every user with events in two batches; one that
    * emitted stale state misses the last batch's rows — both
    * hash-mismatch the batch groupBy oracle. Always cold (fresh
    * checkpoint per call; staging session-cached — the q123
    * discipline). */
  def statefulUserAgg(spark: SparkSession, dir: String): DataFrame = {
    val stage = Staging.staged(spark, "q175",
        graft.Tables.path(new java.io.File(dir).getCanonicalPath,
          "events")) { d =>
      stageEventsInto(spark, dir, s"$d/events_in")
    }
    val work =
      java.nio.file.Files.createTempDirectory("graft_q175").toString
    try statefulUserAggFrom(spark, s"$stage/events_in", work)
    finally graft.util.Fs.deleteRecursively(new java.io.File(work))
  }

  /** The stream core over a caller-owned work dir (spec seam: the
    * per-batch emission log under `work/sink` is inspectable). */
  private[graft] def statefulUserAggFrom(spark: SparkSession,
      srcDir: String, work: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // transformWithState mandates the RocksDB state store; scope the
    // conf to this query and restore after — sibling streams keep
    // whatever provider their checkpoints were created with
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val sinkDir = s"$work/sink"
      val out = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
        .as[UserEvent]
        .groupByKey(_.user_id)
        .transformWithState(new RunningUserAgg,
          TimeMode.None(), OutputMode.Update(), Encoders.product[UserOut])
      val q = out.writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", s"$work/_checkpoint")
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[UserOut], batchId: Long) =>
            ds.write.mode("overwrite").parquet(s"$sinkDir/batch=$batchId")
        }
        .start()
      q.awaitTermination()
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("batch").desc)
      spark.read.parquet(sinkDir)
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("user_id"), col("n_events"),
          col("first_us"), col("last_us"))
        .orderBy(col("user_id"))
        .localCheckpoint() // pin before the temp sink is deleted
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  case class TsEvent(user_id: Long, ts_ms: Long, ts: java.sql.Timestamp)
  case class OpenSess(startMs: Long, endMs: Long, n: Long)
  case class SessClose(user_id: Long, start_ms: Long, end_ms: Long,
                       n_events: Long, via_timer: Boolean)

  /** Gap sessionization with EVENT-TIME TIMERS — the API surface the
    * classic `flatMapGroupsWithState` sessionizer cannot express
    * directly: an idle session is closed by [[handleExpiredTimer]]
    * when the WATERMARK passes its end + gap, not by the arrival of
    * the user's next event. In-batch closures (a new session starting
    * within one batch) still emit inline; the timer catches the tail
    * — sessions whose users simply went quiet, which at 100 TB/day is
    * most of them. Stale timers (superseded by later events extending
    * the session) are detected against state and ignored rather than
    * chased with deleteTimer — re-registration is cheap, correctness
    * sits in the expiry check. */
  class GapSessionTimers(gapMs: Long)
      extends StatefulProcessor[Long, TsEvent, SessClose] {
    @transient private var open: ValueState[OpenSess] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSess]("open",
        Encoders.product[OpenSess], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TsEvent],
        timers: TimerValues): Iterator[SessClose] = {
      val out = Seq.newBuilder[SessClose]
      // event-time order within the batch: the state fold is
      // order-sensitive (cross-batch order is the source's contract —
      // the staging writes time-split files)
      val sorted = rows.toSeq.sortBy(_.ts_ms)
      var cur = if (open.exists()) Some(open.get()) else None
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts_ms - s.endMs <= gapMs =>
            cur = Some(OpenSess(s.startMs, math.max(s.endMs, e.ts_ms),
              s.n + 1))
          case Some(s) =>
            out += SessClose(key, s.startMs, s.endMs, s.n,
              via_timer = false)
            cur = Some(OpenSess(e.ts_ms, e.ts_ms, 1))
          case None =>
            cur = Some(OpenSess(e.ts_ms, e.ts_ms, 1))
        }
      }
      cur.foreach { s =>
        open.update(s)
        // close when the watermark proves no extension can arrive
        getHandle.registerTimer(s.endMs + gapMs)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessClose] = {
      if (!open.exists()) Iterator.empty
      else {
        val s = open.get()
        // a stale timer (session extended past it) fires early: the
        // real close is still registered, ignore this one
        if (expired.getExpiryTimeInMs < s.endMs + gapMs) Iterator.empty
        else {
          open.clear()
          Iterator.single(
            SessClose(key, s.startMs, s.endMs, s.n, via_timer = true))
        }
      }
    }
  }

  /** Spec seam: run the timer sessionizer over a staged time-split
    * source (file A = early half, file B = late half, one file per
    * trigger so the watermark genuinely advances BETWEEN batches and
    * timers fire on the event-time clock). Returns every emitted
    * closure with its emission source. */
  private[graft] def gapSessionsWithTimers(spark: SparkSession,
      srcDir: String, work: String, gapMs: Long,
      delay: String): DataFrame = {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val sinkDir = s"$work/sink"
      val out = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
        .withWatermark("ts", delay)
        .as[TsEvent]
        .groupByKey(_.user_id)
        .transformWithState(new GapSessionTimers(gapMs),
          TimeMode.EventTime(), OutputMode.Append(),
          Encoders.product[SessClose])
      val q = out.writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", s"$work/_checkpoint")
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[SessClose], batchId: Long) =>
            ds.write.mode("overwrite")
              .parquet(s"$sinkDir/batch=$batchId")
        }
        .start()
      q.awaitTermination()
      spark.read.parquet(sinkDir).drop("batch").localCheckpoint()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  val statefulUserAggSql: String =
    """SELECT user_id,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  min(date_diff('microsecond', TIMESTAMP '1970-01-01', ts))
      |    AS first_us,
      |  max(date_diff('microsecond', TIMESTAMP '1970-01-01', ts))
      |    AS last_us
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
}
