package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-time analytics over the `events` stream table — the
  * Structured-Streaming surface the reference leaves on the table
  * (SURVEY T5 marks watermarks/windows/state "absent"): tumbling
  * event-time windows and gap-based sessionization. Both are defined
  * BATCH-first here (oracle-checkable in DuckDB), and the streaming
  * executions in [[StatefulStreams]] are held to these results by
  * batch-equivalence specs — the same discipline as q43.
  *
  * Scale: both queries shuffle once on their natural key
  * (window×type / user) and aggregate map-side first; sessionization's
  * window sort is per-user, so skew is bounded by the hottest user —
  * the salting pattern in `ops/Salt` applies if one user dominates.
  */
object Sessions {

  // ---------------------------------------------------------------- q44

  /** Tumbling 1-hour event-time windows per event_type, via the
    * built-in `window()` (the streaming-native construct, usable
    * unchanged under `readStream` + watermark). */
  def windowedCounts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.util.Cols.dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("win_start_us"), col("event_type"))
  }

  val windowedCountsSql: String =
    s"""SELECT
       |  date_diff('microsecond', TIMESTAMP '1970-01-01',
       |            time_bucket(INTERVAL 1 HOUR, ts)) AS win_start_us,
       |  event_type,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  ${graft.util.Cols.dsumSql("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""".stripMargin

  // ---------------------------------------------------------------- q45

  /** Session gap: a new session starts after >= 30 min of user silence. */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** Gap-based sessionization, batch form: lag + cumulative-sum of
    * session-start markers — the standard SQL shape, one shuffle on
    * user_id reused by both windows. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val marked = e.withColumn("new_session",
      when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) >= SessionGapUs
        || lag(col("ts_us"), 1).over(byUser).isNull, 1L).otherwise(0L))
    marked
      .withColumn("session_no", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
      .orderBy(col("user_id"), col("session_no"))
  }

  val sessionizeSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, value,
       |    date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS ts_us
       |  FROM events),
       |m AS (
       |  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w >= $SessionGapUs
       |                   OR lag(ts_us) OVER w IS NULL
       |            THEN 1 ELSE 0 END AS new_session
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |s AS (
       |  SELECT *, sum(new_session) OVER (
       |    PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS UNBOUNDED PRECEDING) AS session_no
       |  FROM m)
       |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  min(ts_us) AS start_us, max(ts_us) AS end_us
       |FROM s GROUP BY user_id, session_no
       |ORDER BY user_id, session_no""".stripMargin

  // ---------------------------------------------------------------- q76

  /** q76 — the NATIVE session-window spelling of q45: one
    * `groupBy(user, session_window(ts, gap))` instead of the
    * lag + cumulative-sum island construction. BOUNDARY CONTRACT:
    * Spark's merging iterator starts a new session only when
    * `next.ts > prev.ts + gap` (verified against
    * MergingSessionsIterator: the compare is strict-greater), so an
    * event landing EXACTLY gap after its predecessor MERGES — one
    * boundary event different from q45, whose island predicate
    * `diff >= gap` splits there (and whose streaming twin does too).
    * The oracle below uses the native operator's `>` so the gate
    * pins the real engine semantics rather than papering over the
    * off-by-boundary; the window END is last event + gap by
    * definition, so the oracle derives it as max(ts) + gap.
    *
    * Why both spellings exist: session_window runs UNCHANGED under
    * readStream + watermark (the streaming-native path, state evicted
    * by watermark), while the island form is the portable batch shape
    * every SQL engine can run — the gate proves they agree. */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        graft.util.Cols.dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start_us"))
  }

  val sessionWindowsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, value,
       |    date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS ts_us
       |  FROM events),
       |m AS (
       |  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > $SessionGapUs
       |                   OR lag(ts_us) OVER w IS NULL
       |            THEN 1 ELSE 0 END AS new_session
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |s AS (
       |  SELECT *, sum(new_session) OVER (
       |    PARTITION BY user_id ORDER BY ts_us, event_id
       |    ROWS UNBOUNDED PRECEDING) AS session_no
       |  FROM m)
       |SELECT user_id,
       |  min(ts_us) AS session_start_us,
       |  max(ts_us) + $SessionGapUs AS session_end_us,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  ${graft.util.Cols.dsumSql("value")} AS sum_value
       |FROM s GROUP BY user_id, session_no
       |ORDER BY user_id, session_start_us""".stripMargin

  // ---------------------------------------------------------------- q67

  /** Attribution window: a purchase counts for a click that happened
    * at most this long before it. */
  val AttributionWindowUs: Long = 3600L * 1000000

  /** q67 — click→purchase attribution: per user, purchases landing
    * within [[AttributionWindowUs]] AFTER a click by the same user
    * (inclusive both ends), rolled up to per-user pair counts and lag
    * bounds. Batch definition of the stream-stream interval join —
    * [[StatefulStreams.clickAttributionStream]] executes the same
    * join under two watermarked streams and is held to this result.
    *
    * Scale: equi-join on user_id (the interval predicate stays a
    * post-join filter — Spark has no interval-join physical operator
    * in batch, and the per-user match set is small); the rollup rides
    * the same user_id exchange under AQE. In streaming the interval
    * bound is what lets the state store EVICT: each side holds only
    * the watermark horizon of rows. */
  def clickAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("click_us"))
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("us").as("buy_us"))
    clicks.join(buys,
        col("user_id") === col("p_user") &&
          col("buy_us") >= col("click_us") &&
          col("buy_us") <= col("click_us") + AttributionWindowUs)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("buy_us") - col("click_us")).as("min_lag_us"),
        max(col("buy_us") - col("click_us")).as("max_lag_us"))
      .orderBy(col("user_id"))
  }

  val clickAttributionSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type,
       |    date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS us
       |  FROM events)
       |SELECT c.user_id,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  min(p.us - c.us) AS min_lag_us,
       |  max(p.us - c.us) AS max_lag_us
       |FROM e c JOIN e p ON c.user_id = p.user_id
       |  AND c.event_type = 'click' AND p.event_type = 'purchase'
       |  AND p.us >= c.us AND p.us <= c.us + $AttributionWindowUs
       |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin

  // ---------------------------------------------------------------- q144

  /** q144 — UNATTRIBUTED funnel: the LEFT OUTER spelling of q67's
    * interval join — every click keeps a row, matched or not, and the
    * per-user rollup separates converted from abandoned clicks. The
    * outer interval join is the semantics corner the inner q67 never
    * exercises (null-padding on no match within the window); in
    * streaming it is exactly the case where the watermark decides a
    * click will never match and EMITS the null row —
    * [[StatefulStreams.clickAttributionOuterStream]] runs this same
    * join under two watermarked streams and StatefulStreamsSpec holds
    * it to this batch definition.
    *
    * Scale: same single user_id exchange as q67; abandoned clicks add
    * no state beyond the watermark horizon either way. */
  def unattributedFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("click_us"))
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("us").as("buy_us"))
    clicks.join(buys,
        col("user_id") === col("p_user") &&
          col("buy_us") >= col("click_us") &&
          col("buy_us") <= col("click_us") + AttributionWindowUs,
        "left_outer")
      .groupBy(col("user_id"))
      .agg(
        countDistinct(col("click_us")).as("n_clicks"),
        count(col("buy_us")).as("n_pairs"),
        countDistinct(when(col("buy_us").isNull, col("click_us")))
          .as("n_abandoned"))
      .orderBy(col("user_id"))
  }

  val unattributedFunnelSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type,
       |    date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS us
       |  FROM events),
       |c AS (SELECT user_id, us AS click_us FROM e
       |      WHERE event_type = 'click'),
       |p AS (SELECT user_id AS p_user, us AS buy_us FROM e
       |      WHERE event_type = 'purchase')
       |SELECT c.user_id,
       |  CAST(count(DISTINCT c.click_us) AS BIGINT) AS n_clicks,
       |  CAST(count(p.buy_us) AS BIGINT) AS n_pairs,
       |  CAST(count(DISTINCT CASE WHEN p.buy_us IS NULL
       |    THEN c.click_us END) AS BIGINT) AS n_abandoned
       |FROM c LEFT OUTER JOIN p ON c.user_id = p.p_user
       |  AND p.buy_us >= c.click_us
       |  AND p.buy_us <= c.click_us + $AttributionWindowUs
       |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin
}
