package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Slowly-changing-dimension construction from a change stream — the
  * keep-all-versions sibling of the CDC latest-per-key compaction
  * (reference: spark/batch_silver.py window-dedup keeps ONLY the
  * latest; SCD2 is what the warehouse keeps when history must remain
  * queryable, and pairs with q53's as-of join for point-in-time
  * reads).
  */
object Scd {

  // ---------------------------------------------------------------- q72

  /** q72 — SCD Type-2 versions of each user's event_type "state":
    * consecutive runs collapse to one version row with
    * [effective_from_us, effective_to_us) validity (to = next
    * version's from; open version → NULL + is_current). Two window
    * passes — change-point filter, then lead() for the interval end —
    * both on the SAME (user_id; ts, event_id) spec, so Catalyst plans
    * ONE exchange + sort.
    *
    * Scale: state per user is bounded by version count, not event
    * count; the change-point filter drops the unchanged majority
    * BEFORE the second window materializes intervals. */
  def scd2UserState(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val changes = e
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
    changes
      .withColumn("version_no", row_number().over(w))
      .withColumn("effective_to_us", lead(col("ts_us"), 1).over(w))
      .select(col("user_id"), col("version_no").cast("int").as("version_no"),
        col("event_type").as("state"),
        col("ts_us").as("effective_from_us"),
        col("effective_to_us"),
        col("effective_to_us").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version_no"))
  }

  val scd2UserStateSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS ts_us
      |  FROM events),
      |c AS (
      |  SELECT * FROM (
      |    SELECT *, lag(event_type) OVER
      |      (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
      |    FROM e)
      |  WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT user_id,
      |  CAST(row_number() OVER w AS INT) AS version_no,
      |  event_type AS state,
      |  ts_us AS effective_from_us,
      |  lead(ts_us) OVER w AS effective_to_us,
      |  lead(ts_us) OVER w IS NULL AS is_current
      |FROM c
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      |ORDER BY user_id, version_no""".stripMargin
}
