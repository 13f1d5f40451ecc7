package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** F6/F7/F8/F9: the reference's timestamp codec surface — CDC
  * micros→timestamp decode (spark/batch_gold.py:60-64), unix-seconds
  * arithmetic for response hours (spark/load_warehouse.py:316-318),
  * datediff day math (spark/batch_gold.py:142-143).
  *
  * All epoch math is integer-exact, so the oracle comparison is
  * bit-stable; the only float is the final hours division, computed
  * from identical integers in both engines.
  */
object TimeFns {

  def timestampCodec(spark: SparkSession, dir: String): DataFrame = {
    val epoch0 = lit("2024-01-01 00:00:00").cast("timestamp")
    Tables.load(spark, dir, "events")
      .select(
        col("event_id"),
        unix_micros(col("ts")).as("epoch_us"),
        // F6: micros → timestamp round-trip, re-formatted as string
        date_format(timestamp_micros(unix_micros(col("ts"))),
          "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        // F8: unix-seconds arithmetic → hours since epoch0
        ((unix_timestamp(col("ts")) - unix_timestamp(epoch0)) / 3600.0)
          .as("hours_since"),
        // F9: day difference
        datediff(col("ts"), epoch0).as("days_since"))
      .orderBy(col("event_id"))
  }

  val timestampCodecSql: String =
    """SELECT event_id,
      |  date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS epoch_us,
      |  strftime(CAST(date_trunc('second', ts) AS TIMESTAMP),
      |           '%Y-%m-%d %H:%M:%S') AS ts_str,
      |  (date_diff('second', TIMESTAMP '1970-01-01', ts)
      |    - epoch(TIMESTAMP '2024-01-01')) / 3600.0 AS hours_since,
      |  CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS INT) AS days_since
      |FROM events ORDER BY event_id""".stripMargin
}
