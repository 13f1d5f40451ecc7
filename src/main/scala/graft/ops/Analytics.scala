package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Cols

/** Multi-level aggregation surface beyond the reference (SURVEY §2.4
  * notes the reference has no grouping sets / rollup / pivot; Spark
  * provides them natively and a warehouse replacement needs them).
  *
  * Scale: ROLLUP expands to grouping-set tuples inside one Expand +
  * hash aggregate — one shuffle, rows ×(levels) out of the map side;
  * pivot is a single hash aggregate whose output width is the pivoted
  * cardinality (keep the IN-list explicit at 100 TB — never let it
  * infer from a distinct scan).
  */
object Analytics {

  // ---------------------------------------------------------------- q46

  /** Revenue rolled up (year, month) → (year) → grand total, with an
    * explicit grouping level so every engine names the subtotal rows
    * identically. */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.rollup(year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"))
      .agg(count(lit(1)).as("n_orders"),
        Cols.dsum(col("o_totalprice")).as("revenue"),
        grouping_id().cast("long").as("lvl"))
      .orderBy(col("lvl"), col("order_year"), col("order_month"))
  }

  val rollupRevenueSql: String =
    s"""SELECT year(o_orderdate) AS order_year,
       |  month(o_orderdate) AS order_month,
       |  CAST(count(*) AS BIGINT) AS n_orders,
       |  ${Cols.dsumSql("o_totalprice")} AS revenue,
       |  CAST(GROUPING(year(o_orderdate)) * 2
       |     + GROUPING(month(o_orderdate)) AS BIGINT) AS lvl
       |FROM orders
       |GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
       |ORDER BY lvl, order_year, order_month""".stripMargin

  // ---------------------------------------------------------------- q47

  private val EventTypes = Seq("click", "view", "purchase", "signup", "error")

  /** Event counts per user pivoted into one column per event type —
    * explicit IN-list (never inferred), count(*) per cell, 0-filled. */
  def pivotEventCounts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    e.groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .orderBy(col("user_id"))
  }

  val pivotEventCountsSql: String = {
    val cells = EventTypes.map(t =>
      s"CAST(count(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS \"$t\"")
      .mkString(",\n  ")
    s"""SELECT user_id,
       |  $cells
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }
}
