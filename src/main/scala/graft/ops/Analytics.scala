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

  // ---------------------------------------------------------------- q55

  /** Analytic window surface the reference never uses (SURVEY §2.5:
    * "no analytic lag/lead, no frames"): 7-row moving average over
    * daily revenue plus day-over-day delta via lag. Frame sums run in
    * exact decimal (order-independent), surfaced as double divisions
    * of identical operands in both engines.
    *
    * Scale note: an unpartitioned orderBy window serializes onto one
    * task — correct here (one row per day), and the pattern at 100 TB
    * is to window WITHIN a partition key (month) carrying a 6-row
    * overlap, or a range frame on a bucketed key. */
  def movingRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(Cols.dsum(col("o_totalprice")).as("revenue"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("order_date"))
    val ma = w.rowsBetween(-6, 0)
    daily.select(col("order_date"), col("revenue"),
        (sum(col("revenue").cast("decimal(18,2)")).over(ma).cast("double") /
          count(lit(1)).over(ma)).as("ma7"),
        (col("revenue") - lag(col("revenue"), 1).over(w)).as("delta"))
      .orderBy(col("order_date"))
  }

  val movingRevenueSql: String =
    s"""WITH daily AS (
       |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       |    ${Cols.dsumSql("o_totalprice")} AS revenue
       |  FROM orders GROUP BY 1)
       |SELECT order_date, revenue,
       |  CAST(sum(CAST(revenue AS DECIMAL(18,2))) OVER ma AS DOUBLE)
       |    / count(*) OVER ma AS ma7,
       |  revenue - lag(revenue, 1) OVER (ORDER BY order_date) AS delta
       |FROM daily
       |WINDOW ma AS (ORDER BY order_date ROWS BETWEEN 6 PRECEDING
       |              AND CURRENT ROW)
       |ORDER BY order_date""".stripMargin

  val pivotEventCountsSql: String = {
    val cells = EventTypes.map(t =>
      s"CAST(count(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS \"$t\"")
      .mkString(",\n  ")
    s"""SELECT user_id,
       |  $cells
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------- q78

  /** q78 — CUBE over (year, status): all four grouping sets in one
    * pass (rollup q46 covers the hierarchical prefix sets; CUBE adds
    * the (status)-only slice), with grouping_id as the level
    * discriminator and coalesced labels so the subtotal rows carry no
    * NULL ambiguity. One expand + one aggregate exchange — the expand
    * multiplies input by the grouping-set count BEFORE the map-side
    * combine, the standard CUBE cost model. */
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.cube(year(col("o_orderdate")).as("order_year"),
        col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_orders"),
        Cols.dsum(col("o_totalprice")).as("revenue"),
        grouping_id().cast("long").as("lvl"))
      .select(
        coalesce(col("order_year").cast("string"), lit("ALL")).as("order_year"),
        coalesce(col("status"), lit("ALL")).as("status"),
        col("n_orders"), col("revenue"), col("lvl"))
      .orderBy(col("lvl"), col("order_year"), col("status"))
  }

  val cubeRevenueSql: String =
    s"""SELECT
       |  coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS order_year,
       |  coalesce(o_orderstatus, 'ALL') AS status,
       |  CAST(count(*) AS BIGINT) AS n_orders,
       |  ${Cols.dsumSql("o_totalprice")} AS revenue,
       |  CAST(GROUPING(year(o_orderdate)) * 2 + GROUPING(o_orderstatus)
       |    AS BIGINT) AS lvl
       |FROM orders
       |GROUP BY CUBE (year(o_orderdate), o_orderstatus)
       |ORDER BY lvl, order_year, status""".stripMargin

  // ---------------------------------------------------------------- q132

  /** q132 — explicit GROUPING SETS with a MIXED set list that neither
    * ROLLUP (q46) nor CUBE (q78) can spell: ((year, status),
    * (status, priority), (year), ()) — two 2-D slices sharing no
    * hierarchy plus one 1-D slice and the grand total. grouping_id
    * over (year, status, priority) is the discriminator (bit order =
    * the grouping-column list, mirrored in the oracle as
    * GROUPING(a)*4 + GROUPING(b)*2 + GROUPING(c)); labels coalesce to
    * 'ALL' so subtotal rows carry no NULL ambiguity.
    *
    * Scale: identical cost model to CUBE — one Expand multiplying
    * input by the set count (4×, vs CUBE's 2^n) feeding one partial +
    * final hash aggregate; the set list bounds the expansion exactly,
    * which is the point of spelling the sets explicitly at 100 TB. */
  def groupingSetsRevenue(spark: SparkSession, dir: String): DataFrame = {
    // ONE SQL text for both engines (the q119+ OLAP-tier discipline):
    // Spark parses GROUPING SETS + GROUPING() natively, and the shared
    // spelling sidesteps the Dataset-groupingSets quirk where
    // grouping()/grouping_id() number bits over the internal expanded
    // attribute list instead of the declared grouping columns.
    Tables.registerViews(spark, dir)
    spark.sql(groupingSetsRevenueSql)
  }

  val groupingSetsRevenueSql: String =
    s"""SELECT
       |  coalesce(CAST(year(o_orderdate) AS STRING), 'ALL') AS order_year,
       |  coalesce(o_orderstatus, 'ALL') AS status,
       |  coalesce(o_orderpriority, 'ALL') AS priority,
       |  CAST(count(*) AS BIGINT) AS n_orders,
       |  ${Cols.dsumSql("o_totalprice")} AS revenue,
       |  CAST(GROUPING(year(o_orderdate)) * 4 + GROUPING(o_orderstatus) * 2
       |    + GROUPING(o_orderpriority) AS BIGINT) AS lvl
       |FROM orders
       |GROUP BY GROUPING SETS ((year(o_orderdate), o_orderstatus),
       |  (o_orderstatus, o_orderpriority), (year(o_orderdate)), ())
       |ORDER BY lvl, order_year, status, priority""".stripMargin

  // ---------------------------------------------------------------- q70

  /** q70 — ranking/distribution window suite per customer order
    * history: row_number, ntile quartiles, percent_rank, cume_dist,
    * first/nth value, and a 3-row running sum. The ordering key
    * (o_orderdate, o_orderkey) is TOTAL, so every ranking function is
    * deterministic and ANSI RANGE/ROWS default-frame differences
    * can't bite (no peer rows).
    *
    * Scale: all eight functions ride ONE exchange + sort on
    * o_custkey — Catalyst collapses same-spec window functions into a
    * single WindowExec; the running sum folds in exact decimal. */
  def windowSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val run3 = w.rowsBetween(-2, 0)
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        row_number().over(w).as("rn"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        first_value(col("o_totalprice")).over(w).as("first_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(run3)
          .cast("double").as("run3_sum"))
      .orderBy(col("o_orderkey"))
  }

  val windowSuiteSql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(row_number() OVER w AS INT) AS rn,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  first_value(o_totalprice) OVER w AS first_price,
      |  nth_value(o_totalprice, 2) OVER w AS second_price,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS run3_sum
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q105

  /** q105 — RETENTION COHORT MATRIX over the event stream: users
    * cohorted by first-activity day, one row per (cohort, day offset)
    * with the surviving distinct-user count and exact retention rate —
    * the product-analytics staple every warehouse replacement gets
    * asked for (the Amplitude/Mixpanel "retention" chart as one
    * query).
    *
    * Scale: the event stream is shuffled ONCE — a single per-user
    * aggregation produces both the first-activity day and the
    * distinct-day set (bounded by the observation window, ≤31 here,
    * ≤365 for a year — a set, never the raw events), so cohort, size,
    * and offsets all derive from the user-sized table without
    * touching events again; the cohort-size table is days×1 rows and
    * broadcasts. The retention ratio divides two exact longs, so the
    * double is bit-identical on both engines. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val perUser = e.groupBy(col("user_id"))
      .agg(to_date(min(col("ts"))).as("cohort_day"),
        collect_set(to_date(col("ts"))).as("days"))
    val agg = perUser
      .select(col("user_id"), col("cohort_day"),
        explode(col("days")).as("act_day"))
      .withColumn("day_offset", datediff(col("act_day"), col("cohort_day")))
      .groupBy(col("cohort_day"), col("day_offset"))
      // each user appears at most once per (cohort, offset): days is a
      // SET and cohort_day is functional on user — plain count IS the
      // distinct-user count, without distinct-aggregate machinery
      .agg(count(lit(1)).as("active_users"))
    // cohort_size = the offset-0 row's count (a user's first day is in
    // their day set by construction), read back with a window over the
    // cohort×offset table — deriving it from a second events pass
    // would re-shuffle the fact stream (column pruning makes the two
    // per-user subplans differ, so exchange reuse can't save it)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_day"))
    agg
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0, col("active_users"))).over(w))
      .select(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("cohort_size"), col("active_users"),
        (col("active_users").cast("double") / col("cohort_size"))
          .as("retention_rate"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  val retentionCohortsSql: String =
    """WITH f AS (
      |  SELECT user_id, CAST(min(ts) AS DATE) AS cd FROM events GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS ad FROM events),
      |s AS (SELECT cd, CAST(count(*) AS BIGINT) AS cohort_size FROM f GROUP BY 1),
      |j AS (
      |  SELECT a.user_id, f.cd,
      |    CAST(date_diff('day', f.cd, a.ad) AS INT) AS day_offset
      |  FROM a JOIN f USING (user_id))
      |SELECT strftime(j.cd, '%Y-%m-%d') AS cohort_day, j.day_offset,
      |  s.cohort_size,
      |  CAST(count(DISTINCT j.user_id) AS BIGINT) AS active_users,
      |  CAST(count(DISTINCT j.user_id) AS DOUBLE) / s.cohort_size
      |    AS retention_rate
      |FROM j JOIN s USING (cd)
      |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q107

  /** Conversion windows for the q107 funnel: a click counts only
    * within 6 hours of the first signup, a purchase only within 24
    * hours of that click. */
  val FunnelClickWindowHours = 6
  val FunnelPurchaseWindowHours = 24

  /** q107 — ORDERED FUNNEL: signup → click (≤6 h later) → purchase
    * (≤24 h after the click), one row per user with the event time of
    * each stage reached and the furthest stage. Strict event-time
    * ordering between stages — the sequence matters, not mere
    * presence, which is what separates a funnel from three filters.
    * Stage times surface as unix MICROS (the q09 ts_us precedent: the
    * raw parquet is nanosecond-precision, Spark truncates to µs, so
    * every comparison and output must happen at µs on both engines or
    * sub-µs residue flips ties).
    *
    * Scale: each stage is filter → per-user min — three aggregations
    * all keyed on user_id (one partitioning reused), each consuming
    * the previous stage's (small) per-user table on the same key.
    * No window over the raw stream, no self-join of events×events. */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val clickW = FunnelClickWindowHours.toLong * 3600L * 1000000L
    val buyW = FunnelPurchaseWindowHours.toLong * 3600L * 1000000L
    val users = e.select(col("user_id")).distinct()
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("signup_us"))
    val s2 = e.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("us") > col("signup_us") &&
        col("us") <= col("signup_us") + clickW)
      .groupBy(col("user_id")).agg(min(col("us")).as("click_us"))
    val s3 = e.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("us") > col("click_us") &&
        col("us") <= col("click_us") + buyW)
      .groupBy(col("user_id")).agg(min(col("us")).as("purchase_us"))
    users
      .join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("signup_us"), col("click_us"),
        col("purchase_us"),
        when(col("purchase_us").isNotNull, 3)
          .when(col("click_us").isNotNull, 2)
          .when(col("signup_us").isNotNull, 1)
          .otherwise(0).as("funnel_stage"))
      .orderBy(col("user_id"))
  }

  val funnelStagesSql: String = {
    val us = "date_diff('microsecond', TIMESTAMP '1970-01-01', e.ts)"
    val clickW = FunnelClickWindowHours.toLong * 3600L * 1000000L
    val buyW = FunnelPurchaseWindowHours.toLong * 3600L * 1000000L
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |s1 AS (
       |  SELECT e.user_id, min($us) AS signup_us FROM events e
       |  WHERE e.event_type = 'signup' GROUP BY 1),
       |s2 AS (
       |  SELECT e.user_id, min($us) AS click_us
       |  FROM events e JOIN s1 USING (user_id)
       |  WHERE e.event_type = 'click' AND $us > s1.signup_us
       |    AND $us <= s1.signup_us + $clickW
       |  GROUP BY 1),
       |s3 AS (
       |  SELECT e.user_id, min($us) AS purchase_us
       |  FROM events e JOIN s2 USING (user_id)
       |  WHERE e.event_type = 'purchase' AND $us > s2.click_us
       |    AND $us <= s2.click_us + $buyW
       |  GROUP BY 1)
       |SELECT u.user_id, s1.signup_us, s2.click_us, s3.purchase_us,
       |  CAST(CASE WHEN s3.purchase_us IS NOT NULL THEN 3
       |            WHEN s2.click_us IS NOT NULL THEN 2
       |            WHEN s1.signup_us IS NOT NULL THEN 1
       |            ELSE 0 END AS INT) AS funnel_stage
       |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
       |  LEFT JOIN s3 USING (user_id)
       |ORDER BY user_id""".stripMargin
  }
}
