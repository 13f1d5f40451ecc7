package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

import graft.Tables

/** Sketch-backed operators — the approximate / prefilter layer a
  * 100 TB engine leans on when exact is unaffordable (beyond the
  * reference's surface, SURVEY §7.5).
  *
  * Gating pattern for approximate answers: the gated output carries the
  * EXACT value (oracle-checkable) plus a boolean that the sketch
  * landed within its error contract — so the DuckDB gate still
  * hash-compares every row while the sketch's accuracy is part of the
  * contract being checked (DuckDB's own sketches produce different
  * estimates, so the raw estimate can never be oracle-compared).
  */
object Sketches {

  // ---------------------------------------------------------------- q65

  /** HLL relative standard deviation: 1% → estimates on the test
    * cardinalities are well inside the 5% acceptance band. */
  val HllRsd = 0.01

  /** q65 — distinct-user counts per event type: exact countDistinct
    * next to HyperLogLog++ (`approx_count_distinct`), with the
    * within-5% check as a gated column.
    *
    * Scale: the exact path expands (type, user) before the final
    * count and is the one that hurts at 100 TB; the HLL path carries
    * a constant ~kB sketch per group through a map-side-combined
    * aggregate — the point of shipping both from one query. */
  def distinctSketch(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), HllRsd).as("hll"))
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("hll") - col("exact_users")).cast("double") <=
          lit(0.05) * col("exact_users").cast("double")).as("approx_ok"))
      .orderBy(col("event_type"))

  val distinctSketchSql: String =
    """SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS approx_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q66

  /** Order-value threshold for the "big spender" bloom demo. */
  val BigOrderThreshold = 490000.0

  /** q66 — bloom-prefiltered semi join: customers holding at least one
    * order above [[BigOrderThreshold]].
    *
    * The bloom filter on the qualifying order keys is built
    * distributed (one pass, merged sketches), ships to the probe side
    * as a ~kB binary literal inside a native codegen'd
    * `BloomFilterMightContain` — the same expression Spark's runtime
    * row-level filtering injects — and drops most probe rows BEFORE
    * the exact LeftSemi join eliminates the false positives. Result ≡
    * the plain semi join (blooms have no false negatives), which is
    * what the oracle checks; at 100 TB the win is the probe-side scan
    * emitting ~selectivity·N rows into the exchange instead of N.
    * PlansSpec asserts the expression sits in the probe scan's filter
    * and the result equality is asserted in SketchesSpec. */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > BigOrderThreshold)
      .select(col("o_custkey"))
    // expectedNumItems sized from the build side; fpp 1% keeps the
    // sketch a few kB at this cardinality
    val nKeys = math.max(bigOrders.count(), 1L)
    val bf = bigOrders.stat.bloomFilter("o_custkey", nKeys, 0.01)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val mightContain = Bridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      Bridge.expression(col("c_custkey"))))
    Tables.load(spark, dir, "customer")
      .filter(mightContain) // sketch prefilter: no false negatives
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .orderBy(col("c_custkey"))
  }

  val bloomSemiJoinSql: String =
    s"""SELECT c_custkey, c_name, c_nationkey
       |FROM customer
       |WHERE c_custkey IN
       |  (SELECT o_custkey FROM orders WHERE o_totalprice > $BigOrderThreshold)
       |ORDER BY c_custkey""".stripMargin

  /** The sketch-free spelling, for the result-equality spec. */
  private[graft] def plainSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > BigOrderThreshold)
      .select(col("o_custkey"))
    Tables.load(spark, dir, "customer")
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------- q102

  /** approx_percentile accuracy parameter: rank error ≤ 1/accuracy. */
  val PctAccuracy = 1000
  /** Tested percentiles. */
  val Pcts = Seq(0.5, 0.95)

  /** q102 — approximate QUANTILE sketch with a VERIFIED rank
    * contract: per return flag, the exact interpolated median/p95 of
    * `l_quantity` (oracle-checkable, the q52 integer-parity pattern)
    * next to `approx_percentile`'s answers, gated through the
    * guarantee the sketch actually makes. A value-distance check
    * would be meaningless (quantiles of a heavy-tie distribution jump
    * in value steps), so the contract is rank-based, ties handled
    * two-sided: some rank within ±1/[[PctAccuracy]] of the target
    * must be consistent with the returned value, i.e.
    * `count(< v)/n ≤ p + ε` and `count(≤ v)/n ≥ p − ε`.
    *
    * Scale: the sketch is one pass + an O(accuracy) merge per group
    * (the reason it exists — exact `percentile` buffers every value
    * per group); the verification join-back is test-scale work the
    * gate pays to keep the contract honest, not part of the
    * production operator. */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("q"))
    val eps = 1.0 / PctAccuracy
    val agg = li.groupBy(col("flag"))
      .agg(count(lit(1)).as("n_rows"),
        expr("percentile(q, 0.5)").as("median_exact"),
        expr("percentile(q, 0.95)").as("p95_exact"),
        expr(s"approx_percentile(q, array(${Pcts.mkString(", ")})," +
          s" $PctAccuracy)").as("apx"))
      .select(col("flag"), col("n_rows"), col("median_exact"),
        col("p95_exact"),
        col("apx").getItem(0).as("a50"), col("apx").getItem(1).as("a95"))
    val ranks = li.join(agg.select("flag", "a50", "a95"), Seq("flag"))
      .groupBy(col("flag"))
      .agg(
        (sum(when(col("q") < col("a50"), 1L).otherwise(0L)) /
          count(lit(1))).as("lt50"),
        (sum(when(col("q") <= col("a50"), 1L).otherwise(0L)) /
          count(lit(1))).as("le50"),
        (sum(when(col("q") < col("a95"), 1L).otherwise(0L)) /
          count(lit(1))).as("lt95"),
        (sum(when(col("q") <= col("a95"), 1L).otherwise(0L)) /
          count(lit(1))).as("le95"))
    agg.join(ranks, Seq("flag"))
      .select(col("flag"), col("n_rows"),
        col("median_exact"), col("p95_exact"),
        (col("lt50") <= 0.5 + eps && col("le50") >= 0.5 - eps)
          .as("ok_median"),
        (col("lt95") <= 0.95 + eps && col("le95") >= 0.95 - eps)
          .as("ok_p95"))
      .orderBy(col("flag"))
  }

  val approxQuantilesSql: String =
    """SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n_rows,
      |  quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS median_exact,
      |  quantile_cont(CAST(l_quantity AS BIGINT), 0.95) AS p95_exact,
      |  TRUE AS ok_median, TRUE AS ok_p95
      |FROM lineitem GROUP BY l_returnflag ORDER BY flag""".stripMargin
}
