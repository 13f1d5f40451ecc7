package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality expectation checking — the constraint layer a lakehouse
  * runs before promoting a batch (the reference trusts its Postgres
  * schema; a lake table has no engine-enforced constraints, so the
  * check IS the constraint).
  *
  * Design: every row-local expectation folds into ONE aggregate over
  * ONE scan (a violation is `sum(when(bad, 1))` — 100 TB cost = the
  * scan you were already paying); cross-table expectations
  * (referential integrity) are one anti-join each, with the dimension
  * side broadcast. Results come back as (check_name, n_violations)
  * rows, so the promote/quarantine decision is `max(n_violations) ==
  * 0` — no driver-side iteration over checks.
  */
object Quality {

  // ---------------------------------------------------------------- q75

  /** q75 — the orders expectation suite: NOT NULL, domain membership,
    * value range, key uniqueness (all one scan) + referential
    * integrity to customer (one broadcast anti-join). All-zero on the
    * driver corpus — QualitySpec plants each violation class and
    * watches the right counter move. */
  def ordersExpectations(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val rowLocal = o.agg(
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
        .as("not_null_custkey"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("status_domain"),
      sum(when(!col("o_totalprice").between(0.0, 1000000.0), 1L).otherwise(0L))
        .as("price_range"),
      (count(lit(1)) - countDistinct(col("o_orderkey")))
        .as("unique_orderkey"))
    val unpivoted = rowLocal.selectExpr(
      """stack(4,
        |  'not_null_custkey', not_null_custkey,
        |  'price_range', price_range,
        |  'status_domain', status_domain,
        |  'unique_orderkey', unique_orderkey)
        |  AS (check_name, n_violations)""".stripMargin)
    // nulls excluded on BOTH engines: a NULL key is the NOT NULL
    // check's violation, and SQL `NOT IN` would silently drop it while
    // an anti-join would count it — the explicit filter pins one
    // semantic
    val orphans = o.filter(col("o_custkey").isNotNull)
      .join(broadcast(Tables.load(spark, dir, "customer")
          .select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("fk_custkey").as("check_name"), col("n_violations"))
    unpivoted.unionByName(orphans).orderBy(col("check_name"))
  }

  val ordersExpectationsSql: String =
    """SELECT 'fk_custkey' AS check_name, CAST(
      |  (SELECT count(*) FROM orders o
      |   WHERE o.o_custkey IS NOT NULL
      |     AND o.o_custkey NOT IN (SELECT c_custkey FROM customer))
      |  AS BIGINT) AS n_violations
      |UNION ALL
      |SELECT 'not_null_custkey', CAST(
      |  (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
      |UNION ALL
      |SELECT 'price_range', CAST(
      |  (SELECT count(*) FROM orders
      |   WHERE o_totalprice NOT BETWEEN 0.0 AND 1000000.0) AS BIGINT)
      |UNION ALL
      |SELECT 'status_domain', CAST(
      |  (SELECT count(*) FROM orders
      |   WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
      |UNION ALL
      |SELECT 'unique_orderkey', CAST(
      |  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS BIGINT)
      |ORDER BY check_name""".stripMargin
}
