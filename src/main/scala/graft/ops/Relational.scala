package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Standalone relational operators from SURVEY §2 that aren't part of a
  * gold/warehouse pipeline: anti join (J6), top-k (O2), set operations
  * (§2.7, beyond-reference), CASE banding (F3/P9), null-guarded
  * left-join defaults (P8/F4), filters (P6/P10/P11).
  */
object Relational {

  /** q54 — the join types the reference never writes but a replacement
    * engine must surface (SURVEY §2.3 "missing" list): FULL OUTER
    * between two aggregates with partly-disjoint key ranges (null
    * sides survive on both ends), plus an existence flag over a
    * distinct probe (the oracle-checkable spelling of semi-join
    * semantics; `"left_semi"` itself is one join-type string away).
    * One shuffle per aggregate + one on the join key. */
  def joinMatrix(spark: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.load(spark, dir, "orders")
    val events = graft.Tables.load(spark, dir, "events")
    val spend = orders.groupBy(col("o_custkey").as("id"))
      .agg(count(lit(1)).as("n_orders"),
        graft.util.Cols.dsum(col("o_totalprice")).as("spend"))
    val activity = events.groupBy(col("user_id").as("id"))
      .agg(count(lit(1)).as("n_events"))
    val purchasers = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("id")).distinct()
    spend.join(activity, Seq("id"), "full_outer")
      .join(purchasers.withColumn("has_purchase", lit(1L)), Seq("id"),
        "left")
      .select(col("id"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0d)).as("spend"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("has_purchase"), lit(0L)).as("has_purchase"))
      .orderBy(col("id"))
  }

  val joinMatrixSql: String =
    s"""WITH spend AS (
       |  SELECT o_custkey AS id, CAST(count(*) AS BIGINT) AS n_orders,
       |    ${graft.util.Cols.dsumSql("o_totalprice")} AS spend
       |  FROM orders GROUP BY 1),
       |activity AS (
       |  SELECT user_id AS id, CAST(count(*) AS BIGINT) AS n_events
       |  FROM events GROUP BY 1),
       |purchasers AS (
       |  SELECT DISTINCT user_id AS id FROM events
       |  WHERE event_type = 'purchase')
       |SELECT COALESCE(s.id, a.id) AS id,
       |  COALESCE(s.n_orders, 0) AS n_orders,
       |  COALESCE(s.spend, 0.0) AS spend,
       |  COALESCE(a.n_events, 0) AS n_events,
       |  CAST(CASE WHEN p.id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
       |    AS has_purchase
       |FROM spend s FULL OUTER JOIN activity a ON s.id = a.id
       |LEFT JOIN purchasers p ON COALESCE(s.id, a.id) = p.id
       |ORDER BY id""".stripMargin

  /** J6 + P10: left anti join — customers having no high-value order
    * (reference: scripts/data_generator.py:276-279 finds delivered
    * orders without a review via LEFT JOIN … IS NULL; Spark's
    * left_anti is the same plan without the null-probe projection).
    * Scale: anti join shuffles on the key like any equi-join; AQE can
    * convert to broadcast when the filtered right side is small. */
  def customersWithoutBigOrders(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.load(spark, dir, "customer")
    val big = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 450000.0)
    customer.join(big, customer("c_custkey") === big("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val customersWithoutBigOrdersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0)
      |ORDER BY c_custkey""".stripMargin

  /** O2: top-k — ORDER BY … LIMIT with a unique tie-break. Spark plans
    * this as TakeOrderedAndProject: per-partition heap + driver merge,
    * no global sort — the right plan at any scale. */
  def topOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  val topOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Per-group result width for [[topOrdersPerCustomer]]. */
  val TopPerGroup = 3

  /** q99 — top-k PER GROUP without a window: each customer's
    * [[TopPerGroup]] most expensive orders, ranked through the
    * k-bounded [[graft.functions.BoundedTopK]] aggregate rather than
    * `row_number() OVER (PARTITION BY …)`. The window spelling sorts
    * every group's full order list inside the exchange; the aggregate
    * collapses each (partition, customer) to ≤ k candidates BEFORE
    * the shuffle, so the exchange carries ≤ k·groups rows no matter
    * how hot a group gets — the q90/q95 plan shape proven on the
    * relational surface (PlansSpec asserts Window-free here too).
    * Decimal prices cast to double for the aggregate's buffer; both
    * engines apply the same IEEE rounding so the oracle compare is
    * exact. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        col("o_orderkey"),
        col("o_totalprice").cast("double").as("price"))
    scored.groupBy(col("o_custkey"))
      .agg(graft.functions.AggExprs.topKMin(
        -col("price"), col("o_orderkey"), TopPerGroup).as("tk"))
      .select(col("o_custkey"), posexplode(col("tk")))
      .select(col("o_custkey"), col("col.id").as("o_orderkey"),
        (col("pos") + 1).cast("int").as("rank"),
        (-col("col.score")).as("o_totalprice"))
      .orderBy(col("o_custkey"), col("rank"))
  }

  val topOrdersPerCustomerSql: String =
    s"""WITH r AS (
       |  SELECT o_custkey, o_orderkey,
       |    CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       |    row_number() OVER (PARTITION BY o_custkey
       |      ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey) AS rank
       |  FROM orders)
       |SELECT o_custkey, o_orderkey, CAST(rank AS INT) AS rank, o_totalprice
       |FROM r WHERE rank <= $TopPerGroup
       |ORDER BY o_custkey, rank""".stripMargin

  /** §2.7: set operations (beyond-reference — the reference has none;
    * SURVEY marks them as free from Dataset). Customers with both an
    * open ('O') and a finished ('F') order, minus any with a pending
    * ('P') order. INTERSECT/EXCEPT are set-semantic (dedup built in). */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    def keys(status: String) =
      orders.filter(col("o_orderstatus") === status).select(col("o_custkey"))
    keys("O").intersect(keys("F")).except(keys("P"))
      .orderBy(col("o_custkey"))
  }

  val setOpsSql: String =
    """(SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      | INTERSECT
      | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      |ORDER BY o_custkey""".stripMargin

  /** F3 + P9 + P11 + F16: CASE banding and compound predicates —
    * the product-size bucketing of the reference
    * (spark/load_warehouse.py:146-149) plus a range filter à la the
    * review-score CHECK (postgres_init/init.sql:134). */
  def partBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .filter(col("p_size").between(1, 50))
      .select(
        col("p_partkey"), col("p_size"),
        when(col("p_size") < 10, "Small")
          .when(col("p_size") < 25, "Medium")
          .otherwise("Large").as("size_category"),
        length(col("p_name")).as("name_length"),
        (col("p_retailprice") >= 950.0 && col("p_size") >= 25)
          .as("premium_large"))
      .orderBy(col("p_partkey"))

  val partBucketsSql: String =
    """SELECT p_partkey, p_size,
      |  CASE WHEN p_size < 10 THEN 'Small'
      |       WHEN p_size < 25 THEN 'Medium'
      |       ELSE 'Large' END AS size_category,
      |  CAST(length(p_name) AS INT) AS name_length,
      |  (p_retailprice >= 950.0 AND p_size >= 25) AS premium_large
      |FROM part WHERE p_size BETWEEN 1 AND 50 ORDER BY p_partkey""".stripMargin

  /** P8 + F4: null-guarded defaults after an outer join — supplier
    * enriched with its (possibly absent) nation of a filtered subset,
    * every null defaulted via coalesce (reference: ~25 coalesce uses,
    * spark/load_warehouse.py:205-241). */
  def nullHandling(spark: SparkSession, dir: String): DataFrame = {
    val supplier = Tables.load(spark, dir, "supplier")
    // keep only a slice of nations so some suppliers miss the join
    val nation = Tables.load(spark, dir, "nation")
      .filter(col("n_nationkey") < 12)
    supplier.join(broadcast(nation),
        supplier("s_nationkey") === nation("n_nationkey"), "left")
      .select(
        col("s_suppkey"), col("s_name"),
        col("n_name").isNotNull.as("has_nation"),
        coalesce(col("n_name"), lit("NONE")).as("nation_name"),
        coalesce(col("n_regionkey"), lit(-1)).as("region_key"),
        when(col("s_acctbal").isNull, 0.0)
          .otherwise(col("s_acctbal")).as("acctbal"))
      .orderBy(col("s_suppkey"))
  }

  val nullHandlingSql: String =
    """SELECT s_suppkey, s_name,
      |  (n_name IS NOT NULL) AS has_nation,
      |  coalesce(n_name, 'NONE') AS nation_name,
      |  CAST(coalesce(n_regionkey, -1) AS INT) AS region_key,
      |  CASE WHEN s_acctbal IS NULL THEN 0.0 ELSE s_acctbal END AS acctbal
      |FROM supplier LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 12) n
      |  ON s_nationkey = n_nationkey
      |ORDER BY s_suppkey""".stripMargin
}
