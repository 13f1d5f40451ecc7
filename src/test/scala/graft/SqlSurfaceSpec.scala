package graft

/** The engine's relational surface through `spark.sql` end-to-end:
  * with the testdata registered as temp views ([[Tables.registerViews]]),
  * representative §2 gates written as PLAIN SQL TEXT must reproduce
  * their DataFrame spellings exactly — same columns, same types, same
  * rows in the same order. Together with ExtensionsSpec (native
  * functions injected via SparkSessionExtensions) this is the
  * "engine, not script library" contract: a SQL-only user gets the
  * same answers as the Column API.
  */
class SqlSurfaceSpec extends SparkSuite {

  Tables.registerViews(spark, sfDir)

  private def assertSqlMatches(df: org.apache.spark.sql.DataFrame,
                               sql: String): Unit = {
    val viaSql = spark.sql(sql)
    assert(viaSql.columns.toSeq == df.columns.toSeq,
      s"column names differ: ${viaSql.columns.toSeq} vs ${df.columns.toSeq}")
    assert(viaSql.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)),
      s"column types differ:\n ${viaSql.schema}\n ${df.schema}")
    val a = viaSql.collect().toSeq
    val b = df.collect().toSeq
    assert(a.nonEmpty && a == b,
      s"rows differ (sql ${a.size} vs df ${b.size})")
  }

  private val dsum = (c: String) =>
    s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  test("q01 order-items rollup as plain SQL text (A1)") {
    assertSqlMatches(
      gold.Enrich.orderItemsRollup(spark, sfDir),
      s"""SELECT l_orderkey,
         |  count(*) AS total_items,
         |  ${dsum("l_quantity")} AS total_qty,
         |  ${dsum("l_extendedprice")} AS total_price,
         |  count(DISTINCT l_partkey) AS unique_parts,
         |  count(DISTINCT l_suppkey) AS unique_suppliers
         |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)
  }

  test("q14 daily revenue MV as plain SQL text (A9)") {
    assertSqlMatches(
      warehouse.Views.mvDailyRevenue(spark, sfDir),
      s"""SELECT date_format(l_shipdate, 'yyyy-MM-dd') AS ship_date,
         |  count(*) AS line_count,
         |  count(DISTINCT l_orderkey) AS unique_orders,
         |  count(DISTINCT l_partkey) AS unique_parts,
         |  ${dsum("l_extendedprice")} AS revenue,
         |  ${dsum("l_quantity")} / count(l_quantity) AS avg_qty
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  test("q06 flagship enrichment as plain SQL text (J1/P2/F3-F10)") {
    assertSqlMatches(
      gold.Enrich.ordersEnriched(spark, sfDir),
      s"""WITH items AS (
         |  SELECT l_orderkey,
         |    count(*) AS total_items,
         |    ${dsum("l_quantity")} AS total_qty,
         |    ${dsum("l_extendedprice")} AS items_price,
         |    count(DISTINCT l_partkey) AS unique_parts
         |  FROM lineitem GROUP BY l_orderkey),
         |geo AS (
         |  SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
         |    n.n_name AS nation_name, r.r_name AS region_name
         |  FROM customer c
         |  LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  LEFT JOIN region r ON n.n_regionkey = r.r_regionkey)
         |SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
         |  o.o_orderpriority, o.o_totalprice,
         |  date_format(o.o_orderdate, 'yyyy-MM-dd') AS order_date,
         |  year(o.o_orderdate) AS order_year,
         |  month(o.o_orderdate) AS order_month,
         |  dayofweek(o.o_orderdate) AS order_dow,
         |  g.c_name, g.c_mktsegment,
         |  coalesce(g.nation_name, 'UNKNOWN') AS nation_name,
         |  coalesce(g.region_name, 'UNKNOWN') AS region_name,
         |  coalesce(i.total_items, 0L) AS total_items,
         |  coalesce(i.total_qty, 0.0D) AS total_qty,
         |  coalesce(i.items_price, 0.0D) AS items_price,
         |  coalesce(i.unique_parts, 0L) AS unique_parts,
         |  CASE WHEN o.o_totalprice < 50000 THEN 'low'
         |       WHEN o.o_totalprice < 150000 THEN 'mid'
         |       ELSE 'high' END AS price_band
         |FROM orders o
         |LEFT JOIN geo g ON o.o_custkey = g.c_custkey
         |LEFT JOIN items i ON o.o_orderkey = i.l_orderkey
         |ORDER BY o.o_orderkey""".stripMargin)
  }
}
