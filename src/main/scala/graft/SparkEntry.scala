package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is a named query here; each
  * SQL-expressible one has a DuckDB oracle in [[oracleSql]] with
  * identical output column names (driver hash-compares after sorting
  * columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    gold.Enrich.ordersEnriched(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_order_items_rollup" -> (gold.Enrich.orderItemsRollup _),
    "q06_orders_enriched"    -> (gold.Enrich.ordersEnriched _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_order_items_rollup" -> gold.Enrich.orderItemsRollupSql,
    "q06_orders_enriched"    -> gold.Enrich.ordersEnrichedSql
  )
}
