package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** REAL JDBC sink + scan (SURVEY §2 S6/S9), previously declared
  * env-absent: the environment ships no warehouse server, but Spark's
  * own classpath carries embedded Derby (the Hive-metastore
  * dependency), so the genuine `DataFrameWriter.jdbc` /
  * `spark.read.jdbc` code paths — dialect mapping, batched inserts,
  * partitioned parallel scans — run end-to-end against an in-memory
  * database. Production points the SAME calls at ClickHouse/Postgres
  * by swapping URL + driver (reference: spark/load_warehouse.py:73-87
  * writes the warehouse over JDBC; scripts/load_to_clickhouse.py:183-198
  * batches inserts).
  *
  * Scale posture: the write is Spark's batched-insert JDBC sink (one
  * connection per partition, `batchsize` rows per round trip); the
  * read is a PARTITIONED scan — `partitionColumn` + bounds fan the
  * table over [[ScanPartitions]] concurrent queries exactly the way a
  * 1000-executor cluster would stripe a warehouse extract, with the
  * first/last stripes unbounded so out-of-range rows are never lost.
  */
object Jdbc {

  val Url = "jdbc:derby:memory:graftdb;create=true"
  val Driver = "org.apache.derby.jdbc.EmbeddedDriver"
  val ScanPartitions = 4

  private[graft] def props: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", Driver)
    p
  }

  /** q117 — JDBC ROUND TRIP: write the q03 daily summary through the
    * JDBC sink, read it back as a 4-way partitioned parallel scan,
    * and return it ordered — the gate equals q03's own oracle, so any
    * type-mapping or stripe-boundary defect (lost rows, doubled rows,
    * mangled doubles through Derby's DOUBLE) hash-mismatches. Stripe
    * bounds derive from the source's actual min/max (constants would
    * silently degenerate to one unbounded stripe at a scale factor
    * where every value clears them — the parallelism would vanish
    * while the plan still said numPartitions=4). */
  def jdbcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val src = graft.gold.Summaries.dailySalesSummary(spark, dir)
    src.write.mode(SaveMode.Overwrite).jdbc(Url, "daily_sales", props)
    val b = src.agg(org.apache.spark.sql.functions.min("total_orders"),
      org.apache.spark.sql.functions.max("total_orders")).head()
    val lo = b.getLong(0)
    val hi = math.max(b.getLong(1), lo + 1) // Spark requires lo < hi
    spark.read
      .option("partitionColumn", "total_orders")
      .option("lowerBound", lo.toString)
      .option("upperBound", hi.toString)
      .option("numPartitions", ScanPartitions.toString)
      .jdbc(Url, "daily_sales", props)
      .orderBy(col("order_date"))
  }

  val jdbcRoundtripSql: String = graft.gold.Summaries.dailySalesSummarySql
}
