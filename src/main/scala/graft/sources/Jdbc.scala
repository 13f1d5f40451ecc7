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
    * mangled doubles through Derby's DOUBLE) hash-mismatches.
    *
    * The stripe column is the row's day OFFSET from the summary's own
    * min date — GAP-FREE over its integer range wherever the dates are
    * dense, so all [[ScanPartitions]] stripes carry real rows at every
    * scale factor (SourcesSpec asserts it). Two rejected keys: raw
    * `total_orders` clustered tightly around the daily mean and could
    * leave stripes empty or skewed; a `yyyymmdd` int has dead integer
    * ranges (days 32-99, months 13-99 — ~70% of the space), so a
    * summary spanning a narrow window could still produce an empty
    * arithmetic stripe. Bounds derive from the data (constants would
    * silently degenerate to one unbounded stripe at a scale factor
    * where every value clears them); the first/last stripes stay
    * unbounded by Spark's JDBC contract, so no row is ever lost to a
    * bounds bug. An empty source skips the partitioned read entirely —
    * min/max of nothing is null, and the contract is
    * empty-in/empty-out, not an NPE. */
  def jdbcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{datediff, lit, max, min}
    val base = graft.gold.Summaries.dailySalesSummary(spark, dir)
    val b = base.agg(min("order_date"), max("order_date")).head()
    val src =
      if (b.isNullAt(0)) base.withColumn("date_key", lit(0))
      else base.withColumn("date_key", datediff(
        col("order_date").cast("date"),
        lit(b.getString(0)).cast("date")))
    src.write.mode(SaveMode.Overwrite).jdbc(Url, "daily_sales", props)
    val reader =
      if (b.isNullAt(0)) spark.read // empty table: nothing to stripe
      else {
        val hi = math.max(java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(b.getString(0)),
          java.time.LocalDate.parse(b.getString(1))), 1L) // lo < hi
        spark.read
          .option("partitionColumn", "date_key")
          .option("lowerBound", "0")
          .option("upperBound", hi.toString)
          .option("numPartitions", ScanPartitions.toString)
      }
    reader.jdbc(Url, "daily_sales", props)
      .drop("date_key")
      .orderBy(col("order_date"))
  }

  val jdbcRoundtripSql: String = graft.gold.Summaries.dailySalesSummarySql
}
