package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table registry over the driver's TPC-H-ish testdata
  * (repo:TESTDATA.md). Plays the role of the reference's per-table
  * path registry (reference: spark/batch_silver.py:20-37 TABLES list,
  * spark/batch_gold.py:27-40 silver paths).
  *
  * Scale note: every load is a plain parquet scan, so Catalyst's
  * file-source pushdown (filters, column pruning, partition pruning)
  * applies unchanged whether the path is a 6 MB local file or a
  * 100 TB partitioned S3 prefix.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  /** Per-(session, dir, table) RELATION cache — the role a table
    * catalog plays in a real deployment: `spark.read.parquet` lists
    * the directory and reads parquet footers for schema inference on
    * EVERY call (~65 ms/table measured warm at sf0.1), and the gated
    * queries re-resolve the same immutable testdata tables thousands
    * of times per bench run (round-17 slice probe: 0.65–0.95 s of
    * pure driver-side re-resolution per OLAP query run — half its
    * warm wall time). The cached value is the analyzed LogicalRelation
    * handle only: schema + file listing, NO row data — every action
    * still scans parquet, so nothing here caches or precomputes
    * results. Keyed on the session object (a new session re-resolves)
    * and the exact dir string (tests over other dirs never collide).
    * The testdata dirs are immutable by contract; for mutable tables
    * the open-format connectors (DeltaLog/Iceberg) own snapshot-scoped
    * resolution and never route through here. */
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Must be on before schema inference of the ns-timestamp events table;
    // harmless for the ms/us tables. Runtime-settable SQL conf.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // collect_list/collect_set aggregates run on ObjectHashAggregateExec,
    // whose default in-memory-hash-map limit (128 distinct keys per task)
    // forces an external sort-based fallback on any real group count —
    // the shingle-group stage behind q33/q34/q50/q58 measured ~2-3x
    // slower under it. 64k keys/task is still bounded memory (the
    // per-group buffers, not the map, dominate) at any scale factor.
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
    relationCache.computeIfAbsent((spark, sfDir, name), _ => {
      val df = spark.read.parquet(path(sfDir, name))
      // events.parquet stores TIMESTAMP(NANOS) which Spark's parquet
      // reader rejects; read the raw int64 (legacy conf above) and
      // normalize to TimestampType (microsecond) here so every
      // downstream operator sees an ordinary timestamp column.
      if (name == "events") normalizeEventTs(df) else df
    })
  }

  /** Normalize the events table's `ts` to the instant type
    * (TimestampType) whatever physical spelling the generated parquet
    * carries this round:
    *  - TIMESTAMP(NANOS) → raw int64 under the legacy conf → truncate
    *    to micros (Spark has no nanos type);
    *  - tz-less TIMESTAMP(MICROS) → TIMESTAMP_NTZ under Spark 4's NTZ
    *    inference → cast; session tz is pinned UTC, so the micros are
    *    unchanged — the same values DuckDB's naive-timestamp oracle
    *    computes;
    *  - already an instant → untouched.
    * Every downstream operator (unix_micros, watermarks, windows) then
    * sees one ordinary timestamp column. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Register every testdata table as a session temp view, so the
    * engine's relational surface is reachable from plain `spark.sql`
    * text exactly like the native functions GraftExtensions injects —
    * the catalog face of the engine (SqlSurfaceSpec proves §2 gates
    * expressed as SQL text match their DataFrame spellings).
    *
    * Idempotent per (session, dir): once the ten views point at
    * `sfDir` they stay valid for the session (testdata is immutable,
    * nothing else names these views — grep-checked round 17), so
    * repeat calls skip the ~0.1 s re-registration. A call with a
    * DIFFERENT dir re-registers, so multi-SF test suites keep their
    * semantics. */
  private val viewsRegistered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  def registerViews(spark: SparkSession, sfDir: String): Unit =
    if (viewsRegistered.put(spark, sfDir) != sfDir)
      names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
