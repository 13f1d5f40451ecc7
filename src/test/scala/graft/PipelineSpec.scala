package graft

import java.nio.file.Files

/** The composed pipeline writes every layer, with the layouts the
  * scale design promises (bronze partitioned by source table, fact
  * partitioned monthly). */
class PipelineSpec extends SparkSuite {

  test("pipeline writes all layers with expected layouts and rows") {
    val out = Files.createTempDirectory("pipeline_out").toString
    Pipeline.run(spark, sfDir, out)

    val tables = Seq(
      "bronze/events", "silver/events_state",
      "warehouse/dim_customer", "warehouse/dim_order_status",
      "warehouse/dim_time", "warehouse/fact_order_lines",
      "warehouse/mv_daily_revenue", "warehouse/mv_monthly_revenue",
      "warehouse/mv_nation_revenue", "warehouse/mv_hourly_pattern")
    tables.foreach { t =>
      assert(spark.read.parquet(s"$out/$t").count() > 0, s"$t is empty")
    }
    // gold publishes as versioned snapshot tables
    val goldTables = Seq("gold/orders_enriched", "gold/daily_sales_summary",
      "gold/customer_segments", "gold/product_performance")
    goldTables.foreach { t =>
      assert(sources.Snapshots.read(spark, s"$out/$t").count() > 0,
        s"$t is empty")
    }

    // layout contracts
    assert(new java.io.File(s"$out/bronze/events/_source_table=events")
      .isDirectory, "bronze not partitioned by source table")
    val monthDirs = new java.io.File(s"$out/warehouse/fact_order_lines")
      .listFiles().filter(_.getName.startsWith("month_key="))
    assert(monthDirs.length > 1, "fact not partitioned monthly")

    // lineage: the bronze-sourced silver state must equal compacting
    // the raw log directly (stream→bronze→silver ≡ batch path)
    val viaBronze = spark.read.parquet(s"$out/silver/events_state")
    val direct = cdc.Cdc.silverCompaction(spark, sfDir)
    assert(viaBronze.exceptAll(direct).isEmpty &&
      direct.exceptAll(viaBronze).isEmpty,
      "bronze-sourced silver diverges from direct compaction")

    // referential sanity: every fact row's order exists in gold
    val fact = spark.read.parquet(s"$out/warehouse/fact_order_lines")
    val gold = sources.Snapshots.read(spark, s"$out/gold/orders_enriched")
    assert(fact.join(gold, fact("l_orderkey") === gold("o_orderkey"),
      "left_anti").count() == 0, "fact rows reference missing orders")

    // rerun: the checkpointed bronze ingest must not re-append; gold
    // gains a version whose LATEST content is unchanged (and v0 stays
    // readable — time travel)
    val bronzeRows = spark.read.parquet(s"$out/bronze/events").count()
    Pipeline.run(spark, sfDir, out)
    assert(spark.read.parquet(s"$out/bronze/events").count() == bronzeRows,
      "pipeline rerun duplicated bronze rows")
    val goldDir = s"$out/gold/orders_enriched"
    assert(sources.Snapshots.versions(goldDir) == Seq(0, 1))
    val v0 = sources.Snapshots.readVersion(spark, goldDir, 0)
    val v1 = sources.Snapshots.read(spark, goldDir)
    assert(v0.exceptAll(v1).isEmpty && v1.exceptAll(v0).isEmpty,
      "gold rerun changed content")

    // observe-based write metrics rode the write jobs (no extra scans)
    val metrics = Pipeline.lastRunMetrics
    assert(metrics("events_state") ==
      spark.read.parquet(s"$out/silver/events_state").count())
    assert(metrics.get("mv_daily_revenue").exists(_ > 0))
  }
}
