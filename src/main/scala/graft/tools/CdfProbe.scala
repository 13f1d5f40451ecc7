package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the CDF read paths: builds a Delta table with a
  * heavy deletion-vector delete (the delete-heavy CDC backlog shape),
  * drains `graft-delta-cdf` with `vectorizedRead` on and off, and
  * prints both wall times — the measured evidence behind the
  * filtered-columnar claim ([[graft.streaming.RowReadSupport
  * .filteredColumnarReader]]). Not part of the gated surface. */
object CdfProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROWS", "5000000").toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    val work = java.nio.file.Files.createTempDirectory("cdfprobe").toString
    val dir = s"$work/t"
    graft.sources.DeltaLog.commitOverwrite(
      spark.range(rows).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v",
        "CONCAT('s', id) AS s"), dir)
    // DV-delete half the rows: every CDF partition of this commit is
    // DV-filtered — exactly the path the probe measures
    graft.sources.DeltaLog.deleteWhere(spark, dir, col("k") % 2 === 0)
    def drain(vectorized: Boolean, tag: String): Double = {
      val t0 = System.nanoTime()
      spark.readStream.format("graft-delta-cdf").option("path", dir)
        .option("vectorizedRead", vectorized.toString).load()
        .writeStream.format("noop")
        .option("checkpointLocation", s"$work/ckpt-$tag")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    for (rep <- 1 to 2) {
      val row = drain(vectorized = false, s"row$rep")
      val col = drain(vectorized = true, s"col$rep")
      println(f"CDFPROBE #$rep rows=$rows row=$row%.2fs columnar=$col%.2fs " +
        f"speedup=${row / col}%.2fx")
    }
    spark.stop()
  }
}
