package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the q84 pipeline: runs pipelineGold twice and prints
  * the per-stage wall times ([[graft.Pipeline.lastRunMetrics]]) of
  * each run — isolates which layer pays a first-run-in-session cost.
  * Not part of the gated surface. */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.Pipeline.pipelineGold(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      val m = graft.Pipeline.lastRunMetrics.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(", ")
      println(f"PIPE #$rep total $total%.1f s :: $m")
    }
    spark.stop()
  }
}
