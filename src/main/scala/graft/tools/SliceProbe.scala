package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: slices one gated query's wall time into (fixture/view
  * registration + DataFrame construction) vs (planning) vs
  * (execution), twice, so per-query fixed costs are attributable.
  * Not part of the gated surface. */
object SliceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    println(f"warmup ${ms(graft.gold.Enrich.ordersEnriched(spark, sfDir).count())}%8.1f ms")
    for (name <- args; rep <- 1 to 2) {
      var df: org.apache.spark.sql.DataFrame = null
      val tBuild = ms { df = graft.SparkEntry.queries(name)(spark, sfDir) }
      val tPlan = ms(df.queryExecution.executedPlan)
      val tExec = ms(df.count())
      println(f"SLICE $name%-36s #$rep build=$tBuild%8.1f plan=$tPlan%8.1f exec=$tExec%8.1f ms")
    }
    spark.stop()
  }
}
