package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: times named gated queries (twice each) outside the
  * bench harness. Usage:
  * `sbt "runMain graft.tools.Profile q33_ngram_jaccard q50_dedup_clusters"`
  * — no args times the full inventory. Not part of the gated surface. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    t("warmup")(graft.gold.Enrich.ordersEnriched(spark, sfDir).count())
    val names =
      if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (name <- names; rep <- 1 to 2)
      t(s"$name #$rep")(graft.SparkEntry.queries(name)(spark, sfDir).count())
    spark.stop()
  }
}
