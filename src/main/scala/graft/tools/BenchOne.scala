package graft
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { q =>
      // warm once? gates are always-cold; time two runs
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, sf).count()
        println(f"BENCHONE $q run$i ${(System.nanoTime()-t0)/1e9}%.2f s rows $n")
      }
    }
    spark.stop()
  }
}
