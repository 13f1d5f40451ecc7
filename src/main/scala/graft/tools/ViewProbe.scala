package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: attributes Tables.registerViews cost — per-table load
  * (listing + schema inference) vs view creation vs SQL analysis.
  * Not part of the gated surface. */
object ViewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    for (rep <- 1 to 3) {
      val perTable = graft.Tables.names.map { n =>
        var df: org.apache.spark.sql.DataFrame = null
        val tLoad = ms { df = graft.Tables.load(spark, sfDir, n) }
        val tView = ms(df.createOrReplaceTempView(n))
        f"$n=$tLoad%.0f+$tView%.0f"
      }
      println(s"VIEWPROBE #$rep ${perTable.mkString(" ")}")
      val tSql = ms(spark.sql(graft.ops.Olap.minCostSupplierSql))
      println(f"VIEWPROBE #$rep sql_analysis=$tSql%.1f ms")
    }
    spark.stop()
  }
}
