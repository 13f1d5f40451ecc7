package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the testdata parquet files carry ONE row group each, so
  * every scan runs as one working task no matter the split count. This
  * probe quantifies what that single thread spends on decode vs the
  * partial aggregation Spark fuses into the scan stage, and whether an
  * explicit exchange after the scan (decode single-threaded, aggregate
  * parallel) pays. Not part of the gated surface. */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Unit = {
      // min of 3 after one warm
      f
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.min
      println(f"SCANPROBE $label%-44s $best%8.1f ms")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val l = graft.Tables.load(spark, sfDir, "lineitem")
    t("lineitem all-col decode")(noop(l))
    t("lineitem 3-col decode")(noop(l.select("l_partkey", "l_suppkey", "l_extendedprice")))
    val ps = l.groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice").cast("decimal(18,2)")).as("ps_mincost"))
    t("ps agg fused (partial agg in scan stage)")(noop(ps))
    val psRep = l.select("l_partkey", "l_suppkey", "l_extendedprice")
      .repartition(cpus.toInt)
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice").cast("decimal(18,2)")).as("ps_mincost"))
    t("ps agg after explicit repartition")(noop(psRep))
    println("ps distinct groups: " + ps.count())
    spark.stop()
  }
}
