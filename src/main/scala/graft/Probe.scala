package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe: schema + timestamp handling of the testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"entry rows = ${SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
