package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev plan auditor: prints the formatted physical plan of named gated
  * queries (`sbt "runMain graft.tools.Explain q86_char_diversity"`) —
  * the `.explain("formatted")` loop the build plan prescribes after
  * each operator lands. Not part of the gated surface. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      println(s"\n========== $name ==========")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
