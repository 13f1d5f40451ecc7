package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.Quality

/** The expectation suite must actually catch each violation class —
  * proven on a corpus with every class planted (the driver corpus is
  * clean, so the gated run is all-zero). */
class QualitySpec extends SparkSuite {
  import spark.implicits._

  test("each planted violation moves exactly its own counter") {
    val dir = Files.createTempDirectory("quality").toString
    Seq(
      // (orderkey, custkey, status, totalprice)
      (1L, Option(10L), "O", 100.0),   // clean
      (2L, None, "O", 100.0),          // null custkey (also escapes FK)
      (3L, Option(10L), "X", 100.0),   // bad status
      (4L, Option(10L), "F", -5.0),    // price out of range
      (4L, Option(10L), "F", 100.0),   // duplicate orderkey
      (5L, Option(99L), "P", 100.0))   // orphan custkey
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(10L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = Quality.ordersExpectations(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "not_null_custkey" -> 1L,
      "status_domain" -> 1L,
      "price_range" -> 1L,
      "unique_orderkey" -> 1L,
      "fk_custkey" -> 1L), got.toString)
  }

  test("the driver corpus passes every expectation") {
    val got = Quality.ordersExpectations(spark, sfDir).collect()
    assert(got.length == 5)
    assert(got.forall(_.getLong(1) == 0L), got.mkString(", "))
  }
}
