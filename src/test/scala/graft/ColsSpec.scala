package graft

import org.apache.spark.sql.functions._
import graft.util.Cols

/** dsum/davg must be partition-order independent — the property that
  * makes results reproducible on a real cluster AND hash-equal to the
  * DuckDB oracle (SURVEY §7.4 decimal-vs-double drift).
  */
class ColsSpec extends SparkSuite {
  import spark.implicits._

  private val values =
    (1 to 10000).map(i => (i % 7, i * 0.01 + 1.0 / (i + 3)))

  test("dsum is identical across partition layouts") {
    def total(parts: Int): Seq[(Int, Double)] =
      values.toDF("g", "x").repartition(parts)
        .groupBy("g").agg(Cols.dsum(col("x")).as("s"))
        .orderBy("g").as[(Int, Double)].collect().toSeq
    val a = total(1)
    assert(total(3) == a && total(17) == a)
  }

  test("plain double sum would NOT be stable (sanity of the concern)") {
    // not asserted inequality (could coincide); just document the check
    def total(parts: Int): Double =
      values.toDF("g", "x").repartition(parts)
        .agg(sum(col("x"))).head().getDouble(0)
    // both are finite sums of the same multiset — within float noise
    assert(math.abs(total(1) - total(13)) < 1e-6)
  }

  test("davg equals decimal sum over non-null count") {
    val df = Seq(Some(1.0), Some(2.0), None, Some(4.0)).toDF("x")
    val got = df.agg(Cols.davg(col("x"))).head().getDouble(0)
    assert(got == (1.0 + 2.0 + 4.0) / 3)
  }
}
