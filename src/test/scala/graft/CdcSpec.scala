package graft

import org.apache.spark.sql.functions._
import graft.cdc.Cdc

/** Unit tests for the CDC core on hand-built frames (SURVEY §5.2):
  * out-of-order timestamps, tombstones, merge convergence.
  */
class CdcSpec extends SparkSuite {
  import spark.implicits._

  // (key, seq, op, payload) — seq plays the CDC timestamp
  private val log = Seq(
    ("a", 3L, "u", "a-v3"),
    ("a", 1L, "c", "a-v1"),
    ("a", 2L, "u", "a-v2"), // out of order: arrives after seq 3
    ("b", 1L, "c", "b-v1"),
    ("b", 2L, "d", "b-dead"), // tombstone is the latest for b
    ("c", 5L, "c", "c-v5")
  ).toDF("k", "seq", "op", "v")

  test("latestPerKey keeps the max-seq row regardless of arrival order") {
    val got = Cdc.latestPerKey(log, Seq("k"), Seq(col("seq").desc))
      .orderBy("k").collect()
    assert(got.map(r => (r.getString(0), r.getString(3))).toSeq ==
      Seq(("a", "a-v3"), ("b", "b-dead"), ("c", "c-v5")))
  }

  test("latestPerKey is idempotent") {
    val once = Cdc.latestPerKey(log, Seq("k"), Seq(col("seq").desc))
    val twice = Cdc.latestPerKey(once, Seq("k"), Seq(col("seq").desc))
    assert(once.orderBy("k", "seq").collect().toSeq ==
      twice.orderBy("k", "seq").collect().toSeq)
  }

  test("soft-delete filter drops tombstoned keys after compaction") {
    val state = Cdc.latestPerKey(log, Seq("k"), Seq(col("seq").desc))
      .filter(col("op") =!= "d")
    assert(state.select("k").as[String].collect().sorted.toSeq == Seq("a", "c"))
  }

  test("merge convergence: any split of the log yields the same state") {
    val full = Cdc.latestPerKey(log, Seq("k"), Seq(col("seq").desc))
      .orderBy("k").collect().toSeq
    for (cut <- 1L to 4L) {
      val target = Cdc.latestPerKey(log.filter(col("seq") < cut),
        Seq("k"), Seq(col("seq").desc))
      val source = log.filter(col("seq") >= cut)
      val merged = Cdc.latestPerKey(target.unionByName(source),
        Seq("k"), Seq(col("seq").desc))
      assert(merged.orderBy("k").collect().toSeq == full, s"cut=$cut")
    }
  }

  test("tie on the order column is broken deterministically by extra key") {
    val ties = Seq(("x", 1L, 10L, "first"), ("x", 1L, 20L, "second"))
      .toDF("k", "seq", "id", "v")
    val got = Cdc.latestPerKey(ties, Seq("k"),
      Seq(col("seq").desc, col("id").desc))
    assert(got.select("v").as[String].collect().toSeq == Seq("second"))
  }
}
