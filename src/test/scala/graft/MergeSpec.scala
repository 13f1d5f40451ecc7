package graft

import org.apache.spark.sql.functions._
import graft.silver.Merge

/** The general MERGE API: matched rows update, unmatched insert,
  * untouched persist; multi-row sources resolve by version. */
class MergeSpec extends SparkSuite {
  import spark.implicits._

  private val target = Seq(
    (1L, 10L, "t1"), (2L, 10L, "t2"), (3L, 10L, "t3"))
    .toDF("id", "ver", "v")

  test("upsert: source beats target, inserts new keys, keeps the rest") {
    val source = Seq((2L, 5L, "s2"), (4L, 1L, "s4")).toDF("id", "ver", "v")
    val out = Merge.upsert(target, source, Seq("id"), "ver")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    // source wins on id=2 even with LOWER version (unconditional, as
    // whenMatchedUpdateAll); id=4 inserts; 1 and 3 persist
    assert(out == Seq((1L, "t1"), (2L, "s2"), (3L, "t3"), (4L, "s4")))
  }

  test("upsert with multi-row source resolves by version desc") {
    val source = Seq((2L, 5L, "old"), (2L, 9L, "new")).toDF("id", "ver", "v")
    val out = Merge.upsert(target, source, Seq("id"), "ver")
      .filter(col("id") === 2L).collect()
    assert(out.length == 1 && out(0).getString(2) == "new")
  }

  test("merge with custom ordering reproduces latest-per-key") {
    val source = Seq((1L, 99L, "s1")).toDF("id", "ver", "v")
    val out = Merge(target, source, Seq("id"), Seq(col("ver").desc))
      .orderBy("id").collect().map(_.getString(2)).toSeq
    assert(out == Seq("s1", "t2", "t3"))
  }
}
