package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit, pmod}
import org.apache.spark.sql.streaming.Trigger

/** `readStream.format("graft-iceberg-cdf")` — append snapshots as
  * inserts, v2 position-delete snapshots as exactly their
  * newly-deleted rows, refusals for the value-level shapes. */
class IcebergCdfStreamSourceSpec extends SparkSuite {
  import spark.implicits._

  private def drainTo(dir: String, out: String, ckpt: String): Unit = {
    val q = spark.readStream.format("graft-iceberg-cdf")
      .option("path", dir).load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("appends + stacked position deletes stream as row-level changes") {
    val work = Files.createTempDirectory("icdf").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      (1L to 10L).map(i => (i, s"s$i")).toDF("k", "s"), dir) // snap 1
    sources.Iceberg.deleteWhere(spark, dir,
      pmod(col("k"), lit(2L)) === 0) // snap 2: evens die
    sources.Iceberg.commitAppend(
      (11L to 12L).map(i => (i, s"s$i")).toDF("k", "s"), dir) // snap 3
    // snap 4: k<=4 — but 2 and 4 are ALREADY dead; only 1,3 are new
    sources.Iceberg.deleteWhere(spark, dir, col("k") <= 4L)
    drainTo(dir, s"$work/out", s"$work/ckpt")
    val got = spark.read.parquet(s"$work/out")
      .select("k", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    val want =
      (1L to 10L).map(k => (k, "insert", 1L)) ++
        Seq(2L, 4L, 6L, 8L, 10L).map(k => (k, "delete", 2L)) ++
        (11L to 12L).map(k => (k, "insert", 3L)) ++
        Seq(1L, 3L).map(k => (k, "delete", 4L))
    assert(got == want,
      "each delete snapshot emits EXACTLY its newly-deleted rows")
    // incremental: a later delete flows alone from the checkpoint
    sources.Iceberg.deleteWhere(spark, dir, col("k") === 11L)
    drainTo(dir, s"$work/out", s"$work/ckpt")
    val after = spark.read.parquet(s"$work/out")
      .select("k", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    assert(after == want :+ ((11L, "delete", 5L)),
      "exactly the new snapshot's delete — nothing redelivered")
  }

  test("equality deletes and overwrites refuse with batch-path pointers") {
    val work = Files.createTempDirectory("icdf2").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      Seq((1L, "P"), (2L, "O")).toDF("k", "st"), dir)
    sources.Iceberg.deleteWhereEquality(spark, dir, Seq("P").toDF("st"))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val e1 = intercept[Exception] {
      drainTo(dir, s"$work/out", s"$work/ckpt")
    }
    assert(messages(e1).exists(m => m.contains("EQUALITY delete") &&
      m.contains("readIncremental")), s"got ${messages(e1)}")
    val dir2 = s"$work/t2"
    sources.Iceberg.commitAppend(Seq((1L, "a")).toDF("k", "s"), dir2)
    sources.Iceberg.commitOverwrite(Seq((9L, "z")).toDF("k", "s"), dir2)
    val e2 = intercept[Exception] {
      drainTo(dir2, s"$work/out2", s"$work/ckpt2")
    }
    assert(messages(e2).exists(m => m.contains("overwrite") &&
      m.contains("table-diff")), s"got ${messages(e2)}")
  }

  test("q200 gate shape: streamed CDF equals the MoR lifecycle's two arms") {
    val streamed = streaming.IcebergCdfStreamQueries
      .icebergCdfStream(spark, sfDir)
      .select("o_orderkey", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    val orders = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val want = (orders.map(k => (k, "insert", 1L)) ++
      orders.filter(_ % 10 == 0).map(k => (k, "delete", 2L)))
      .sortBy(t => (t._1, t._3))
    assert(streamed.sortBy(t => (t._1, t._3)) == want)
  }
}
