package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.streaming.BatchScanStats

/** `df.write.format("graft-delta")` — the DSv2 write half of the
  * connector (DeltaWrite.scala). Executors write UUID-named parquet
  * straight into the table dir (invisible until the log commit);
  * the driver commits through DeltaLog.commitDsv2 with the same
  * validation + CAS loop as the library writers. */
class DeltaWriteSpec extends SparkSuite {
  import spark.implicits._

  private def w(df: DataFrame, dir: String, mode: String,
                partitionBy: Seq[String] = Seq.empty): Unit = {
    var wr = df.write.format("graft-delta").mode(mode)
    if (partitionBy.nonEmpty) wr = wr.partitionBy(partitionBy: _*)
    wr.save(dir)
  }

  test("append creates the table; stats ride the adds; overwrite replaces") {
    val work = Files.createTempDirectory("dwrite").toString
    val dir = s"$work/t"
    w((1L to 50L).map(i => (i, s"s$i")).toDF("k", "s"), dir, "append")
    assert(sources.DeltaLog.read(spark, dir).count() == 50)
    w((51L to 80L).map(i => (i, s"s$i")).toDF("k", "s"), dir, "append")
    val back = sources.DeltaLog.read(spark, dir)
      .as[(Long, String)].collect().sorted.toSeq
    assert(back == (1L to 80L).map(i => (i, s"s$i")))
    assert(sources.DeltaLog.versions(dir) == Seq(0L, 1L))
    // writer-tracked stats must prune exactly like library stats
    BatchScanStats.reset(dir)
    spark.read.format("graft-delta").option("path", dir).load()
      .filter(col("k") <= 10L).collect()
    val s = BatchScanStats.statsFor(dir)
    assert(s.pushdownKept < s.live,
      s"writer stats should prune (live ${s.live}, kept ${s.pushdownKept})")
    // metadata count answers from the writer's numRecords
    val cnt = spark.read.format("graft-delta").option("path", dir)
      .load().groupBy().count()
    assert(cnt.collect().head.getLong(0) == 80L)
    assert(cnt.queryExecution.executedPlan.toString()
      .contains("LocalTableScan"))
    w((1L to 7L).map(i => (i, "ow")).toDF("k", "s"), dir, "overwrite")
    assert(sources.DeltaLog.read(spark, dir).count() == 7)
    assert(sources.DeltaLog.versions(dir) == Seq(0L, 1L, 2L),
      "overwrite is a COMMIT, not a wipe — history is intact")
    assert(sources.DeltaLog.readVersion(spark, dir, 1L).count() == 80)
  }

  test("partitioned write: hive-free files + log partitionValues") {
    val work = Files.createTempDirectory("dwritep").toString
    val dir = s"$work/t"
    val rows = (1L to 300L).map(i => (i, s"p${i % 3}"))
    w(rows.toDF("k", "p"), dir, "append", Seq("p"))
    // library reader reconstructs partition columns from the log
    assert(sources.DeltaLog.read(spark, dir)
      .as[(Long, String)].collect().sorted.toSeq == rows)
    // partition pruning works over the writer's recorded values
    val pruned = sources.DeltaLog.readWhere(spark, dir)(
      pv => pv.get("p").contains("p1"))
    assert(pruned.count() == 100)
    // append WITHOUT partitionBy inherits the table's spec (Delta's
    // own semantics) — the new files still carry partitionValues
    w(Seq((301L, "p1")).toDF("k", "p"), dir, "append")
    assert(sources.DeltaLog.readWhere(spark, dir)(
      pv => pv.get("p").contains("p1")).count() == 101)
    // a CONFLICTING partitionBy refuses
    val e = intercept[Exception] {
      w(Seq((302L, "x")).toDF("k", "p"), dir, "append", Seq("k"))
    }
    assert(e.getMessage.toLowerCase.contains("partition"))
    // data files do NOT contain the partition column
    val dataFiles = sources.DeltaLog.replay(dir,
      sources.DeltaLog.versions(dir).last).files
    val footer = spark.read.parquet(s"$dir/${dataFiles.head}")
    assert(footer.columns.toSeq == Seq("k"),
      s"partition column leaked into the data file: ${footer.columns.toSeq}")
  }

  test("schema-shape drift refuses; evolveSchema is the explicit path") {
    val work = Files.createTempDirectory("dwrites").toString
    val dir = s"$work/t"
    w((1L to 5L).map(i => (i, s"s$i")).toDF("k", "s"), dir, "append")
    val e = intercept[Exception] {
      w((1L to 5L).map(i => (i, i * 2L)).toDF("k", "v"), dir, "append")
    }
    assert(e.getMessage.contains("schema"), e.getMessage)
    assert(sources.DeltaLog.read(spark, dir).count() == 5)
  }

  test("CHECK constraints enforce on the DSv2 write path") {
    val work = Files.createTempDirectory("dwritec").toString
    val dir = s"$work/t"
    w((1L to 5L).map(i => (i, i * 10L)).toDF("k", "score"), dir,
      "append")
    sources.DeltaLog.addCheckConstraint(spark, dir, "score_pos",
      "score > 0")
    val e = intercept[Exception] {
      w(Seq((6L, -1L)).toDF("k", "score"), dir, "append")
    }
    assert(e.getMessage.contains("score_pos"), e.getMessage)
    assert(sources.DeltaLog.read(spark, dir).count() == 5,
      "the violating write must leave nothing behind")
    w(Seq((6L, 60L)).toDF("k", "score"), dir, "append")
    assert(sources.DeltaLog.read(spark, dir).count() == 6)
  }

  test("mapped tables write physical names through the connector") {
    val work = Files.createTempDirectory("dwritem").toString
    val dir = s"$work/t"
    sources.DeltaLog.commitOverwriteMapped(
      (1L to 20L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    sources.DeltaLog.renameColumnMapped(dir, "s", "label")
    w((21L to 30L).map(i => (i, s"s$i")).toDF("k", "label"), dir,
      "append")
    val back = sources.DeltaLog.read(spark, dir)
      .as[(Long, String)].collect().sorted.toSeq
    assert(back == (1L to 30L).map(i => (i, s"s$i")),
      "post-rename DSv2 append must land physically-named columns")
    // and the DSv2 batch read agrees
    assert(spark.read.format("graft-delta").option("path", dir)
      .load().count() == 30)
  }

  test("timestamp/date columns round-trip through the task writer") {
    val work = Files.createTempDirectory("dwritet").toString
    val dir = s"$work/t"
    val df = spark.sql(
      """SELECT id AS k, timestamp'2024-03-01 10:30:00' + make_interval(0,0,0,0,0,0,id) AS ts,
        |  date'2024-01-01' + CAST(id AS int) AS d
        |FROM range(10)""".stripMargin)
    w(df, dir, "append")
    val back = sources.DeltaLog.read(spark, dir)
    assert(back.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(back.count() == 10)
    assert(sources.DeltaLog.read(spark, dir).collect().map(_.toString)
      .sorted.toSeq == df.collect().map(_.toString).sorted.toSeq)
    // date-partitioned write round-trips the spelling
    val dir2 = s"$work/t2"
    w(df.select(col("k"), col("d")), dir2, "append", Seq("d"))
    assert(sources.DeltaLog.read(spark, dir2).count() == 10)
    assert(sources.DeltaLog.readWhere(spark, dir2)(
      pv => pv.get("d").contains("2024-01-05")).count() == 1)
  }

  test("DSv2 write races a library writer through the same CAS") {
    val work = Files.createTempDirectory("dwriter").toString
    val dir = s"$work/t"
    w((1L to 10L).map(i => (i, s"a$i")).toDF("k", "s"), dir, "append")
    // plant a racing library commit inside the claim window
    val planted = new java.util.concurrent.atomic.AtomicBoolean(false)
    sources.DeltaLog.commitClaimHook = (t, _) =>
      if (t == dir && planted.compareAndSet(false, true))
        sources.DeltaLog.commitAppend(
          (100L to 104L).map(i => (i, s"b$i")).toDF("k", "s"), t): Unit
    try w((11L to 20L).map(i => (i, s"a$i")).toDF("k", "s"), dir,
      "append")
    finally sources.DeltaLog.commitClaimHook = (_, _) => ()
    assert(sources.DeltaLog.read(spark, dir).count() == 25,
      "both the planted library append and the DSv2 append must land")
  }
}
