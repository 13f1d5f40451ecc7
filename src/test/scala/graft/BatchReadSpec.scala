package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.{col, lit}

import graft.streaming.BatchScanStats

/** `spark.read.format("graft-delta")` — the DSv2 BATCH half of the
  * connector (BatchRead.scala). These specs pin the Catalyst
  * integration the DataFrame APIs can't express: filter pushdown
  * pruning files inside the optimizer, column pruning reaching the
  * scan, reported statistics driving auto-broadcast, runtime filters
  * re-pruning planned files, and parity with [[sources.DeltaLog]]'s
  * own reads across the table lifecycles (DVs, mapping, time
  * travel). */
class BatchReadSpec extends SparkSuite {
  import spark.implicits._

  private def dsv2(dir: String, opts: (String, String)*): DataFrame = {
    var r = spark.read.format("graft-delta").option("path", dir)
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def scanOf(df: DataFrame): BatchScanExec = {
    df.collect() // finalize AQE
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    } ++ df.queryExecution.executedPlan.subqueries.flatMap(_.collect {
      case b: BatchScanExec => b
    })
    scans.headOption.getOrElse(fail("no BatchScanExec in plan"))
  }

  test("batch read matches DeltaLog.read across append/compact history") {
    val work = Files.createTempDirectory("dsv2b").toString
    val dir = s"$work/t"
    sources.DeltaLog.commitAppend(
      (1L to 50L).map(i => (i, s"s$i", i * 10L)).toDF("k", "s", "v"), dir)
    sources.DeltaLog.commitAppend(
      (51L to 90L).map(i => (i, s"s$i", i * 10L)).toDF("k", "s", "v"), dir)
    sources.DeltaLog.compact(spark, dir, targetFiles = 1)
    assert(sortedRows(dsv2(dir)) ==
      sortedRows(sources.DeltaLog.read(spark, dir)))
  }

  test("filter pushdown prunes partitions AND stats ranges; superset re-applied") {
    val work = Files.createTempDirectory("dsv2p").toString
    val dir = s"$work/t"
    // 3 hive partitions × stats-bounded k ranges (one file per
    // partition per append → 6 files)
    val rows = (1L to 300L).map(i => (i, s"p${i % 3}"))
    sources.DeltaLog.commitOverwritePartitioned(
      rows.filter(_._1 <= 150).toDF("k", "p").repartition(col("p")),
      dir, Seq("p"))
    sources.DeltaLog.commitAppendPartitioned(
      rows.filter(_._1 > 150).toDF("k", "p").repartition(col("p")),
      dir, Seq("p"))
    BatchScanStats.reset(dir)
    val df = dsv2(dir).filter(col("p") === "p1" && col("k") <= 150L)
    val expect = rows.filter(r => r._2 == "p1" && r._1 <= 150)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq == expect)
    val s = BatchScanStats.statsFor(dir)
    assert(s.live == 6, s"6 files live, saw ${s.live}")
    assert(s.pushdownKept == 1,
      s"partition p1 ∩ k<=150 is ONE file, kept ${s.pushdownKept}")
    // the pushed filters surface in the scan's explain description
    assert(scanOf(df).scan.description().contains("pushed="))
  }

  test("column pruning reaches the scan's readSchema") {
    val work = Files.createTempDirectory("dsv2c").toString
    val dir = s"$work/t"
    sources.DeltaLog.commitAppend(
      (1L to 20L).map(i => (i, s"s$i", i * 2L, s"x$i"))
        .toDF("k", "s", "v", "w"), dir)
    val df = dsv2(dir).select("k", "v")
    assert(scanOf(df).scan.readSchema().fieldNames.toSeq ==
      Seq("k", "v"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      .toSeq == (1L to 20L).map(i => (i, i * 2L)))
  }

  test("deletion vectors mask rows through the batch connector") {
    val work = Files.createTempDirectory("dsv2dv").toString
    val dir = s"$work/t"
    sources.DeltaLog.commitAppend(
      (1L to 100L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    sources.DeltaLog.deleteWhere(spark, dir, col("k") % 7 === 0)
    assert(sortedRows(dsv2(dir)) ==
      sortedRows(sources.DeltaLog.read(spark, dir)))
    assert(dsv2(dir).count() == (1L to 100L).count(_ % 7 != 0))
  }

  test("column-mapped tables (name + id + nested) read batch-DSv2") {
    // the session-cached lifecycle fixtures carry renames at every
    // nesting level — parity with the DataFrame reader is the gate
    val mapped = sources.DeltaLog.ordersNestedMappedTable(spark, sfDir)
    assert(sortedRows(dsv2(mapped)) ==
      sortedRows(sources.DeltaLog.read(spark, mapped)))
    val mappedId =
      sources.DeltaLog.ordersNestedMappedIdTable(spark, sfDir)
    assert(sortedRows(dsv2(mappedId)) ==
      sortedRows(sources.DeltaLog.read(spark, mappedId)))
  }

  test("versionAsOf / timestampAsOf pin the snapshot") {
    val work = Files.createTempDirectory("dsv2tt").toString
    val dir = s"$work/t"
    sources.DeltaLog.commitAppend(
      (1L to 10L).map(i => (i, "v0")).toDF("k", "tag"), dir)
    sources.DeltaLog.commitOverwrite(
      (1L to 10L).map(i => (i, "v1")).toDF("k", "tag"), dir)
    assert(dsv2(dir, "versionAsOf" -> "0")
      .select("tag").distinct().as[String].collect().toSeq == Seq("v0"))
    assert(dsv2(dir).select("tag").distinct()
      .as[String].collect().toSeq == Seq("v1"))
    val tsV0 = sources.DeltaLog.commitTimestamps(dir).head._2
    assert(dsv2(dir, "timestampAsOf" -> tsV0.toString)
      .select("tag").distinct().as[String].collect().toSeq == Seq("v0"))
    // scan building is lazy — malformed options refuse at action
    intercept[IllegalArgumentException] {
      dsv2(dir, "versionAsOf" -> "0", "timestampAsOf" -> "1").collect()
    }
    intercept[IllegalArgumentException] {
      dsv2(dir, "versionAsOf" -> "abc").collect()
    }
  }

  test("reported statistics auto-broadcast a small dimension") {
    val work = Files.createTempDirectory("dsv2st").toString
    val dim = s"$work/dim"
    val fact = s"$work/fact"
    sources.DeltaLog.commitAppend(
      (1L to 50L).map(i => (i, s"name$i")).toDF("k", "nm"), dim)
    sources.DeltaLog.commitAppend(
      (1L to 5000L).map(i => (i % 50 + 1, i)).toDF("k", "v"), fact)
    val joined = dsv2(fact).join(dsv2(dim), "k")
    joined.collect()
    val bhj = joined.queryExecution.executedPlan.toString()
    assert(bhj.contains("BroadcastHashJoin"),
      s"small DSv2 side should auto-broadcast from reported stats:\n$bhj")
    // and the numbers themselves: post-pushdown rowCount is exact
    val scan = scanOf(dsv2(dim))
      .scan.asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsReportStatistics]
    assert(scan.estimateStatistics().numRows().getAsLong == 50L)
  }

  test("runtime filtering re-prunes planned files at join time") {
    val work = Files.createTempDirectory("dsv2rf").toString
    val fact = s"$work/fact"
    val dim = s"$work/dim"
    // fact: 10 hive partitions, one file each; dim filter keeps 1
    sources.DeltaLog.commitOverwritePartitioned(
      (1L to 1000L).map(i => (i, s"p${i % 10}")).toDF("k", "p")
        .repartition(col("p")), fact, Seq("p"))
    sources.DeltaLog.commitAppend(
      (0L to 9L).map(i => (s"p$i", s"d$i")).toDF("p", "d"), dim)
    BatchScanStats.reset(fact)
    val joined = dsv2(fact)
      .join(dsv2(dim).filter(col("d") === "d3"), "p")
    val n = joined.count()
    assert(n == 100, s"partition p3 holds 100 rows, got $n")
    val s = BatchScanStats.statsFor(fact)
    assert(s.pushdownKept == 10)
    assert(s.runtimeKept == 1,
      s"runtime filter should keep exactly partition p3's file, " +
        s"kept ${s.runtimeKept} (runtime filtering never ran = -1)")
  }

  test("runtime filter unit: stats bounds prune unpartitioned files") {
    val work = Files.createTempDirectory("dsv2rfu").toString
    val dir = s"$work/t"
    // 4 appends → 4 files with disjoint k ranges in add.stats
    (0L to 3L).foreach(b =>
      sources.DeltaLog.commitAppend(
        (b * 100L + 1 to b * 100L + 100).map(i => (i, i * 2))
          .toDF("k", "v"), dir))
    BatchScanStats.reset(dir)
    val df = dsv2(dir)
    df.collect() // builds the scan; pushdown kept = all 4
    val scan = scanOf(df).scan
      .asInstanceOf[org.apache.spark.sql.connector.read
        .SupportsRuntimeFiltering]
    assert(scan.filterAttributes().map(_.describe()).sorted.toSeq ==
      Seq("k", "v"), "stats-bounded columns are runtime-filterable")
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("k", Array[Any](5L, 350L))))
    val parts = scan.asInstanceOf[org.apache.spark.sql.connector
      .read.Scan].toBatch.planInputPartitions()
    assert(parts.length == 2,
      s"k∈{5,350} hits files 1 and 4 only, planned ${parts.length}")
  }

  test("storage-partitioned join: co-partitioned tables join shuffle-free") {
    val work = Files.createTempDirectory("dsv2spj").toString
    val a = s"$work/a"
    val b = s"$work/b"
    sources.DeltaLog.commitOverwritePartitioned(
      (1L to 600L).map(i => (i, s"p${i % 3}")).toDF("k", "p")
        .repartition(col("p")), a, Seq("p"))
    sources.DeltaLog.commitOverwritePartitioned(
      (1L to 30L).map(i => (s"p${i % 3}", i)).toDF("p", "n")
        .repartition(col("p")), b, Seq("p"))
    val expected = {
      val j = dsv2(a).join(dsv2(b), "p")
      assert(j.count() == 600L * 10)
      sortedRows(j)
    }
    withSpj {
      val j = dsv2(a).join(dsv2(b), "p")
      assert(sortedRows(j) == expected, "SPJ must not change results")
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"co-partitioned DSv2 join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan)
    }
  }

  private def withSpj[A](body: => A): A = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // force the non-broadcast join SPJ applies to
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // ---- graft-iceberg batch ----

  private def iceberg(dir: String, opts: (String, String)*): DataFrame = {
    var r = spark.read.format("graft-iceberg").option("path", dir)
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("iceberg batch read matches Iceberg.read; renames resolve by field id") {
    val work = Files.createTempDirectory("dsv2i").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      (1L to 40L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    sources.Iceberg.renameColumn(dir, "s", "label")
    sources.Iceberg.commitAppend(
      (41L to 80L).map(i => (i, s"s$i")).toDF("k", "label"), dir)
    assert(sortedRows(iceberg(dir)) ==
      sortedRows(sources.Iceberg.read(spark, dir)))
    assert(iceberg(dir).filter(col("label") === "s7").count() == 1,
      "pre-rename files resolve the renamed column by field id")
  }

  test("iceberg position deletes mask through inline bitmap descriptors") {
    val work = Files.createTempDirectory("dsv2ipd").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      (1L to 100L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    sources.Iceberg.deleteWhere(spark, dir, col("k") % 5 === 0)
    assert(sortedRows(iceberg(dir)) ==
      sortedRows(sources.Iceberg.read(spark, dir)))
    assert(iceberg(dir).count() == (1L to 100L).count(_ % 5 != 0))
  }

  test("iceberg equality deletes fold to position masks in the batch scan") {
    val work = Files.createTempDirectory("dsv2ieq").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      (1L to 20L).map(i => (i, s"v$i")).toDF("k", "s"), dir)
    sources.Iceberg.upsert(spark, dir,
      Seq((5L, "V5"), (21L, "V21")).toDF("k", "s"), Seq("k"))
    sources.Iceberg.resetEqMaskStats(dir)
    val df = iceberg(dir)
    assert(sortedRows(df) ==
      sortedRows(sources.Iceberg.read(spark, dir)),
      "connector read must equal the library MoR read")
    assert(df.count() == 21)
    assert(df.filter(col("k") === 5L).collect().map(_.getString(1))
      .toSeq == Seq("V5"), "upserted key surfaces the NEW row only")
    // masks, not joins: the executed plan is a bare scan
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Join"),
      s"eq-deletes must mask positions, not join:\n$plan")
    assert(sources.Iceberg.eqMaskStats(dir).isDefined,
      "the eq-mask derivation seam never ran")
    // STACKED upserts: the second delete retires both generations
    sources.Iceberg.upsert(spark, dir,
      Seq((5L, "V5b"), (7L, "V7b")).toDF("k", "s"), Seq("k"))
    assert(sortedRows(iceberg(dir)) ==
      sortedRows(sources.Iceberg.read(spark, dir)))
    assert(iceberg(dir).filter(col("k") isin (5L, 7L))
      .collect().map(_.getString(1)).sorted.toSeq == Seq("V5b", "V7b"))
    // STACKED eq + pos deletes: a DELETE WHERE on top of the upsert
    // history folds both currencies into one mask union
    sources.Iceberg.deleteWhere(spark, dir, col("k") % 4 === 0)
    assert(sortedRows(iceberg(dir)) ==
      sortedRows(sources.Iceberg.read(spark, dir)))
    assert(iceberg(dir).count() == 21 - 5) // k=4,8,12,16,20 gone
  }

  test("eq-delete sequence scope: rows appended AFTER the delete survive") {
    val work = Files.createTempDirectory("dsv2ieqs").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      (1L to 10L).map(i => (i, s"v$i")).toDF("k", "s"), dir)
    sources.Iceberg.deleteWhereEquality(spark, dir,
      Seq(3L).toDF("k"))
    sources.Iceberg.commitAppend(
      Seq((3L, "reborn")).toDF("k", "s"), dir)
    val rows = iceberg(dir).filter(col("k") === 3L).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("reborn"),
      "the re-appended row outlives the older equality delete")
    assert(sortedRows(iceberg(dir)) ==
      sortedRows(sources.Iceberg.read(spark, dir)))
  }

  test("eq-delete masks under schema evolution; key-bounds prune files") {
    val work = Files.createTempDirectory("dsv2ieqe").toString
    val dir = s"$work/t"
    // two range-disjoint files, then a delete touching only one —
    // the bounds prune must scan 1 of 2 files for the mask job
    sources.Iceberg.commitAppend(
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "s")
        .repartition(1), dir)
    sources.Iceberg.commitAppend(
      (101L to 200L).map(i => (i, s"v$i")).toDF("k", "s")
        .repartition(1), dir)
    sources.Iceberg.deleteWhereEquality(spark, dir,
      Seq(150L, 160L).toDF("k"))
    sources.Iceberg.resetEqMaskStats(dir)
    assert(iceberg(dir).count() == 198)
    assert(sources.Iceberg.eqMaskStats(dir) === Some((2, 1)),
      s"key-bounds prune expected planned 1 of total 2 files, got " +
        s"${sources.Iceberg.eqMaskStats(dir)}")
    // schema evolution AFTER the delete: old files' masks still
    // apply; the new column null-fills on pre-evolution files
    val schema = sources.Iceberg.read(spark, dir).schema
    sources.Iceberg.evolveSchema(dir,
      org.apache.spark.sql.types.StructType(schema.fields :+
        org.apache.spark.sql.types.StructField("w",
          org.apache.spark.sql.types.LongType)))
    sources.Iceberg.commitAppend(
      Seq((201L, "tail", 9L)).toDF("k", "s", "w"), dir)
    val df = iceberg(dir)
    assert(df.count() == 199)
    assert(df.filter(col("k") === 150L).isEmpty,
      "eq-deleted row must stay dead across schema evolution")
    assert(df.filter(col("w").isNotNull).count() == 1)
    assert(sortedRows(df) ==
      sortedRows(sources.Iceberg.read(spark, dir)))
  }

  test("eq-delete keyed on a hive-stripped partition column matches via tuple") {
    // the r16 refusal closed (verdict item 4): the data rows never
    // carry the stripped identity column, but each file's MANIFEST
    // partition tuple does — the mask job synthesizes it as a typed
    // literal per partition-value subgroup and matches row-wise
    val work = Files.createTempDirectory("dsv2ieqp").toString
    val dir = s"$work/t"
    sources.Iceberg.commitOverwritePartitioned(
      (1L to 30L).map(i => (i, s"p${i % 3}")).toDF("k", "p")
        .repartition(col("p")), dir, Seq("p"))
    sources.Iceberg.deleteWhereEquality(spark, dir,
      Seq("p1").toDF("p"))
    val df = iceberg(dir)
    assert(df.count() == 20)
    assert(df.filter(col("p") === "p1").isEmpty,
      "every p1-partition row must be masked")
    assert(sortedRows(df) ==
      sortedRows(sources.Iceberg.read(spark, dir)))
    // a MIXED key (partition + data column) matches row-wise too
    sources.Iceberg.deleteWhereEquality(spark, dir,
      Seq(("p2", 2L), ("p2", 5L)).toDF("p", "k"))
    assert(iceberg(dir).count() == 18)
    assert(sortedRows(iceberg(dir)) ==
      sortedRows(sources.Iceberg.read(spark, dir)))
  }

  test("iceberg pushdown prunes partitions/bounds; snapshotAsOf + branch pin") {
    val work = Files.createTempDirectory("dsv2ip").toString
    val dir = s"$work/t"
    sources.Iceberg.commitOverwritePartitioned(
      (1L to 300L).map(i => (i, s"p${i % 3}")).toDF("k", "p")
        .repartition(col("p")), dir, Seq("p"))
    BatchScanStats.reset(dir)
    val df = iceberg(dir).filter(col("p") === "p2")
    assert(df.count() == 100)
    val s = BatchScanStats.statsFor(dir)
    assert(s.live == 3 && s.pushdownKept == 1,
      s"identity-tuple pruning: ${s.live}/${s.pushdownKept}")
    val snap0 = sources.Iceberg.snapshotIds(dir).head
    sources.Iceberg.commitAppendPartitioned(
      (301L to 310L).map(i => (i, "p0")).toDF("k", "p"), dir,
      Seq("p"))
    assert(iceberg(dir).count() == 310)
    assert(iceberg(dir, "snapshotAsOf" -> snap0.toString).count() == 300)
    sources.Iceberg.setRef(dir, "v300", snap0)
    assert(iceberg(dir, "branch" -> "v300").count() == 300)
  }

  test("iceberg batch default reads MAIN, not a staged branch head") {
    val work = Files.createTempDirectory("dsv2wap").toString
    val dir = s"$work/t"
    sources.Iceberg.commitOverwrite(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir)
    sources.Iceberg.commitAppendToBranch(
      Seq((3L, "c")).toDF("k", "s"), dir, "audit")
    // the staged snapshot is the metadata list's TAIL — a default
    // read that picked the tail would leak the unpublished row
    assert(iceberg(dir).select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    assert(iceberg(dir, "branch" -> "audit").select("k").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("iceberg SPJ: co-partitioned tables join shuffle-free") {
    val work = Files.createTempDirectory("dsv2ispj").toString
    val a = s"$work/a"
    val b = s"$work/b"
    sources.Iceberg.commitOverwritePartitioned(
      (1L to 600L).map(i => (i, s"p${i % 3}")).toDF("k", "p")
        .repartition(col("p")), a, Seq("p"))
    sources.Iceberg.commitOverwritePartitioned(
      (1L to 30L).map(i => (s"p${i % 3}", i)).toDF("p", "n")
        .repartition(col("p")), b, Seq("p"))
    withSpj {
      val j = iceberg(a).join(iceberg(b), "p")
      assert(j.count() == 600L * 10)
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"co-partitioned iceberg join must not shuffle:\n$plan")
    }
  }

  test("delta⋈iceberg SPJ: the formats co-locate ACROSS connectors") {
    // both scans report the same KeyGroupedPartitioning over the
    // identity partition column, so even a cross-format join plans
    // shuffle-free — bucketed co-location at lake scale
    val work = Files.createTempDirectory("dsv2xspj").toString
    val a = s"$work/a"
    val b = s"$work/b"
    sources.DeltaLog.commitOverwritePartitioned(
      (1L to 300L).map(i => (i, s"p${i % 3}")).toDF("k", "p")
        .repartition(col("p")), a, Seq("p"))
    sources.Iceberg.commitOverwritePartitioned(
      (1L to 30L).map(i => (s"p${i % 3}", i)).toDF("p", "n")
        .repartition(col("p")), b, Seq("p"))
    withSpj {
      val j = dsv2(a).join(iceberg(b), "p")
      assert(j.count() == 300L * 10)
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"cross-format co-partitioned join must not shuffle:\n$plan")
    }
  }

  test("streaming through the unified builder still drains exactly-once") {
    val work = Files.createTempDirectory("dsv2sm").toString
    val dir = s"$work/t"
    sources.DeltaLog.commitAppend(
      (1L to 10L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    spark.readStream.format("graft-delta").option("path", dir).load()
      .writeStream.format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    assert(spark.read.parquet(s"$work/out").count() == 10)
  }

  // ---- limit + metadata-only aggregate pushdown ----

  test("limit pushdown truncates the planned file list") {
    val work = Files.createTempDirectory("dsv2l").toString
    val dir = s"$work/t"
    (0L to 4L).foreach(b => sources.DeltaLog.commitAppend(
      (b * 10L + 1 to b * 10L + 10).map(i => (i, s"s$i"))
        .toDF("k", "s").coalesce(1), dir))
    val df = dsv2(dir).limit(5)
    assert(df.count() == 5)
    val parts = scanOf(df).scan.toBatch.planInputPartitions()
    assert(parts.length == 1,
      s"LIMIT 5 over 5×10-row files needs ONE file, planned " +
        s"${parts.length}")
    // whole-table read through the same table is untruncated
    assert(dsv2(dir).count() == 50)
  }

  test("count(*) answers from metadata — no data file read") {
    val work = Files.createTempDirectory("dsv2agg").toString
    val dir = s"$work/t"
    sources.DeltaLog.commitAppend(
      (1L to 70L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    sources.DeltaLog.commitAppend(
      (71L to 100L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    val df = dsv2(dir).groupBy().count()
    assert(df.collect().head.getLong(0) == 100L)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("LocalTableScan") &&
      !plan.contains("BatchScan"),
      s"metadata count must not scan data:\n$plan")
    // deletion vectors subtract exactly
    sources.DeltaLog.deleteWhere(spark, dir, col("k") % 4 === 0)
    val df2 = dsv2(dir).groupBy().count()
    assert(df2.collect().head.getLong(0) ==
      (1L to 100L).count(_ % 4 != 0))
    assert(df2.queryExecution.executedPlan.toString()
      .contains("LocalTableScan"))
  }

  test("min/max answer from stats; DVs force a real scan (exactness)") {
    val work = Files.createTempDirectory("dsv2mm").toString
    val dir = s"$work/t"
    sources.DeltaLog.commitAppend(
      (5L to 500L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    import org.apache.spark.sql.functions.{max, min}
    val df = dsv2(dir).agg(min("k").as("mn"), max("k").as("mx"))
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1)) == (5L, 500L))
    assert(df.queryExecution.executedPlan.toString()
      .contains("LocalTableScan"))
    // a DV may have deleted the extreme row: min/max must DECLINE
    // the metadata answer and scan (count may still push)
    sources.DeltaLog.deleteWhere(spark, dir, col("k") === 500L)
    val df2 = dsv2(dir).agg(min("k"), max("k"))
    val r2 = df2.collect().head
    assert((r2.getLong(0), r2.getLong(1)) == (5L, 499L))
    assert(!df2.queryExecution.executedPlan.toString()
      .contains("LocalTableScan"),
      "stale stats must not answer min/max under deletion vectors")
  }

  test("group-by partition column count answers from the log") {
    val work = Files.createTempDirectory("dsv2gagg").toString
    val dir = s"$work/t"
    sources.DeltaLog.commitOverwritePartitioned(
      (1L to 300L).map(i => (i, s"p${i % 3}")).toDF("k", "p")
        .repartition(col("p")), dir, Seq("p"))
    val df = dsv2(dir).groupBy("p").count().orderBy("p")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq == Seq(("p0", 100L), ("p1", 100L), ("p2", 100L)))
    assert(df.queryExecution.executedPlan.toString()
      .contains("LocalTableScan"))
    // a non-partition group key cannot answer from metadata
    val df2 = dsv2(dir).groupBy("k").count()
    assert(df2.count() == 300)
    assert(!df2.queryExecution.executedPlan.toString()
      .contains("LocalTableScan"))
  }

  test("iceberg count(*) subtracts position deletes AND eq-delete masks") {
    val work = Files.createTempDirectory("dsv2iagg").toString
    val dir = s"$work/t"
    sources.Iceberg.commitAppend(
      (1L to 100L).map(i => (i, s"s$i")).toDF("k", "s"), dir)
    sources.Iceberg.deleteWhere(spark, dir, col("k") % 10 === 0)
    val df = iceberg(dir).groupBy().count()
    assert(df.collect().head.getLong(0) == 90L)
    assert(df.queryExecution.executedPlan.toString()
      .contains("LocalTableScan"))
    // equality deletes: the manifests still count retired rows, but
    // the mask fold restores exactness — count(*) answers
    // metadata-side (records − mask cardinality), data files read
    // only by the bounded mask job, never by the aggregate itself
    val dir2 = s"$work/t2"
    sources.Iceberg.commitAppend(
      (1L to 20L).map(i => (i, s"v$i")).toDF("k", "s"), dir2)
    sources.Iceberg.upsert(spark, dir2,
      Seq((5L, "V5")).toDF("k", "s"), Seq("k"))
    val df2 = iceberg(dir2).groupBy().count()
    assert(df2.collect().head.getLong(0) == 20L,
      "records(21) − eq-masked(1): the retired generation subtracts")
    assert(df2.queryExecution.executedPlan.toString()
      .contains("LocalTableScan"))
  }

  test("_pos metadata column: physical file positions, mask-stable") {
    val work = Files.createTempDirectory("dsv2pos").toString
    val dir = s"$work/t"
    sources.DeltaLog.commitAppend(
      (0L until 40L).map(i => (i, s"s$i")).toDF("k", "s")
        .repartition(1), dir)
    sources.DeltaLog.commitAppend(
      (40L until 70L).map(i => (i, s"s$i")).toDF("k", "s")
        .repartition(1), dir)
    def posSets(opts: (String, String)*): Map[String, Seq[Long]] =
      dsv2(dir, opts: _*)
        .select(col("_file"), col("_pos"), col("k"))
        .collect().groupBy(_.getString(0))
        .map { case (f, rs) =>
          f -> rs.map(_.getLong(1)).sorted.toSeq }
    val byFile = posSets()
    assert(byFile.size == 2)
    assert(byFile.values.map(_.size).toSeq.sorted == Seq(30, 40))
    byFile.values.foreach(ps =>
      assert(ps == (0L until ps.size.toLong), s"dense 0..n-1, got $ps"))
    // the ROW reader path agrees with the vectorized one
    assert(posSets("vectorizedRead" -> "false") == byFile)
    // positions are PHYSICAL: a DV mask removes rows without
    // renumbering the survivors (the row-identity contract)
    sources.DeltaLog.deleteWhere(spark, dir, col("k") % 3 === 0)
    val masked = posSets()
    masked.foreach { case (f, ps) =>
      assert(ps.size < byFile(f).size && ps.forall(byFile(f).contains),
        "survivor positions must be a stable subset")
    }
    assert(posSets("vectorizedRead" -> "false") == masked)
    // (_file,_pos) pairs are unique — a usable row id
    val ids = dsv2(dir).select(col("_file"), col("_pos")).collect()
    assert(ids.length == ids.distinct.length)
  }

  test("required column absent from the pinned snapshot refuses loudly") {
    val work = Files.createTempDirectory("dsv2m").toString
    val dir = s"$work/t"
    sources.DeltaLog.commitAppend(
      (1L to 5L).map(i => (i, i)).toDF("k", "v"), dir)
    sources.DeltaLog.evolveSchema(dir,
      org.apache.spark.sql.types.StructType(
        dsv2(dir).schema.fields :+ org.apache.spark.sql.types
          .StructField("w", org.apache.spark.sql.types.StringType)))
    // column w exists at latest but NOT at version 0: the pinned
    // read must refuse, not null-fill a name that never existed
    val e = intercept[Exception] {
      dsv2(dir, "versionAsOf" -> "0").select("k", "w").collect()
    }
    assert(e.getMessage != null)
  }
}
