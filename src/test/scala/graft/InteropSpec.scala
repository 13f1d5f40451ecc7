package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

/** Cross-format migration: metadata-only conversion must preserve
  * rows, partition pruning, and data skipping — with zero data files
  * copied or moved. */
class InteropSpec extends SparkSuite {
  import spark.implicits._

  test("delta -> iceberg: partitioned table migrates with pruning intact") {
    val dDir = Files.createTempDirectory("iop1").toString + "/d"
    val iDir = Files.createTempDirectory("iop1").toString + "/i"
    val df = Seq((1L, "red"), (2L, "red"), (3L, "blue")).toDF("k", "s")
    sources.DeltaLog.commitOverwritePartitioned(df, dDir, Seq("s"))
    sources.Interop.deltaToIceberg(spark, dDir, iDir)
    // rows + reconstructed partition column
    assert(sources.Iceberg.read(spark, iDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "red"), (2L, "red"), (3L, "blue")))
    // identity tuples carried: pruning works on the NEW side
    val red = sources.Iceberg.readWhere(spark, iDir)(
      pv => pv.get("s").contains("red"))
    assert(red.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // zero data files under the new table location (metadata only)
    assert(!new java.io.File(iDir, "data").exists)
    // fresh-target guard
    intercept[IllegalArgumentException] {
      sources.Interop.deltaToIceberg(spark, dDir, iDir)
    }
  }

  test("iceberg -> delta: stats derive at registration, skipping works") {
    val iDir = Files.createTempDirectory("iop2").toString + "/i"
    val dDir = Files.createTempDirectory("iop2").toString + "/d"
    sources.Iceberg.commitOverwrite(
      (1L to 80L).map(i => (i, s"s$i")).toDF("k", "s")
        .repartitionByRange(8, col("k")), iDir)
    sources.Interop.icebergToDelta(spark, iDir, dDir)
    assert(sources.DeltaLog.read(spark, dDir).count() == 80)
    sources.DeltaLog.readWhereStats(spark, dDir, Seq(("k", 1L, 10L)))
      .count()
    assert(sources.DeltaLog.lastFilesScanned < 8,
      "migrated table must data-skip through its fresh add.stats")
    // a MoR source refuses until compacted
    sources.Iceberg.deleteWhere(spark, iDir, col("k") === 1L)
    val e = intercept[IllegalArgumentException] {
      sources.Interop.icebergToDelta(spark, iDir,
        Files.createTempDirectory("iop2").toString + "/d2")
    }
    assert(e.getMessage.contains("rewriteDataFiles"))
  }

  test("q163/q164 gate shape: both directions land on the odd half") {
    val orders = Tables.load(spark, sfDir, "orders")
    val odd = orders.filter(col("o_orderkey") % 2 === 1).count()
    assert(sources.Interop.deltaToIcebergRead(spark, sfDir).count() == odd)
    assert(sources.Interop.icebergToDeltaRead(spark, sfDir).count() == odd)
  }
}
