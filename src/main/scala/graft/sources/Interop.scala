package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** CROSS-FORMAT MIGRATION between the two open table formats —
  * metadata only, zero data movement. A lakehouse's data files are
  * plain parquet under both formats; only the metadata layer (log vs
  * metadata.json chain) differs, so converting a table is: read one
  * format's live-file list driver-side, register those same files in
  * the other format's first commit ([[Iceberg.registerFiles]] ≡ the
  * `add_files` procedure, [[DeltaLog.registerFiles]] ≡ Delta's
  * CONVERT TO DELTA). Identity partition values and per-file stats
  * carry across — pruning and data skipping work from the first read
  * on the new side.
  *
  * Scope: the CURRENT snapshot migrates (history stays readable in
  * the source format — the formats' version vocabularies don't map
  * one-to-one); an Iceberg MoR state must [[Iceberg.rewriteDataFiles]]
  * first (position deletes have no Delta spelling below deletion
  * vectors, which are protocol-gated out of scope).
  *
  * Scale: O(files) driver metadata plus one footer open per file for
  * the target's stats — a 100 TB table converts in minutes because no
  * byte of data moves; this is exactly why in-place migration exists
  * in both ecosystems. */
object Interop {

  /** Delta table → new Iceberg table over the SAME data files.
    * Returns the Iceberg snapshot id. */
  def deltaToIceberg(spark: SparkSession, deltaDir: String,
                     icebergDir: String): Long = {
    val (schema, partCols, files) =
      DeltaLog.currentFilesForExport(deltaDir)
    Iceberg.registerFiles(icebergDir, schema, partCols, files)
  }

  /** Iceberg table → new Delta table over the SAME data files.
    * Returns the Delta version. */
  def icebergToDelta(spark: SparkSession, icebergDir: String,
                     deltaDir: String): Long = {
    val (schema, partCols, files) =
      Iceberg.currentFilesForExport(icebergDir)
    DeltaLog.registerFiles(deltaDir, schema, partCols, files)
  }

  /** Session-cached MIGRATED tables over the orders testdata. The
    * sources are the q128/q147 lifecycle tables (overwrite history,
    * odd keys live), so a conversion that replayed the source wrong —
    * or dropped/duplicated a file while registering — lands on the
    * wrong half and hash-mismatches. Source tables are resolved
    * BEFORE the cached build (a nested cachedTable inside
    * computeIfAbsent would re-enter the cache map). */
  private[graft] def deltaToIcebergTable(spark: SparkSession,
                                         dir: String): String = {
    val src = DeltaLog.ordersDeltaTable(spark, dir)
    DeltaLog.cachedTable(spark, dir, "d2i") { (_, t) =>
      deltaToIceberg(spark, src, t)
    }
  }

  private[graft] def icebergToDeltaTable(spark: SparkSession,
                                         dir: String): String = {
    val src = Iceberg.ordersIcebergTable(spark, dir)
    DeltaLog.cachedTable(spark, dir, "i2d") { (_, t) =>
      icebergToDelta(spark, src, t)
    }
  }

  /** q163 — DELTA → ICEBERG MIGRATION READBACK: the q128 Delta table
    * (odd keys after an overwrite) read through brand-new Iceberg
    * metadata over the same files. */
  def deltaToIcebergRead(spark: SparkSession, dir: String): DataFrame =
    Iceberg.read(spark, deltaToIcebergTable(spark, dir))
      .orderBy(col("o_orderkey"))

  def deltaToIcebergReadSql: String = DeltaLog.deltaReadSql

  /** q164 — ICEBERG → DELTA MIGRATION READBACK: the q147 Iceberg
    * table read through a brand-new Delta log over the same files —
    * with `add.stats` derived at registration, so the migrated table
    * data-skips from day one (spec-held). */
  def icebergToDeltaRead(spark: SparkSession, dir: String): DataFrame =
    DeltaLog.read(spark, icebergToDeltaTable(spark, dir))
      .orderBy(col("o_orderkey"))

  def icebergToDeltaReadSql: String = DeltaLog.deltaReadSql
}
