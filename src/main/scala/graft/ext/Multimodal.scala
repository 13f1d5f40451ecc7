package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** A multimodal asset row: media payload as an opaque binary column +
  * typed metadata. Derived deterministically from `documents` (the
  * container ships no media decoders — SURVEY §7.5 multimodal note):
  * payload = UTF-8 bytes of the text, format/width/height = arithmetic
  * on (source, n_chars). The derivation is fake; the COLUMN SHAPES and
  * the processing plumbing are the real thing under test. */
case class Asset(doc_id: Long, format: String, payload: Array[Byte],
                 width: Int, height: Int)

/** Decoded features per asset (see [[Multimodal.decodeFeatures]]). */
case class AssetFeatures(doc_id: Long, format: String, n_bytes: Long,
                         mean_byte: Double, n_frames: Int)

/** Multimodal-column plumbing for a training-data pipeline: binary
  * payload columns with typed metadata, batch-shaped per-partition
  * decode, and frame sampling.
  *
  * Scale design: the payload column is opaque binary — Parquet stores
  * it as a normal column chunk, so metadata-only queries (the q41
  * manifest) never read payload bytes (column pruning; verified in
  * MultimodalSpec via ReadSchema). The decode path runs as
  * `mapPartitions` over a typed Dataset — one JVM-side batch per
  * partition, the Scala analog of `mapInPandas` batch processing —
  * so decoder state (codec tables, model weights) is amortized per
  * partition, not per row, and parallelism = input partitions.
  */
object Multimodal {

  /** Deterministic media type from the numeric source suffix. */
  private val formatExpr =
    expr("element_at(array('image','audio','video'), " +
      "CAST(substring(source, 4, 10) AS INT) % 3 + 1)")

  /** The assets table: documents re-shaped into binary payload +
    * metadata columns (schema = [[Asset]]). */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        formatExpr.as("format"),
        col("text").cast("binary").as("payload"),
        (lit(16) + col("n_chars") % 240).cast("int").as("width"),
        (lit(16) + (col("n_chars") * 7) % 240).cast("int").as("height"))
      .as[Asset]
  }

  // ---------------------------------------------------------------- q41

  /** Metadata-only manifest — never touches payload bytes, so the
    * parquet scan prunes the (at 100 TB: overwhelmingly dominant)
    * binary column away entirely. */
  def assetManifest(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir)
      .select(col("doc_id"), col("format"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        col("width"), col("height"))
      .orderBy(col("doc_id"))

  val assetManifestSql: String =
    """SELECT doc_id,
      |  ['image','audio','video'][CAST(substr(source, 4) AS INT) % 3 + 1]
      |    AS format,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(16 + n_chars % 240 AS INT) AS width,
      |  CAST(16 + (n_chars * 7) % 240 AS INT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q77

  /** Target bytes per training batch for the packer. */
  val BatchTargetBytes = 64L * 1024

  /** q77 — deterministic training-batch packing: assign each asset of
    * a modality to a byte-budgeted batch so a loader can fetch
    * batch-sized shards. batch_no = floor(bytes-before-this-asset /
    * target) over the (format, doc_id) order — the closed-form
    * running-sum spelling (a batch may overflow by at most one
    * asset, the standard relaxation that keeps packing parallel and
    * rerun-stable instead of sequential first-fit).
    *
    * Scale: ONE window per modality partition — the running sum
    * shuffles on `format`. Real corpora sub-partition the window key
    * (e.g. (modality, shard_date)) so no single partition serializes;
    * the per-row arithmetic is unchanged. */
  def batchPacking(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("format")).orderBy(col("doc_id"))
    assetManifest(spark, dir)
      .withColumn("bytes_before",
        coalesce(sum(col("n_bytes"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("format"), col("doc_id"), col("n_bytes"),
        // integer `div`, not `/`: the double route is exact only while
        // sums stay under 2^53 and the target is a power of two —
        // neither is a property worth depending on at the design scale
        expr(s"bytes_before div ${BatchTargetBytes}L").as("batch_no"))
      .orderBy(col("format"), col("doc_id"))
  }

  val batchPackingSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    ['image','audio','video'][CAST(substr(source, 4) AS INT) % 3 + 1]
       |      AS format,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM documents)
       |SELECT format, doc_id, n_bytes,
       |  CAST(coalesce(sum(n_bytes) OVER (
       |      PARTITION BY format ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    // $BatchTargetBytes AS BIGINT) AS batch_no
       |FROM m ORDER BY format, doc_id""".stripMargin

  // ---------------------------------------------------------------- q42

  /** Bytes-per-frame for the frame sampler stub. */
  val FrameStride = 256

  /** STUB decode: a real deployment would link an image/audio codec
    * here (absent in this container); the fake derives deterministic
    * "features" from the raw bytes so the plumbing stays testable.
    * Everything AROUND the stub — typed batch iteration, partition
    * amortization, output schema — is the real pattern. */
  private def decodeStub(a: Asset): AssetFeatures = {
    val n = a.payload.length.toLong
    val mean =
      if (n == 0) 0.0
      else a.payload.foldLeft(0L)((s, b) => s + (b & 0xff)).toDouble / n
    val frames = ((n + FrameStride - 1) / FrameStride).toInt
    AssetFeatures(a.doc_id, a.format, n, mean, frames)
  }

  /** Per-partition batch decode over the typed Dataset. */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // per-partition decoder setup would go here (codec init, model
      // load) — amortized across the whole batch, as with mapInPandas
      batch.map(decodeStub)
    }
  }

  /** q42: features for every asset. Rows-only in the oracle gate (the
    * decode is imperative); MultimodalSpec pins the stub's arithmetic
    * against independently-computed values. */
  def assetFeatures(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(assets(spark, dir)).toDF().orderBy(col("doc_id"))

  /** Frame sampling: every [[FrameStride]]-th byte slice as one
    * "frame" row — the explode pattern a video pipeline uses to turn
    * one asset row into per-frame rows (1→N Generator, distributed;
    * no driver round-trip). */
  def sampleFrames(assets: Dataset[Asset]): DataFrame =
    assets.toDF()
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, octet_length(payload) div $FrameStride), " +
            s"i -> substring(payload, i * $FrameStride + 1, $FrameStride))")))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_bytes")
      .filter(octet_length(col("frame_bytes")) > 0)
}
