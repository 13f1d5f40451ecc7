package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** A multimodal asset row: media payload as an opaque binary column +
  * typed metadata. Derived deterministically from `documents` (the
  * container ships no media decoders — SURVEY §7.5 multimodal note):
  * payload = a BMP/WAV-style fixed header (magic, format initial,
  * zero-padded width/height — [[Multimodal.HeaderLen]] bytes) followed
  * by the UTF-8 text bytes as the body; format/width/height =
  * arithmetic on (source, n_chars). The MEDIA content is fake; the
  * COLUMN SHAPES, the header parse, and the processing plumbing are
  * the real thing under test. */
case class Asset(doc_id: Long, format: String, payload: Array[Byte],
                 width: Int, height: Int)

/** Features decoded FROM THE PAYLOAD BYTES (header parse + body
  * arithmetic — see [[Multimodal.decodeFeatures]]). */
case class AssetFeatures(doc_id: Long, format: String, n_bytes: Long,
                         width: Int, height: Int, n_frames: Int)

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

  /** Byte length of the payload header:
    * `GRFT` (4) + format initial (1) + width (4) + height (4) + `|`. */
  val HeaderLen = 14

  /** The assets table: documents re-shaped into binary payload +
    * metadata columns (schema = [[Asset]]). The payload leads with a
    * deterministic [[HeaderLen]]-byte header, so the decode stage has
    * real bytes to parse and the q42 oracle can re-derive every
    * feature in SQL. */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    val width = (lit(16) + col("n_chars") % 240).cast("int")
    val height = (lit(16) + (col("n_chars") * 7) % 240).cast("int")
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        formatExpr.as("format"),
        concat(lit("GRFT"), substring(formatExpr, 1, 1),
          lpad(width.cast("string"), 4, "0"),
          lpad(height.cast("string"), 4, "0"),
          lit("|"), col("text")).cast("binary").as("payload"),
        width.as("width"),
        height.as("height"))
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
    s"""SELECT doc_id,
       |  ['image','audio','video'][CAST(substr(source, 4) AS INT) % 3 + 1]
       |    AS format,
       |  CAST(octet_length(encode(text)) + $HeaderLen AS BIGINT) AS n_bytes,
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
       |    CAST(octet_length(encode(text)) + $HeaderLen AS BIGINT) AS n_bytes
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

  /** Header-parse decode: reads the [[HeaderLen]]-byte header out of
    * the raw payload bytes (magic check, fixed-offset width/height
    * fields — the BMP/WAV pattern) and derives frame count from the
    * byte length. A real deployment swaps the body handling for an
    * image/audio codec (absent in this container); the header parse,
    * typed batch iteration, partition amortization, and output schema
    * are the real pattern — and every feature is re-derivable in SQL,
    * so q42 carries a full DuckDB oracle. */
  private def decodeAsset(a: Asset): AssetFeatures = {
    val hdr = new String(a.payload, 0, HeaderLen, "UTF-8")
    require(hdr.startsWith("GRFT") && hdr.charAt(HeaderLen - 1) == '|',
      s"asset ${a.doc_id}: bad payload header '$hdr'")
    val width = hdr.substring(5, 9).toInt
    val height = hdr.substring(9, 13).toInt
    val n = a.payload.length.toLong
    val frames = ((n + FrameStride - 1) / FrameStride).toInt
    AssetFeatures(a.doc_id, a.format, n, width, height, frames)
  }

  /** Per-partition batch decode over the typed Dataset. */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // per-partition decoder setup would go here (codec init, model
      // load) — amortized across the whole batch, as with mapInPandas
      batch.map(decodeAsset)
    }
  }

  /** q42: features for every asset, decoded from the payload bytes.
    * Fully oracle-gated: the DuckDB side re-derives the header fields
    * from the same (source, n_chars) arithmetic the header was built
    * from, so a decode that mis-parses any offset hash-mismatches. */
  def assetFeatures(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(assets(spark, dir)).toDF().orderBy(col("doc_id"))

  val assetFeaturesSql: String =
    s"""SELECT doc_id,
       |  ['image','audio','video'][CAST(substr(source, 4) AS INT) % 3 + 1]
       |    AS format,
       |  CAST(octet_length(encode(text)) + $HeaderLen AS BIGINT) AS n_bytes,
       |  CAST(16 + n_chars % 240 AS INT) AS width,
       |  CAST(16 + (n_chars * 7) % 240 AS INT) AS height,
       |  CAST((octet_length(encode(text)) + $HeaderLen + $FrameStride - 1)
       |    // $FrameStride AS INT) AS n_frames
       |FROM documents ORDER BY doc_id""".stripMargin

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
