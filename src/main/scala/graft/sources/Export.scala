package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data export: JSON-lines shards, the handoff format most
  * training jobs consume (one JSON object per line, N roughly
  * equal-sized files). The write-side counterpart of the JSON-lines
  * SOURCE covered in SourcesSpec.
  *
  * Sizing is the standard two-pass move: one scan measures the exact
  * serialized volume (`octet_length(to_json(struct(*)))` + the
  * newline), then the write repartitions to ⌈bytes / target⌉ shards —
  * the same size-targeted layout the ScaleSpec file compactor
  * produces for parquet, because a JSONL dataset of 10⁶ tiny files
  * (or 3 multi-TB ones) punishes every downstream loader. Row
  * placement hash-scatters across shards (round-robin repartition),
  * so shard sizes concentrate tightly around the target.
  */
object Export {

  /** Write `df` as JSONL shards of ≈`targetBytes`; returns the shard
    * count. */
  def writeJsonlShards(df: DataFrame, path: String,
                       targetBytes: Long = 64L * 1024 * 1024): Int = {
    val row = to_json(struct(df.columns.toIndexedSeq.map(col): _*))
    val bytes = df.select(
        coalesce(sum(octet_length(row) + lit(1L)), lit(0L)).as("b"))
      .head().getLong(0)
    val shards = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    df.repartition(shards).write.mode("overwrite").json(path)
    shards
  }
}
