package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Semi-structured (VARIANT) surface — the modern Spark-4 path for the
  * JSON `props` envelope that q12 parses with `from_json` + MapType
  * (reference: spark/streaming_bronze.py payload handling). VARIANT
  * keeps the parsed binary form in the column, so repeated path
  * extraction skips re-tokenizing the JSON text — the 100 TB answer to
  * "schema-on-read without a schema": parse once at ingest, extract
  * typed paths wherever the query needs them, no per-query regex/JSON
  * scan.
  */
object SemiStructured {

  // ---------------------------------------------------------------- q69

  /** q69 — parse `props` to VARIANT, extract the typed `$.k` path,
    * and profile it per event type: count, missing-path count (via
    * `try_variant_get` on a path the corpus never has), sum / min /
    * max and a single-division mean. Shuffle: one map-side-combined
    * aggregate on event_type; the VARIANT parse + extraction happen
    * in the projection before the exchange, so only (type, k) longs
    * shuffle — never the JSON text. */
  def variantExtract(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val v = parse_json(col("props"))
    val k = variant_get(v, "$.k", "bigint")
    val missing = try_variant_get(v, "$.absent_path", "bigint")
    e.select(col("event_type"), k.as("k"), missing.as("m"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count(col("m")).as("n_absent_hits"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .select(col("event_type"), col("n"), col("n_absent_hits"),
        col("sum_k"), col("min_k"), col("max_k"),
        (col("sum_k").cast("double") / col("n").cast("double")).as("avg_k"))
      .orderBy(col("event_type"))
  }

  val variantExtractSql: String =
    """SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(0 AS BIGINT) AS n_absent_hits,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |    AS BIGINT) AS sum_k,
      |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |    AS BIGINT) AS min_k,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |    AS BIGINT) AS max_k,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS avg_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
}
