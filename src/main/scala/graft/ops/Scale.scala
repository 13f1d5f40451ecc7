package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-out join utilities — the 100 TB toolbox the parity queries
  * lean on when one key dominates (SURVEY §7.1 scale notes).
  *
  * Spark-first posture: AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) is the FIRST
  * answer to skew — it needs no code and re-plans from runtime stats.
  * Manual salting remains necessary when the skew is in an
  * *aggregation* key or when a single key exceeds what AQE's split
  * granularity can balance; this module provides that path with
  * result-identical semantics (ScaleSpec proves equality to the plain
  * operators).
  */
object Scale {

  /** Salted equi-join of a skewed big side against a small-enough-to-
    * replicate side: the big side scatters each hot key across
    * `salts` shuffle partitions via a per-row salt; the other side is
    * exploded ×salts so every (key, salt) bucket finds its match.
    * Output rows are exactly those of `big.join(small, keys, "inner")`.
    *
    * Cost model: shuffle volume is unchanged on the big side, ×salts
    * on the replicated side — use for genuinely small right sides
    * that AQE would not broadcast (e.g. mid-size dims under heavy key
    * skew), or swap to `broadcast(small)` when it fits in memory.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Salted two-phase aggregation for a skewed group key: partial
    * aggregate on (key, salt), then final on key. Works for any
    * algebraic aggregate expressed as (partial, merge) column pairs.
    * For plain sum/count Catalyst's partial aggregation already does
    * exactly this per-partition; the explicit salt matters when the
    * partial results themselves are too hot for one reducer (extreme
    * single-key skew at 100 TB).
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    salted.groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("sum_value"),
        sum(col("_pcnt")).as("n_rows"))
  }

  /** Top-level key-frequency probe: the cheap scan that decides
    * whether a key needs the salted path (run it on a sample at
    * 100 TB). */
  def keyHistogram(df: DataFrame, key: String, topN: Int): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
