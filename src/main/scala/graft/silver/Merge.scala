package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

import graft.cdc.Cdc

/** General MERGE-upsert API — the reusable form of the reference's
  * Delta `whenMatchedUpdateAll / whenNotMatchedInsertAll` MERGE
  * (spark/batch_silver.py:146-159), Delta-free (SURVEY §7.4: no Delta
  * jars ship here; the transaction-log behavior is out of scope, the
  * RESULTING STATE is not).
  *
  * Semantics: rows of `source` replace same-key rows of `target`;
  * unmatched source rows insert; unmatched target rows persist. When
  * `source` itself holds several rows per key, the ordering picks the
  * winner (the reference pre-compacts with W1 for the same reason).
  *
  * Scale: one shuffle on the merge keys over target ∪ source — the
  * same cost class as Delta MERGE's shuffle + file rewrite. At 100 TB
  * the win is pairing this with partitioned storage so only touched
  * partitions rewrite (dynamic partition overwrite).
  */
object Merge {

  /** Merge `source` into `target` on `keys`; among same-key rows the
    * first under `ordering` wins. `sourceWins` must order source rows
    * above target rows (see [[upsert]] for the standard construction). */
  def apply(target: DataFrame, source: DataFrame, keys: Seq[String],
            ordering: Seq[Column]): DataFrame =
    Cdc.latestPerKey(target.unionByName(source), keys, ordering)

  /** The common case: source beats target unconditionally; ties inside
    * the source resolved by `versionCol` descending. Adds and strips a
    * helper `_src` flag. */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String],
             versionCol: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val t = target.withColumn("_src", lit(0))
    val s = source.withColumn("_src", lit(1))
    Cdc.latestPerKey(t.unionByName(s), keys,
        Seq(col("_src").desc, col(versionCol).desc))
      .drop("_src")
  }
}
