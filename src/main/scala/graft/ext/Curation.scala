package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The capstone training-data query (q57): the corpus a curation
  * pipeline actually ships. A document survives iff it is
  *
  *  1. its duplicate-cluster representative (min doc_id of its
  *     connected component — q50),
  *  2. not low-quality (q29's score band),
  *  3. confidently language-identified (q30's marker heuristic),
  *
  * and comes out with its token budget (q28) attached. One query
  * composes the four extension pillars; at 100 TB each input is a
  * materialized table and this is three id-equi-joins over them —
  * the joins all key on doc_id, so co-partitioning (bucketing by
  * doc_id at write time) makes the composition exchange-free.
  */
object Curation {

  // ---------------------------------------------------------------- q59

  /** Per-language keep rates for the training-mix sample, as EXACT
    * 60-bit integer thresholds (rate × 2^60): the keep decision is an
    * integer compare on a 60-bit md5 hash — no float anywhere, so the
    * sample is bit-reproducible across engines, reruns and cluster
    * sizes (the property a training pipeline needs from its sampler:
    * re-running the job, or re-sharding the corpus, must never change
    * which documents are in the mix). */
  private val MixRates: Seq[(String, Double)] = Seq(
    "en" -> 1.0, "de" -> 0.5, "es" -> 0.5, "fr" -> 0.5, "zh" -> 0.25)
  private val DefaultRate = 0.1
  private def threshold(rate: Double): Long =
    (rate * 1152921504606846976.0d).toLong // × 2^60, exact for these rates

  /** q59 — deterministic stratified sampling by language: keep doc iff
    * md5("mix:" + doc_id) < threshold(lang). One narrow scan, zero
    * shuffles (the filter is a scalar predicate); at 100 TB this is
    * the canonical hash-mod sampler — embarrassingly parallel,
    * no reservoir state, stable under re-partitioning. */
  def trainingMixSample(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.load(spark, dir, "documents")
    val h = HashBridge.md5Bits60(
      md5(concat(lit("mix:"), col("doc_id").cast("string"))))
    val thr = MixRates.foldRight(
      lit(threshold(DefaultRate))) { case ((l, r), acc) =>
      when(col("lang") === l, lit(threshold(r))).otherwise(acc)
    }
    d.select(col("doc_id"), col("lang"), h.as("sample_hash"))
      .filter(col("sample_hash") < thr)
      .orderBy(col("doc_id"))
  }

  val trainingMixSampleSql: String = {
    val cases = MixRates.map { case (l, r) =>
      s"WHEN lang = '$l' THEN ${threshold(r)}"
    }.mkString(" ")
    s"""SELECT doc_id, lang,
       |  ${HashBridge.md5Bits60Sql(
            "md5('mix:' || CAST(doc_id AS VARCHAR))")} AS sample_hash
       |FROM documents
       |WHERE ${HashBridge.md5Bits60Sql(
            "md5('mix:' || CAST(doc_id AS VARCHAR))")}
       |  < (CASE $cases ELSE ${threshold(DefaultRate)} END)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q57

  def trainingSelection(spark: SparkSession, dir: String): DataFrame = {
    // cluster representatives come from the CAPPED chain (q83): the
    // df-cutoff pair graph is the production lineage — one boilerplate
    // shingle can never inject an M²-pair stage into this query
    val reps = Dedup.cappedDedupClusters(spark, dir)
      .filter(col("doc_id") === col("cluster_id")).select("doc_id")
    val quality = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality_score"), col("quality_band"))
    val lang = TextAnalysis.langId(spark, dir)
      .select(col("doc_id"), col("lang_pred"))
    val tokens = TextAnalysis.tokenStats(spark, dir)
      .select(col("doc_id"), col("n_tokens"))
    reps
      .join(quality, Seq("doc_id"))
      .join(lang, Seq("doc_id"))
      .join(tokens, Seq("doc_id"))
      .filter(col("quality_band") =!= "low" && col("lang_pred") =!= "und")
      .select(col("doc_id"), col("lang_pred"), col("quality_score"),
        col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** The oracle composes the q83/q29/q30/q28 CTE bodies verbatim —
    * cluster reps from the CAPPED pair graph (q58's df cutoff before
    * pair expansion), matching [[trainingSelection]]'s lineage. */
  val trainingSelectionSql: String = {
    val stopList = Seq("the", "a", "of", "and", "is", "in", "to")
      .map(s => s"'$s'").mkString(", ")
    val toks = "regexp_split_to_array(text, '\\s+')"
    val scoreCols = TextAnalysis.langProfiles.map { case (l, ws) =>
      val list = ws.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter($toks, t -> t IN ($list))) AS BIGINT) AS s_$l"
    }.mkString(",\n      ")
    val gr = TextAnalysis.langProfiles.map { case (l, _) => s"s_$l" }
      .mkString(", ")
    val caseChain = TextAnalysis.langProfiles.map { case (l, _) =>
      s"WHEN s_$l = g AND g > 0 THEN '$l'"
    }.mkString(" ")
    s"""WITH RECURSIVE sh AS (
       |  SELECT DISTINCT doc_id, unnest(list_distinct(list_transform(
       |    range(1, len($toks) - 1),
       |    i -> array_to_string($toks[i:i+2], ' ')))) AS s
       |  FROM documents),
       |f AS (SELECT s FROM sh GROUP BY s
       |      HAVING count(*) > 1 AND count(*) <= ${Dedup.DfCap}),
       |sfs AS (SELECT sh.doc_id, sh.s FROM sh JOIN f USING (s)),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sfs a JOIN sfs b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 3),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM p
       |  UNION ALL SELECT doc_b, doc_a FROM p),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |reps AS (
       |  SELECT d.doc_id FROM documents d LEFT JOIN reach r
       |    ON r.a = d.doc_id
       |  GROUP BY d.doc_id
       |  HAVING least(d.doc_id, coalesce(min(r.b), d.doc_id)) = d.doc_id),
       |qf AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter($toks, t -> t IN ($stopList))) AS DOUBLE)
       |      AS sc,
       |    CAST(len($toks) AS DOUBLE) AS nt,
       |    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
       |      AS pc,
       |    CAST(length(text) AS DOUBLE) AS nc
       |  FROM documents),
       |quality AS (
       |  SELECT doc_id,
       |    round(0.5 * (sc / nt) + 0.3 * least(1.0, nt / 100.0)
       |          + 0.2 * (1.0 - pc / nc), 6) AS quality_score
       |  FROM qf),
       |ls AS (
       |  SELECT doc_id,
       |      $scoreCols
       |  FROM documents),
       |lg AS (SELECT *, greatest($gr) AS g FROM ls),
       |lang AS (
       |  SELECT doc_id, CASE $caseChain ELSE 'und' END AS lang_pred
       |  FROM lg),
       |tok AS (
       |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens
       |  FROM documents)
       |SELECT r.doc_id, lang.lang_pred, quality.quality_score, tok.n_tokens
       |FROM reps r
       |JOIN quality ON quality.doc_id = r.doc_id
       |JOIN lang ON lang.doc_id = r.doc_id
       |JOIN tok ON tok.doc_id = r.doc_id
       |WHERE quality.quality_score >= 0.35 AND lang.lang_pred <> 'und'
       |ORDER BY r.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q82

  /** q82 — QUALITY-WEIGHTED deterministic sampling: each document's
    * keep probability IS its quality score (q29), decided by
    * `hash < floor(score · 2^60)` — the importance-sampling step of a
    * training mix (upweight clean text, downweight junk) with q59's
    * bit-reproducibility. Parity: the score is the oracle-proven q29
    * expression; `· 2^60` and `floor` are exact IEEE ops on identical
    * doubles, and the compare is integer — no rounding-mode
    * divergence anywhere. Zero shuffles: scan → scalar predicate. */
  def qualityWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    val h = HashBridge.md5Bits60(
      md5(concat(lit("wq:"), col("doc_id").cast("string"))))
    scored
      .withColumn("sample_hash", h)
      .withColumn("threshold",
        floor(col("quality_score") * lit(1152921504606846976.0d))
          .cast("long"))
      .filter(col("sample_hash") < col("threshold"))
      .select(col("doc_id"), col("quality_score"), col("sample_hash"))
      .orderBy(col("doc_id"))
  }

  val qualityWeightedSampleSql: String = {
    val h = HashBridge.md5Bits60Sql("md5('wq:' || CAST(doc_id AS VARCHAR))")
    // re-derive the q29 score expression (same CTE as the q29 oracle)
    s"""WITH f AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
       |      t -> t IN (${TextAnalysis.stopwords.map(s => s"'$s'").mkString(", ")})))
       |      AS DOUBLE) AS sc,
       |    CAST(len(regexp_split_to_array(text, '\\s+')) AS DOUBLE) AS nt,
       |    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
       |      AS pc,
       |    CAST(length(text) AS DOUBLE) AS nc
       |  FROM documents),
       |q AS (
       |  SELECT doc_id,
       |    round(0.5 * (sc / nt) + 0.3 * least(1.0, nt / 100.0)
       |          + 0.2 * (1.0 - pc / nc), 6) AS quality_score
       |  FROM f)
       |SELECT doc_id, quality_score, $h AS sample_hash
       |FROM q
       |WHERE $h < CAST(floor(quality_score * 1152921504606846976.0) AS BIGINT)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q68

  /** Fixed per-stratum quota for the q68 sampler. */
  val QuotaPerLang = 25

  /** q68 — deterministic QUOTA sampling: exactly
    * min([[QuotaPerLang]], |stratum|) docs per language, picked by
    * md5-hash rank — the fixed-budget companion of q59's rate
    * sampler (a training mix usually pins "N docs of language X", not
    * a rate). Hash-ranked, so the pick set is stable across reruns
    * and re-sharding, and oracle-reproducible.
    *
    * Scale: window row_number sorts each stratum — fine while strata
    * are language-sized partitions of the shuffle (the sort is
    * per-partition, spillable). At 100 TB skip the full sort: sample
    * the hash column, estimate the per-stratum k-th hash quantile,
    * filter to it (q59's shape), and exact-top-k only the survivors. */
  def quotaSample(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.load(spark, dir, "documents")
    val h = HashBridge.md5Bits60(
      md5(concat(lit("quota:"), col("doc_id").cast("string"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("sample_hash"), col("doc_id"))
    d.select(col("doc_id"), col("lang"), h.as("sample_hash"))
      .withColumn("pick_no", row_number().over(w))
      .filter(col("pick_no") <= QuotaPerLang)
      .select(col("doc_id"), col("lang"), col("pick_no").cast("int").as("pick_no"))
      .orderBy(col("lang"), col("pick_no"))
  }

  val quotaSampleSql: String = {
    val h = HashBridge.md5Bits60Sql("md5('quota:' || CAST(doc_id AS VARCHAR))")
    s"""WITH ranked AS (
       |  SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang ORDER BY $h, doc_id)
       |      AS pick_no
       |  FROM documents)
       |SELECT doc_id, lang, CAST(pick_no AS INT) AS pick_no
       |FROM ranked WHERE pick_no <= $QuotaPerLang
       |ORDER BY lang, pick_no""".stripMargin
  }

  // ------------------------------------------------------------- q98

  /** Train/val/test proportions in tenths: 8/1/1. */
  val SplitTrainTenths = 8
  val SplitValTenths = 1

  /** q98 — STRATIFIED train/val/test split: every language stratum is
    * partitioned 80/10/10 with EXACT integer quotas (floor(n·8/10)
    * train, floor(n·9/10) cumulative val, remainder test), assignment
    * decided by md5-hash rank within the stratum — deterministic,
    * seedless, rerun-stable, and independent of input order: the
    * properties an eval split must have so that no document ever
    * migrates between train and test across pipeline reruns (the
    * silent eval-contamination failure mode). The hash is salted
    * distinctly from q68's sampler so the two rankings are
    * independent draws.
    *
    * Scale: the rank is a per-stratum sort — at 100 TB run it as one
    * range-partitioned sort per stratum (Spark's Window already
    * spills); the decision itself is two integer compares. A split is
    * computed once per corpus snapshot and persisted, so sort cost
    * amortizes to zero across consumers (same materialize-once
    * contract as the sketch tables). */
  def stratifiedSplit(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.load(spark, dir, "documents")
    val h = HashBridge.md5Bits60(
      md5(concat(lit("split:"), col("doc_id").cast("string"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("split_hash"), col("doc_id"))
    val n = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    d.select(col("doc_id"), col("lang"), h.as("split_hash"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(n))
      .select(col("doc_id"), col("lang"),
        when(col("rk") <= col("n") * SplitTrainTenths / 10, "train")
          .when(col("rk") <= col("n") * (SplitTrainTenths + SplitValTenths) / 10,
            "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  val stratifiedSplitSql: String = {
    val h = HashBridge.md5Bits60Sql("md5('split:' || CAST(doc_id AS VARCHAR))")
    s"""WITH ranked AS (
       |  SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang ORDER BY $h, doc_id) AS rk,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM documents)
       |SELECT doc_id, lang,
       |  CASE WHEN rk <= n * $SplitTrainTenths // 10 THEN 'train'
       |       WHEN rk <= n * ${SplitTrainTenths + SplitValTenths} // 10
       |         THEN 'val'
       |       ELSE 'test' END AS split
       |FROM ranked ORDER BY doc_id""".stripMargin
  }
}
