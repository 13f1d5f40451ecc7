package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextExprs.shingles

/** Text-cleaning operators of a large-scale training-data pipeline —
  * the normalize/scrub/boilerplate stage that runs BEFORE dedup and
  * quality filtering (beyond the reference's surface, SURVEY §7.5).
  *
  * Scale design: q62/q63 are shuffle-free narrow projections (scalar
  * regex/array expressions over the scan — same zero-exchange shape as
  * [[TextAnalysis]]); q64 is one map-side-combined hash aggregate on
  * the shingle string, the only corpus-sized exchange in the file.
  *
  * Regex discipline: every pattern is written in the common
  * Java-regex/RE2 subset (character classes, bounded quantifiers, no
  * backreferences/lookaround) so Spark and the DuckDB oracle compile
  * the SAME automaton; redaction passes apply in a fixed order
  * (URL → email → long digit runs) in both engines because the
  * passes' matches can overlap.
  */
object Cleaning {

  /** Patterns shared between the Spark expressions and the oracle SQL.
    * `\b`-free on purpose: RE2 and java.util.regex agree on these. */
  private val UrlRe = "https?://[^\\s]+"
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val DigitsRe = "[0-9]{6,}"

  // ---------------------------------------------------------------- q62

  /** q62 — scrub + normalize: redact URLs / emails / long digit runs
    * (PII-ish spans) to typed placeholders, then drop stopword and
    * empty tokens and re-join on single spaces (whitespace
    * normalization falls out of the re-join). Emits per-doc redaction
    * counts so a downstream filter can drop documents that were
    * mostly PII.
    *
    * The driver corpus contains no redactable spans (CleaningSpec
    * proves each redaction class on planted rows); the stopword strip
    * is the corpus-visible effect the oracle locks in. */
  def textScrub(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    // each count runs against the text AS THAT PASS SAW IT: an email
    // inside an already-redacted URL is never replaced by the email
    // pass, so counting every pattern on the original text would
    // overstate what was redacted (the counts exist to gate "mostly
    // PII" docs, so they must equal actual replacements)
    val afterUrl = regexp_replace(col("text"), UrlRe, "<URL>")
    val afterEmail = regexp_replace(afterUrl, EmailRe, "<EMAIL>")
    val scrubbed = regexp_replace(afterEmail, DigitsRe, "<NUM>")
    val toks = split(scrubbed, "\\s+")
    val kept = filter(toks, t =>
      length(t) > 0 && !t.isin(TextAnalysis.stopwords.map(lit): _*))
    d.select(
      col("doc_id"),
      concat_ws(" ", kept).as("clean_text"),
      regexp_count(col("text"), lit(UrlRe)).cast("long").as("n_urls"),
      regexp_count(afterUrl, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(afterEmail, lit(DigitsRe)).cast("long").as("n_digit_runs"),
      (size(toks) - size(kept)).cast("long").as("n_tokens_removed"))
      .orderBy(col("doc_id"))
  }

  val textScrubSql: String = {
    val stopList = TextAnalysis.stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH s AS (
       |  SELECT doc_id, text,
       |    regexp_replace(text, '$UrlRe', '<URL>', 'g') AS after_url
       |  FROM documents),
       |s2 AS (
       |  SELECT *,
       |    regexp_replace(after_url, '$EmailRe', '<EMAIL>', 'g') AS after_email
       |  FROM s),
       |s3 AS (
       |  SELECT *,
       |    regexp_replace(after_email, '$DigitsRe', '<NUM>', 'g') AS scrubbed
       |  FROM s2),
       |t AS (
       |  SELECT doc_id, text, after_url, after_email,
       |    regexp_split_to_array(scrubbed, '\\s+') AS toks,
       |    list_filter(regexp_split_to_array(scrubbed, '\\s+'),
       |      x -> length(x) > 0 AND x NOT IN ($stopList)) AS kept
       |  FROM s3)
       |SELECT doc_id,
       |  array_to_string(kept, ' ') AS clean_text,
       |  CAST(len(regexp_extract_all(text, '$UrlRe')) AS BIGINT) AS n_urls,
       |  CAST(len(regexp_extract_all(after_url, '$EmailRe')) AS BIGINT)
       |    AS n_emails,
       |  CAST(len(regexp_extract_all(after_email, '$DigitsRe')) AS BIGINT)
       |    AS n_digit_runs,
       |  CAST(len(toks) - len(kept) AS BIGINT) AS n_tokens_removed
       |FROM t ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q63

  /** q63 — repetition scoring (the "gibberish / looping text" filter):
    * per-doc duplicate word-2-gram ratio and hottest-token share.
    * `shingles` (native expr) yields DISTINCT 2-grams, so the
    * duplicate ratio is 1 − distinct/total without a second explode;
    * the hottest-token share is one `aggregate` fold over the sorted
    * token array — everything stays inside the projection, zero
    * exchanges. */
  def repetitionScore(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val toks = TextAnalysis.tokens(col("text"))
    val nTok = size(toks)
    val total2 = (nTok - 1).cast("double")
    val dist2 = size(shingles(col("text"), 2)).cast("double")
    // max frequency of any single token = longest run in the sorted
    // token array; fold carries (prev, run, best)
    val sorted = sort_array(toks)
    val best = aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(run, acc.getField("best")).as("best"))
      },
      acc => acc.getField("best"))
    d.select(
      col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      when(total2 > 0.0, round(lit(1.0) - dist2 / total2, 6))
        .otherwise(lit(0.0)).as("dup_2gram_ratio"),
      round(best.cast("double") / nTok.cast("double"), 6)
        .as("top_token_share"))
      .orderBy(col("doc_id"))
  }

  val repetitionScoreSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    regexp_split_to_array(text, '\s+') AS toks,
      |    len(regexp_split_to_array(text, '\s+')) AS nt
      |  FROM documents),
      |tc AS (
      |  SELECT doc_id, tok, count(*) AS c
      |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
      |best AS (SELECT doc_id, max(c) AS best FROM tc GROUP BY 1),
      |g AS (
      |  SELECT t.doc_id, t.nt,
      |    CAST(t.nt - 1 AS DOUBLE) AS total2,
      |    CAST(len(list_distinct(list_transform(range(1, t.nt),
      |      i -> t.toks[i] || ' ' || t.toks[i+1]))) AS DOUBLE) AS dist2,
      |    best.best AS best
      |  FROM t JOIN best ON t.doc_id = best.doc_id)
      |SELECT doc_id,
      |  CAST(nt AS BIGINT) AS n_tokens,
      |  CASE WHEN total2 > 0 THEN round(1.0 - dist2 / total2, 6)
      |       ELSE 0.0 END AS dup_2gram_ratio,
      |  round(CAST(best AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS top_token_share
      |FROM g ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q64

  /** Boilerplate threshold: a 3-gram counts once its document
    * frequency reaches max(ceil([[BoilerplateMinShare]]·n),
    * [[BoilerplateMinDf]]) — share-based so real corpora scale the
    * bar with size, with an absolute floor so small corpora (where
    * share·n rounds to 1) don't call every 3-gram boilerplate. */
  val BoilerplateMinShare = 0.001
  val BoilerplateMinDf = 5L

  /** q64 — corpus-level boilerplate n-grams: word-3-grams present in
    * ≥ [[BoilerplateMinShare]] of documents, with document frequency
    * and share. The downstream scrub joins this table back to strip
    * the spans; here the table itself is the gated output.
    *
    * Scale: explode (distinct-per-doc shingles, so df = plain count)
    * → ONE hash aggregate on the shingle string with map-side
    * combine; the boilerplate threshold keeps the result
    * vocabulary-sized. Unlike q33's pair machinery this keeps the
    * STRING through the exchange because the string is the output —
    * df-hot shingles are exactly what survives, and partial
    * aggregation collapses them before the shuffle. */
  def boilerplateNgrams(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val n = d.count()
    val minDf = math.max(math.ceil(BoilerplateMinShare * n).toLong,
      BoilerplateMinDf)
    d.select(explode(shingles(col("text"), 3)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("ngram"), col("df"),
        round(col("df").cast("double") / lit(n.toDouble), 6).as("doc_share"))
      .orderBy(col("df").desc, col("ngram"))
  }

  val boilerplateNgramsSql: String =
    s"""WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |sh AS (
       |  SELECT unnest(list_distinct(list_transform(
       |           range(1, len(regexp_split_to_array(text, '\\s+')) - 1),
       |           i -> array_to_string(
       |                  regexp_split_to_array(text, '\\s+')[i:i+2], ' '))))
       |    AS ngram
       |  FROM documents
       |  WHERE len(regexp_split_to_array(text, '\\s+')) >= 3),
       |g AS (SELECT ngram, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1)
       |SELECT g.ngram, g.df, round(CAST(g.df AS DOUBLE) / n.n, 6) AS doc_share
       |FROM g CROSS JOIN n
       |WHERE g.df >= greatest(ceil($BoilerplateMinShare * n.n),
       |                       $BoilerplateMinDf)
       |ORDER BY g.df DESC, g.ngram""".stripMargin
}
