package graft

import graft.ext.Cleaning

/** Semantic tests for the text-cleaning stage (q62-q64) beyond the
  * oracle gate: the driver corpus contains no redactable spans, so the
  * redaction classes are proven here on planted rows. */
class CleaningSpec extends SparkSuite {
  import spark.implicits._

  private def stage(rows: (Long, String)*): String = {
    val tmp = java.nio.file.Files.createTempDirectory("cleaning").toString
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("textScrub redacts URLs, emails and long digit runs") {
    val dir = stage(
      1L -> "visit https://example.com/a?b=c now or mail me at jo.doe+x@mail.example.org ok",
      2L -> "card 1234567890 and short 12345 stay but the of and go",
      3L -> "plain words only here")
    val out = Cleaning.textScrub(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("clean_text") ==
      "visit <URL> now or mail me at <EMAIL> ok")
    assert(out(1L).getAs[Long]("n_urls") == 1L)
    assert(out(1L).getAs[Long]("n_emails") == 1L)
    // 1234567890 (>=6 digits) redacted; 12345 kept; stopwords stripped
    assert(out(2L).getAs[String]("clean_text") ==
      "card <NUM> short 12345 stay but go")
    assert(out(2L).getAs[Long]("n_digit_runs") == 1L)
    assert(out(2L).getAs[Long]("n_tokens_removed") == 4L) // and, the, of, and
    assert(out(3L).getAs[String]("clean_text") == "plain words only here")
    assert(out(3L).getAs[Long]("n_tokens_removed") == 0L)
  }

  test("redaction counts reflect what each sequential pass replaced") {
    // the email and the digit run live INSIDE the URL: the URL pass
    // swallows them, so the later passes replace nothing — counts of
    // actual replacements must be (1, 0, 0), not the (1, 1, 1) a
    // count-on-original-text would report
    val dir = stage(
      1L -> "see https://u.example.com/jo.doe@mail.example.org/1234567890 end")
    val out = Cleaning.textScrub(spark, dir).collect().head
    assert(out.getAs[String]("clean_text") == "see <URL> end")
    assert(out.getAs[Long]("n_urls") == 1L)
    assert(out.getAs[Long]("n_emails") == 0L)
    assert(out.getAs[Long]("n_digit_runs") == 0L)
  }

  test("repetitionScore flags looping text and hot tokens") {
    val looping = Seq.fill(30)("spam spam eggs").mkString(" ") // 90 tokens
    val diverse = (1 to 90).map(i => s"tok$i").mkString(" ")
    val dir = stage(1L -> looping, 2L -> diverse)
    val out = Cleaning.repetitionScore(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // looping doc: only a handful of distinct 2-grams over 89 slots
    assert(out(1L).getAs[Double]("dup_2gram_ratio") > 0.9)
    assert(out(2L).getAs[Double]("dup_2gram_ratio") == 0.0)
    // 60 of 90 tokens are "spam"
    assert(math.abs(out(1L).getAs[Double]("top_token_share") - 60.0 / 90) < 1e-6)
    assert(math.abs(out(2L).getAs[Double]("top_token_share") - 1.0 / 90) < 1e-6)
  }

  test("boilerplateNgrams surfaces only 3-grams above the df share") {
    // 40 docs sharing one footer; threshold ceil(0.05*40)=2 excludes
    // every per-doc unique 3-gram (df=1)
    val rows = (1L to 40L).map { i =>
      i -> s"unique body $i words here all rights reserved"
    }
    val dir = stage(rows: _*)
    val out = Cleaning.boilerplateNgrams(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("df") >= 2L))
    assert(out.forall(r => !r.getAs[String]("ngram").contains("unique body")))
    val shared = out.find(_.getAs[String]("ngram") == "all rights reserved").get
    assert(shared.getAs[Long]("df") == 40L)
    assert(math.abs(shared.getAs[Double]("doc_share") - 1.0) < 1e-9)
  }
}
