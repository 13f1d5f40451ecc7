package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Degenerate-input behavior: a brand-new (empty) corpus must flow
  * through the batch surfaces as empty results — not NPEs, not
  * divide-by-zero, not a driver union-find on nulls — while the
  * operators DOCUMENTED to fail loudly on empty input keep failing
  * loudly. A production pipeline's first run starts exactly here. */
class EdgeCasesSpec extends SparkSuite {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("emptycorpus").toString
    val docs = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val embs = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(java.util.Collections.emptyList[Row](), docs)
      .write.parquet(s"$dir/documents.parquet")
    spark.createDataFrame(java.util.Collections.emptyList[Row](), embs)
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("dedup chain is empty-in empty-out (exact, pairs, clusters, spans)") {
    assert(ext.Dedup.exactDedup(spark, emptyDir).count() == 0)
    assert(ext.Dedup.ngramJaccardPairs(spark, emptyDir).count() == 0)
    assert(ext.Dedup.cappedNearDupPairs(spark, emptyDir).count() == 0)
    assert(ext.Dedup.dedupClusters(spark, emptyDir).count() == 0)
    assert(ext.Dedup.minhashDedupClusters(spark, emptyDir).count() == 0)
    assert(ext.Dedup.repeatedSpans(spark, emptyDir).count() == 0)
    assert(ext.Dedup.incrementalNearDup(spark, emptyDir).count() == 0)
  }

  test("similarity surfaces are empty-in empty-out (knn, ivf, pq)") {
    assert(ext.Similarity.knnBruteForce(spark, emptyDir).count() == 0)
    assert(ext.Similarity.ivfAssign(spark, emptyDir).count() == 0)
    assert(ext.Similarity.pqCodes(spark, emptyDir).count() == 0)
    assert(ext.Similarity.knnPq(spark, emptyDir).count() == 0)
  }

  test("text analysis is empty-in empty-out") {
    assert(ext.TextAnalysis.tokenStats(spark, emptyDir).count() == 0)
    assert(ext.TextAnalysis.sequencePacking(spark, emptyDir).count() == 0)
    assert(ext.TextAnalysis.bigramFamiliarity(spark, emptyDir).count() == 0)
  }

  test("JDBC round trip is empty-in empty-out, not an NPE on null bounds") {
    // min/max of an empty daily summary are null; the round trip must
    // fall back to an unpartitioned read instead of Row.getInt on null
    val dir = java.nio.file.Files.createTempDirectory("emptyorders").toString
    Tables.load(spark, "/root/testdata/sf0.001", "orders").limit(0)
      .write.parquet(s"$dir/orders.parquet")
    assert(sources.Jdbc.jdbcRoundtrip(spark, dir).count() == 0)
  }

  test("pagerank keeps its documented loud failure on an empty graph") {
    val e = intercept[IllegalArgumentException] {
      ext.Graph.pagerankNearDup(spark, emptyDir).count()
    }
    assert(e.getMessage.contains("empty"))
  }
}
