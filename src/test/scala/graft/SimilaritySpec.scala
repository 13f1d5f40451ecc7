package graft

import graft.ext.Similarity

/** ANN quality guarantees the oracle gate can't express: recall of the
  * approximate paths against the exact brute-force top-k. */
class SimilaritySpec extends SparkSuite {

  private def topkSets(rows: Array[org.apache.spark.sql.Row]) =
    rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap

  lazy val exact = topkSets(Similarity.knnBruteForce(spark, sfDir).collect())

  test("int8-quantized shortlist + rerank reproduces brute force exactly") {
    val quant = Similarity.knnQuantized(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val brute = Similarity.knnBruteForce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(quant.toSeq == brute.toSeq)
  }

  test("LSH recall@5 vs brute force is usable (>= 0.5 mean)") {
    val approx = topkSets(Similarity.knnLsh(spark, sfDir).collect())
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).count(truth).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@5 = $mean")
  }

  test("IVF recall@5 vs brute force is usable (>= 0.5 mean)") {
    val approx = topkSets(Similarity.knnIvf(spark, sfDir).collect())
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).count(truth).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@5 = $mean")
  }

  test("ADC+rerank with a full-corpus shortlist IS brute force (q112 identity)") {
    // when the shortlist covers every corpus vector the PQ estimate
    // only orders the rerank's INPUT, which rescans exact embeddings —
    // so the pipeline must reproduce brute force verbatim, rounding
    // and tie-breaks included
    val n = Tables.load(spark, sfDir, "embeddings").count().toInt
    val full = Similarity.knnPqWith(spark, sfDir, n).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val brute = Similarity.knnBruteForce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(full.toSeq == brute.toSeq)
  }

  test("PQ/ADC recall@5 vs brute force is usable with a TIGHT shortlist") {
    // 10 of ~50 corpus vectors (20%) — the approximation must carry
    // real signal, not survive on shortlist width
    val approx = topkSets(Similarity.knnPqWith(spark, sfDir, 10).collect())
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).count(truth).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean recall@5 = $mean")
  }

  test("every vector lands in exactly one IVF cell") {
    val n = Tables.load(spark, sfDir, "embeddings").count()
    val assigned = Similarity.ivfAssign(spark, sfDir)
    assert(assigned.count() == n)
    assert(assigned.select("vec_id").distinct().count() == n)
  }

  test("Lloyd refinement never increases total within-cell distance") {
    def totalDist(df: org.apache.spark.sql.DataFrame) =
      df.agg(org.apache.spark.sql.functions.sum("dist2")).head.getDouble(0)
    val seed = totalDist(Similarity.ivfAssign(spark, sfDir))
    val refined = totalDist(Similarity.ivfRefinedAssign(spark, sfDir))
    assert(refined <= seed + 1e-6,
      s"refinement worsened the quantizer: $seed -> $refined")
  }

  test("hard negatives never share the query's label and rank by cosine") {
    val labels = Tables.load(spark, sfDir, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val negs = Similarity.hardNegatives(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(negs.nonEmpty)
    negs.foreach { case (q, n, _, _) =>
      assert(labels(q) != labels(n), s"negative $n shares label with $q")
    }
    // within each query, cosine non-increasing across ranks
    negs.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // each negative must be at least as close as every other
    // different-label vector excluded from the top-k (spot check via
    // count: exactly HardNegK per query when enough candidates exist)
    assert(negs.groupBy(_._1).values.forall(_.length == Similarity.HardNegK))
  }

  test("ANN-shortlist hard negatives reproduce brute force exactly (q95 ≡ q90)") {
    // the q73 gate contract extended to negatives: the int8 shortlist
    // must contain every true top-HardNegK different-label neighbor,
    // and the exact rerank must then reproduce q90 verbatim — rank,
    // id, and rounded cosine all equal
    val ann = Similarity.hardNegativesAnn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val brute = Similarity.hardNegatives(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(ann.nonEmpty)
    assert(ann.toSeq == brute.toSeq)
  }

  test("ivfAssign broadcasts the centroids (no corpus shuffle join)") {
    val plan = Similarity.ivfAssign(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
