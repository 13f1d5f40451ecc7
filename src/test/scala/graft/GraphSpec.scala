package graft

import graft.ext.Graph

/** PageRank invariants the oracle's value-compare doesn't spell out. */
class GraphSpec extends SparkSuite {

  test("pagerank conserves mass up to floor leakage, ranks hubs above leaves") {
    val rows = Graph.pagerankNearDup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    val total = rows.map(_.getAs[Long]("rank_units")).sum
    // every div floors at most 1 unit per node per term per iteration;
    // the bound is generous but proves no gross mass loss/creation
    assert(total <= Graph.PageRankScale)
    assert(total >= Graph.PageRankScale - n * 200L * Graph.PageRankIters,
      s"total=$total scale=${Graph.PageRankScale} n=$n")
    // rank is degree-correlated on a near-regular graph: the max-degree
    // node must outrank the min-degree node
    val byDeg = rows.sortBy(_.getAs[Long]("outdeg"))
    assert(byDeg.last.getAs[Long]("rank_units") >=
      byDeg.head.getAs[Long]("rank_units"))
  }

  test("triangle coefficients: planted clique vs lone edge (q109)") {
    import spark.implicits._
    // docs 1/2/3 share one 5-token run → 3 pairwise near-dup edges →
    // ONE triangle, coefficient 1 for each member; docs 4/5 share a
    // different run → a lone edge (degree 1, no triangle); doc 6 is
    // unique → absent from the graph entirely
    val clique = "alpha beta gamma delta epsilon"
    val edge = "red orange yellow green blue"
    val docs = Seq(
      (1L, s"$clique u1a u1b"), (2L, s"$clique u2a u2b"),
      (3L, s"$clique u3a u3b"),
      (4L, s"$edge u4a u4b"), (5L, s"$edge u5a u5b"),
      (6L, "lone wolf text nothing shared here"))
    val tmp = java.nio.file.Files.createTempDirectory("tri").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Graph.triangleCoefficients(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L), s"graph members: $out")
    Seq(1L, 2L, 3L).foreach(d =>
      assert(out(d) == ((2L, 1L, 1.0)), s"clique member $d: ${out(d)}"))
    Seq(4L, 5L).foreach(d =>
      assert(out(d) == ((1L, 0L, 0.0)), s"edge member $d: ${out(d)}"))
  }
}
