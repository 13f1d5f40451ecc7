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
}
