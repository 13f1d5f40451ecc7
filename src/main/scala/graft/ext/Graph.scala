package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the near-dup pair graph — the
  * second whole-graph algorithm next to the connected components of
  * [[Dedup.dedupClusters]] (centrality ranks WHICH document in a
  * duplicate cluster is the canonical one to keep; min-id is the
  * cheap policy, rank-weighted is the quality policy).
  */
object Graph {

  // ---------------------------------------------------------------- q81

  /** Fixed-point mass scale: ranks live in units of S/N. */
  val PageRankScale = 1000000000000L // 10^12
  /** Damping factor 0.85 as an exact rational (85/100). */
  val DampNum = 85L
  val DampDen = 100L
  /** Fixed iteration count — a bench/oracle constant, not a
    * convergence loop (convergence-driven CC is q50's job). */
  val PageRankIters = 3

  /** q81 — PageRank over the symmetric near-dup graph in FLOOR-SCALED
    * INTEGER arithmetic: contributions are `r div outdeg`, damping is
    * `(85 · Σ) div 100` — every operation exact-and-ordered-free long
    * math, so three unrolled iterations are bit-identical in Spark
    * and the DuckDB oracle (the same discipline that made the Lloyd
    * refinement and label centroids oracle-exact; double PageRank
    * would drift with edge aggregation order). The symmetric graph
    * has no dangling nodes by construction (every node with an
    * in-edge has the mirror out-edge), so no teleport-mass
    * redistribution term is needed.
    *
    * Scale: each iteration is one join (edges ⋈ ranks on the 8-byte
    * src key) + one map-side-combined sum — the canonical distributed
    * PageRank shape; the rank/degree tables stay node-sized. The edge
    * source is the CAPPED pair table ([[Dedup.cappedPairs]], the SAME
    * session-cached intermediate q57/q58/q83 share): a boilerplate
    * shingle shared by M docs can never inject an M²-edge graph into
    * the centrality stage, so the edge build is bounded per shingle
    * group — the last link of the 100 TB-safe dedup lineage. */
  def pagerankNearDup(spark: SparkSession, dir: String): DataFrame = {
    // co-partition the symmetric edge table on its join key ONCE and
    // cache it beside the pair table: every iteration's join then
    // shuffles only the node-sized contribution table, not the edges
    // (at 100 TB edges dominate; re-shuffling them x iterations is
    // the naive PageRank's main waste)
    val edges = Dedup.cached(spark, dir, "pagerankEdges") {
      Dedup.symmetrize(Dedup.cappedPairs(spark, dir), "doc_a", "doc_b")
        .repartition(col("doc_a"))
        .persist()
    }
    val deg = edges.groupBy(col("doc_a"))
      .agg(count(lit(1)).as("outdeg"))
    val n = deg.count()
    require(n > 0, "near-dup graph is empty")
    val init = PageRankScale / n
    val base = (15L * init) / 100L
    var rank = deg.select(col("doc_a").as("doc_id"), col("outdeg"),
      lit(init).as("r"))
    for (_ <- 1 to PageRankIters) {
      val contrib = rank.select(col("doc_id").as("src"),
        expr("r div outdeg").as("c"))
      val agg = edges.join(contrib, col("doc_a") === col("src"))
        .groupBy(col("doc_b")).agg(sum(col("c")).as("s"))
      rank = rank.join(agg, col("doc_id") === col("doc_b"), "left")
        .select(col("doc_id"), col("outdeg"),
          (lit(base) +
            expr(s"($DampNum * coalesce(s, 0L)) div $DampDen")).as("r"))
    }
    rank.select(col("doc_id"), col("outdeg"), col("r").as("rank_units"))
      .orderBy(col("rank_units").desc, col("doc_id"))
  }

  val pagerankNearDupSql: String = {
    // the oracle joins on the shingle STRINGS (same derivation as q58:
    // the df-capped pair graph)
    val shingles =
      """list_distinct(list_transform(
        |    range(1, len(regexp_split_to_array(text, '\s+')) - 1),
        |    i -> array_to_string(regexp_split_to_array(text, '\s+')[i:i+2], ' ')))"""
        .stripMargin
    s"""WITH s AS (
       |  SELECT DISTINCT doc_id, unnest($shingles) AS sh FROM documents),
       |f AS (SELECT sh FROM s GROUP BY sh
       |      HAVING count(*) > 1 AND count(*) <= ${Dedup.DfCap}),
       |sf AS (SELECT s.doc_id, s.sh FROM s JOIN f USING (sh)),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sf a JOIN sf b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 3),
       |e AS (SELECT doc_a, doc_b FROM p
       |      UNION ALL SELECT doc_b, doc_a FROM p),
       |deg AS (SELECT doc_a AS doc_id, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM e GROUP BY 1),
       |c AS (SELECT CAST($PageRankScale // count(*) AS BIGINT) AS init,
       |             CAST(15 * ($PageRankScale // count(*)) // 100 AS BIGINT)
       |               AS base
       |      FROM deg),
       |r0 AS (SELECT doc_id, outdeg, (SELECT init FROM c) AS r FROM deg),
       |r1 AS (
       |  SELECT d.doc_id, d.outdeg,
       |    (SELECT base FROM c)
       |      + $DampNum * sum(u.r // u.outdeg) // $DampDen AS r
       |  FROM deg d
       |  JOIN e ON e.doc_b = d.doc_id
       |  JOIN r0 u ON u.doc_id = e.doc_a
       |  GROUP BY d.doc_id, d.outdeg),
       |r2 AS (
       |  SELECT d.doc_id, d.outdeg,
       |    (SELECT base FROM c)
       |      + $DampNum * sum(u.r // u.outdeg) // $DampDen AS r
       |  FROM deg d
       |  JOIN e ON e.doc_b = d.doc_id
       |  JOIN r1 u ON u.doc_id = e.doc_a
       |  GROUP BY d.doc_id, d.outdeg),
       |r3 AS (
       |  SELECT d.doc_id, d.outdeg,
       |    (SELECT base FROM c)
       |      + $DampNum * sum(u.r // u.outdeg) // $DampDen AS r
       |  FROM deg d
       |  JOIN e ON e.doc_b = d.doc_id
       |  JOIN r2 u ON u.doc_id = e.doc_a
       |  GROUP BY d.doc_id, d.outdeg)
       |SELECT doc_id, outdeg, CAST(r AS BIGINT) AS rank_units
       |FROM r3 ORDER BY rank_units DESC, doc_id""".stripMargin
  }
}
