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
      // localCheckpoint per iteration: `rank` feeds the next step
      // TWICE (its own join input + the contribution source), so an
      // unbroken lineage doubles the plan tree every iteration —
      // analysis/codegen cost grows 2^iters and the final action
      // re-executes earlier rounds. Node-sized rows, one tiny job
      // each round; the iterative-algorithm idiom (guide §5).
      rank = rank.join(agg, col("doc_id") === col("doc_b"), "left")
        .select(col("doc_id"), col("outdeg"),
          (lit(base) +
            expr(s"($DampNum * coalesce(s, 0L)) div $DampDen")).as("r"))
        .localCheckpoint()
    }
    rank.select(col("doc_id"), col("outdeg"), col("r").as("rank_units"))
      .orderBy(col("rank_units").desc, col("doc_id"))
  }

  val pagerankNearDupSql: String = {
    // the oracle joins on the shingle STRINGS (same derivation as q58:
    // the df-capped pair graph, via the shared CTE prelude)
    s"""WITH ${Dedup.cappedPairCteSql},
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

  // ---------------------------------------------------------------- q109

  /** q109 — TRIANGLE COUNTS + LOCAL CLUSTERING COEFFICIENT over the
    * capped near-dup graph: how CLIQUE-LIKE each document's dup
    * neighborhood is. A boilerplate family shows as a dense triangle
    * cluster (coefficient → 1); a hub doc linking otherwise-unrelated
    * docs shows coefficient → 0 — the standard graph-quality signal
    * next to q81's centrality, and the metric that distinguishes "one
    * template, many fills" from "chains of drifting revisions" in a
    * dedup report.
    *
    * Enumeration is the ordered-edge-list join: every triangle
    * x<y<z is found exactly once as (x,y)⋈(y,z)⋈(x,z) — three
    * equi-joins, no orientation dedup pass. Coefficient = 2T/(d(d−1))
    * divides exact longs, so the double is engine-identical.
    *
    * Scale: edges come from the SAME session-cached capped pair table
    * the whole q57/q58/q81/q83 lineage shares, so per-shingle-group
    * boundedness caps the edge list before any join; the standard
    * further step at extreme scale (orient edges low-degree → high
    * so join fan-out is √m-bounded) is noted but unnecessary on a
    * df-capped graph whose components are clique-sized. */
  def triangleCoefficients(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.cappedPairs(spark, dir).select(col("doc_a"), col("doc_b"))
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.doc_b") === col("bc.doc_a"))
      .join(e.as("ac"), col("ab.doc_a") === col("ac.doc_a") &&
        col("bc.doc_b") === col("ac.doc_b"))
      .select(col("ab.doc_a").as("x"), col("ab.doc_b").as("y"),
        col("bc.doc_b").as("z"))
    val triPerDoc = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
    val deg = e.select(col("doc_a").as("doc_id"))
      .unionAll(e.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
    deg.join(triPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          lit(2.0d) * coalesce(col("n_triangles"), lit(0L)) /
            (col("degree") * (col("degree") - 1)))
          .otherwise(0.0d).as("clustering_coef"))
      .orderBy(col("doc_id"))
  }

  val triangleCoefficientsSql: String =
    s"""WITH ${Dedup.cappedPairCteSql},
       |tri AS (
       |  SELECT ab.doc_a AS x, ab.doc_b AS y, bc.doc_b AS z
       |  FROM p ab JOIN p bc ON ab.doc_b = bc.doc_a
       |    JOIN p ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b),
       |m AS (SELECT x AS doc_id FROM tri
       |      UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
       |t AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
       |      FROM m GROUP BY 1),
       |deg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM
       |    (SELECT doc_a AS doc_id FROM p UNION ALL SELECT doc_b FROM p)
       |  GROUP BY 1)
       |SELECT deg.doc_id, deg.degree,
       |  coalesce(t.n_triangles, 0) AS n_triangles,
       |  CASE WHEN deg.degree >= 2
       |       THEN 2e0 * coalesce(t.n_triangles, 0)
       |            / (deg.degree * (deg.degree - 1))
       |       ELSE 0e0 END AS clustering_coef
       |FROM deg LEFT JOIN t USING (doc_id) ORDER BY deg.doc_id""".stripMargin
}
