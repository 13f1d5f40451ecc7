package graft

import graft.ops.Sketches

/** Sketch-layer semantics beyond the oracle gate: the bloom prefilter
  * must be present in the plan AND change nothing about the result;
  * the HLL estimate must sit inside its error contract. */
class SketchesSpec extends SparkSuite {

  test("bloomSemiJoin result equals the sketch-free semi join") {
    val bloom = Sketches.bloomSemiJoin(spark, sfDir).collect().toSeq
    val plain = Sketches.plainSemiJoin(spark, sfDir).collect().toSeq
    assert(bloom == plain)
    assert(bloom.nonEmpty)
  }

  test("bloomSemiJoin plan carries a might_contain prefilter before the join") {
    val plan = Sketches.bloomSemiJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom prefilter missing from plan:\n$plan")
  }

  test("HLL estimate is inside the 5% acceptance band on every group") {
    val rows = Sketches.distinctSketch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("approx_ok")),
      rows.map(r => s"${r.getAs[String]("event_type")}: ok=" +
        r.getAs[Boolean]("approx_ok")).mkString(", "))
  }
}
