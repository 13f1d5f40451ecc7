package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contended-window rescue policy (round-6): a query whose
  * EVERY calibration window ran hot earns one bounded extra run, so a
  * both-runs-contended number (r5's q09) can rescue itself instead of
  * surviving into the artifact. Pure-closure harness — the policy is
  * what's pinned, with synthetic contended windows standing in for the
  * spin threads. */
class BenchSpec extends AnyFunSuite {

  private def runner(times: Double*): () => Double = {
    val it = Iterator(times: _*)
    () => it.next()
  }

  test("both windows contended -> a third run is recorded") {
    // floor 0.05; probes 0.30/0.57 (the r5 q09 signature) then a
    // clean 0.06 third window whose run shows the honest time
    val (raw, cal) = Bench.measureQuery(remeasure = true,
      run = runner(3.68, 3.1, 0.36),
      probe = runner(0.30, 0.57, 0.06),
      calFloor = 0.05,
      tryRescue = () => true)
    assert(raw == Seq(3.68, 3.1, 0.36) && cal == Seq(0.30, 0.57, 0.06))
    assert(raw.min == 0.36, "min-of-3 takes the rescued clean run")
  }

  test("one clean window -> no rescue (min-of-2 already saved it)") {
    val (raw, cal) = Bench.measureQuery(remeasure = true,
      run = runner(3.68, 0.37),
      probe = runner(0.30, 0.06),
      calFloor = 0.05,
      tryRescue = () => fail("must not ask for budget on a clean window"))
    assert(raw == Seq(3.68, 0.37) && cal == Seq(0.30, 0.06))
  }

  test("exhausted suite budget -> contended query keeps its two runs") {
    val (raw, _) = Bench.measureQuery(remeasure = true,
      run = runner(3.68, 3.1),
      probe = runner(0.30, 0.57),
      calFloor = 0.05,
      tryRescue = () => false)
    assert(raw == Seq(3.68, 3.1))
  }

  test("NoRemeasure/once queries never re-run, contended or not") {
    val (raw, cal) = Bench.measureQuery(remeasure = false,
      run = runner(4.77),
      probe = runner(0.30),
      calFloor = 0.05,
      tryRescue = () => fail("single-run queries never rescue"))
    assert(raw == Seq(4.77) && cal == Seq(0.30))
  }

  test("a failed first run is not re-measured") {
    val (raw, _) = Bench.measureQuery(remeasure = true,
      run = runner(-1.0),
      probe = runner(0.30),
      calFloor = 0.05,
      tryRescue = () => fail("failed queries never rescue"))
    assert(raw == Seq(-1.0))
  }

  test("threshold boundary: cal exactly at factor x floor is NOT contended") {
    val (raw, _) = Bench.measureQuery(remeasure = true,
      run = runner(1.0, 1.0),
      probe = runner(0.075, 0.075), // == 1.5 x 0.05, not strictly above
      calFloor = 0.05,
      tryRescue = () => fail("boundary must not trigger rescue"))
    assert(raw.size == 2)
  }
}
