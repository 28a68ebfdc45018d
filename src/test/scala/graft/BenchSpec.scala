package graft

/** The bench's self-defense layer (round-11 verdict: board-context
  * noise was the dominant error bar and the bench couldn't tell a
  * loaded box from a slow query). The probe/flag mechanics are pure
  * and tested directly; a "deliberately loaded run" is a rep whose
  * interleaved probe inflated past the factor.
  */
class BenchSpec extends SparkSpec {

  test("filterFlagged: a loaded rep is dropped and counted") {
    val baseline = 0.05
    val (kept, n) = Bench.filterFlagged(
      Seq((1.0, 0.05), (9.0, 0.17), (1.1, 0.06)), baseline, 2.0)
    assert(kept == Seq(1.0, 1.1))
    assert(n == 1)
  }

  test("filterFlagged: a fully loaded run flags every rep but still reports") {
    // dropping everything would hide the query; the flag count in the
    // bench JSON is the tell that the whole run was contended
    val (all, m) = Bench.filterFlagged(
      Seq((2.0, 0.2), (2.2, 0.3)), baseline = 0.05, factor = 2.0)
    assert(all == Seq(2.0, 2.2))
    assert(m == 2)
  }

  test("filterFlagged: exactly factor x baseline does not flag; empty input is clean") {
    val (b, z) = Bench.filterFlagged(Seq((1.0, 0.1)), 0.05, 2.0)
    assert(b == Seq(1.0) && z == 0)
    val (e, ze) = Bench.filterFlagged(Nil, 0.05, 2.0)
    assert(e.isEmpty && ze == 0)
  }

  test("probeOnce: fixed work, sane positive wall time, repeatable") {
    val ps = (1 to 5).map(_ => Bench.probeOnce(spark))
    assert(ps.forall(p => p > 0 && p < 10), ps.toString)
  }
}
