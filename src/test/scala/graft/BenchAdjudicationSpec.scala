package graft

/** Pure pins for Bench.adjudicate — the drift envelope and the
  * untouched-control verdict rule (no Spark needed). */
class BenchAdjudicationSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val names = (1 to 10).map(i => f"q$i%02d")

  test("uniform box inflation: every flag adjudicates box-drift, control tracks it") {
    // 7 control queries +22% (inside envelope, set the control), 3 heavy
    // queries +50% raw — outside the envelope, but only ~+23% after the
    // control deflation → box-drift, not regression
    val prior = names.map(_ -> 1.0).toMap
    val now = names.map(n => n ->
      (if (Set("q01", "q02", "q03")(n)) 1.5 else 1.22)).toMap
    val (checked, control, flags) = Bench.adjudicate(prior, now, names)
    assert(checked === 10)
    assert(control === 1.22)
    assert(flags.map(_.name).toSet === Set("q01", "q02", "q03"))
    assert(flags.forall(_.verdict === "box-drift"))
  }

  test("a real regression survives the control deflation") {
    // stable box (control 1.0): a 2x query is a regression, a 0.5x an
    // improvement, a 1.1x inside the envelope never flags
    val prior = names.map(_ -> 1.0).toMap
    val now = names.map(n => n -> (n match {
      case "q01" => 2.0
      case "q02" => 0.5
      case _ => 1.1
    })).toMap
    val (_, control, flags) = Bench.adjudicate(prior, now, names)
    assert(control === 1.1)
    assert(flags.map(f => f.name -> f.verdict).toMap
      === Map("q01" -> "regression", "q02" -> "improvement"))
  }

  test("envelope: sub-0.1s absolute moves never flag; missing prior is unchecked") {
    val prior = Map("q01" -> 0.05, "q02" -> 1.0)
    val now = Map("q01" -> 0.09, "q02" -> 1.0, "q99" -> 5.0)
    val (checked, _, flags) = Bench.adjudicate(prior, now,
      Seq("q01", "q02", "q99"))
    assert(checked === 2) // q99 has no prior
    assert(flags.isEmpty) // q01 moved 1.8x but only 0.04 s
  }

  test("control excludes flagged and sub-0.2s queries; empty control falls back to 1.0") {
    // only one checked query, itself flagged → control 1.0, raw verdict
    val (_, control, flags) = Bench.adjudicate(
      Map("q01" -> 1.0), Map("q01" -> 2.0), Seq("q01"))
    assert(control === 1.0)
    assert(flags.map(_.verdict) === Seq("regression"))
  }
}
