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
    // (small populations exclude flags — a lone flagged query must not
    // deflate itself to box-drift)
    val (_, control, flags) = Bench.adjudicate(
      Map("q01" -> 1.0), Map("q01" -> 2.0), Seq("q01"))
    assert(control === 1.0)
    assert(flags.map(_.verdict) === Seq("regression"))
  }

  test("broad box inflation with tight history bands: the control comes " +
    "from ALL checked queries, so mass flags adjudicate box-drift") {
    // 12 queries, every history band tight at 1.0; the box inflates
    // everything 1.5x uniformly. Excluding flagged queries would leave an
    // empty/biased control and verdict 12 regressions; the all-checked
    // median reads the box factor (1.5) and every flag deflates home.
    val names12 = (1 to 12).map(i => f"q$i%02d")
    val hist = names12.map(_ -> Seq(0.95, 1.0, 1.05)).toMap
    val prior = names12.map(_ -> 1.0).toMap
    val now = names12.map(_ -> 1.5).toMap
    val (_, control, flags) = Bench.adjudicate(prior, now, names12, hist)
    assert(control === 1.5)
    assert(flags.nonEmpty && flags.forall(_.verdict === "box-drift"),
      s"uniform inflation must adjudicate box-drift: $flags")
  }

  test("history band: a heavy-tail query swinging inside its own recorded " +
    "range never flags, even past the fixed ratio envelope") {
    // the round-10 q191 shape: history 2.28–5.8 s across same-code rounds;
    // a 2.5x single-round swing is in-band, so no flag at all — where the
    // fixed envelope cried regression and cost a manual re-adjudication
    val hist = Map("q01" -> Seq(2.28, 5.8), "q02" -> Seq(1.0, 1.05, 0.98))
    val prior = Map("q01" -> 2.28, "q02" -> 1.0)
    val (_, _, flags) = Bench.adjudicate(prior,
      Map("q01" -> 5.6, "q02" -> 1.0), Seq("q01", "q02"), hist)
    assert(flags.isEmpty, s"in-band heavy-tail swing flagged: $flags")
  }

  test("history band: a move beyond the recorded range IS a regression, " +
    "and the control deflation can still re-enter the band") {
    val hist = Map("q01" -> Seq(2.28, 5.8))
    val others = (2 to 8).map(i => f"q$i%02d")
    val prior = Map("q01" -> 2.28) ++ others.map(_ -> 1.0)
    // stable box: 9.0 > 5.8*1.35 → real regression
    val (_, c1, f1) = Bench.adjudicate(prior,
      Map("q01" -> 9.0) ++ others.map(_ -> 1.0), "q01" +: others, hist)
    assert(c1 === 1.0 && f1.map(f => f.name -> f.verdict) === Seq("q01" -> "regression"))
    // inflated box (control 1.3): 9.0/1.3 = 6.9 < 7.83 → box-drift
    val (_, c2, f2) = Bench.adjudicate(prior,
      Map("q01" -> 9.0) ++ others.map(_ -> 1.3), "q01" +: others, hist)
    assert(c2 === 1.3 && f2.map(f => f.name -> f.verdict) === Seq("q01" -> "box-drift"))
  }

  test("an extreme flag (past DOUBLE its envelope) verdicts " +
    "needs-subset-confirm, not regression — the r11 q337 replay") {
    // the driver's r11 run: q337 at 5.168 s vs 0.378 prior (13.7x) under a
    // 1.135x control, history band 0.363-0.502 — two in-run re-times
    // "confirmed" it because they ran on the same degraded box stretch; a
    // clean subset run read 0.343 s. The adjudicator must route such flags
    // to the separate-run protocol instead of verdicting regression.
    val others = (1 to 12).map(i => f"c$i%02d")
    val hist = Map("q337" -> Seq(0.378, 0.49)) ++
      others.map(_ -> Seq(0.95, 1.0)).toMap
    val prior = Map("q337" -> 0.378) ++ others.map(_ -> 1.0).toMap
    val now = Map("q337" -> 5.168) ++ others.map(_ -> 1.135).toMap
    val (_, control, flags) = Bench.adjudicate(prior, now,
      "q337" +: others, hist)
    assert(control === 1.135)
    assert(flags.map(f => f.name -> f.verdict) ===
      Seq("q337" -> "needs-subset-confirm"))
    // and the deltas carry a one-paste separate-run confirmation with two
    // untouched tight-band controls beside the suspect
    val cmd = Bench.confirmCmd(Seq("q337"), "q337" +: others,
      Set("q337"), hist, now, "/sf")
    assert(cmd.contains("SPARK_GRAFT_BENCH_ONLY=q337,c01,c02"), cmd)
    assert(cmd.contains("runMain graft.Bench"), cmd)
  }

  test("band-edge exceedance under an off-nominal control is absorbed as " +
    "box-drift — the r11 four-band-edge-flags replay") {
    // r11: four queries landed 4-8% past their history-band maxima after
    // deflation by a 1.135x control — all box state. The deflation carries
    // the control's own uncertainty, so the band widens by
    // min(10%, |control-1|); a QUIET box (control 1.0) keeps it strict.
    val others = (1 to 12).map(i => f"c$i%02d")
    val hist = Map("q279" -> Seq(0.30, 0.40)) ++
      others.map(_ -> Seq(0.95, 1.0)).toMap
    val prior = Map("q279" -> 0.35) ++ others.map(_ -> 1.0).toMap
    // hi = 0.40*1.35 = 0.54; deflated 0.65/1.135 = 0.573 — 6% past the
    // edge, inside the widened band (0.54*1.1 = 0.594) → box-drift
    val hot = Map("q279" -> 0.65) ++ others.map(_ -> 1.135).toMap
    val (_, c1, f1) = Bench.adjudicate(prior, hot, "q279" +: others, hist)
    assert(c1 === 1.135 &&
      f1.map(f => f.name -> f.verdict) === Seq("q279" -> "box-drift"), f1)
    // same measurement on a QUIET box: 0.65 > 0.54 strictly → regression
    val quiet = Map("q279" -> 0.65) ++ others.map(_ -> 1.0).toMap
    val (_, c2, f2) = Bench.adjudicate(prior, quiet, "q279" +: others, hist)
    assert(c2 === 1.0 &&
      f2.map(f => f.name -> f.verdict) === Seq("q279" -> "regression"), f2)
  }

  test("uniform inflation raises the control alert and quarantines the " +
    "history append; clean runs append") {
    // a uniform 1.5x move (code regression OR big box episode — not
    // distinguishable in-run) yields zero flags by construction; the
    // control-sanity band catches it and keeps the medians out of the
    // history so the bands cannot ratchet
    assert(Bench.historyAppendDecision(1.5, Nil).isDefined)
    assert(Bench.historyAppendDecision(0.7, Nil).isDefined)
    assert(Bench.historyAppendDecision(1.1, Nil).isEmpty)
    // unresolved regression-class flags quarantine too
    val reg = Bench.Flag("q01", 1.0, 2.0, 2.0, "regression")
    val confirm = Bench.Flag("q02", 1.0, 5.0, 5.0, "needs-subset-confirm")
    val drift = Bench.Flag("q03", 1.0, 1.4, 1.4, "box-drift")
    assert(Bench.historyAppendDecision(1.0, Seq(reg)).isDefined)
    assert(Bench.historyAppendDecision(1.0, Seq(confirm)).isDefined)
    assert(Bench.historyAppendDecision(1.0, Seq(drift)).isEmpty)
  }

  test("aggregate anchor: a uniform 1.2x run with every per-query time " +
    "in-band still raises the aggregate alert and quarantines the append") {
    // the r12-verdict #3 scenario: per-query history bands are
    // [min/1.35, max*1.35] so a fleet-wide 1.2x creep flags NOTHING and
    // keeps the control inside [0.8, 1.25] — per-query adjudication is
    // structurally blind to it. The aggregate anchor is not: the RAW fleet
    // median (1.2) exits [min/1.15, max*1.15] of the per-round aggregates
    // reconstructed from the history (all 1.0 here), and the append
    // quarantines even though flags are empty and the control is sane.
    val names20 = (1 to 20).map(i => f"q$i%02d")
    val hist = names20.map(_ -> Seq(0.98, 1.0, 1.02)).toMap
    val prior = names20.map(_ -> 1.0).toMap
    val now = names20.map(_ -> 1.2).toMap
    val (_, control, flags) = Bench.adjudicate(prior, now, names20, hist)
    assert(flags.isEmpty, s"1.2x must be inside every per-query band: $flags")
    assert(control === 1.2 && Bench.ControlSaneLo < 1.2 &&
      1.2 < Bench.ControlSaneHi)
    val agg = Bench.aggregateCheck(hist, now, names20, control)
    assert(agg.isDefined && agg.get.alert,
      s"uniform 1.2x creep must exit the aggregate anchor band: $agg")
    assert(agg.get.now === 1.2 && agg.get.hi < 1.2, agg.get.toString)
    assert(Bench.historyAppendDecision(control, flags, agg).isDefined,
      "aggregate alert must quarantine the history append")
    // in-band run: appends as before
    val quiet = names20.map(_ -> 1.05).toMap
    val aggQuiet = Bench.aggregateCheck(hist, quiet, names20, 1.05)
    assert(aggQuiet.isDefined && !aggQuiet.get.alert)
    assert(Bench.historyAppendDecision(1.05, Nil, aggQuiet).isEmpty)
  }

  test("aggregate anchor: subset runs and shallow histories are exempt " +
    "(a 4-query aggregate is not the fleet median)") {
    val hist = (1 to 20).map(i => f"q$i%02d" -> Seq(0.98, 1.0, 1.02)).toMap
    // subset: 4 of 20 queries covered → no aggregate check at all
    val subset = Seq("q01", "q02", "q03", "q04")
    assert(Bench.aggregateCheck(hist, subset.map(_ -> 9.9).toMap,
      subset, 1.0).isEmpty)
    // shallow history (single round) → no anchor to adjudicate against
    val hist1 = (1 to 20).map(i => f"q$i%02d" -> Seq(1.0)).toMap
    val all = (1 to 20).map(i => f"q$i%02d")
    assert(Bench.aggregateCheck(hist1, all.map(_ -> 1.2).toMap,
      all, 1.0).isEmpty)
    // end-aligned reconstruction: younger queries (shorter histories)
    // contribute to recent offsets only; an offset covering under half
    // the fleet yields no anchor point (6 of 20 here at offsets 1-2)
    val mixed = (1 to 6).map(i => f"q$i%02d" -> Seq(0.9, 1.0, 1.1)).toMap ++
      (7 to 20).map(i => f"q$i%02d" -> Seq(1.0)).toMap
    val aggs = Bench.aggregateMedians(mixed)
    assert(aggs.length === 1, s"end-aligned offsets: $aggs")
  }

  test("history band: faster than the recorded range verdicts improvement; " +
    "a single history point falls back to the fixed envelope") {
    val hist = Map("q01" -> Seq(2.0, 3.0), "q03" -> Seq(5.0))
    val others = (4 to 8).map(i => f"q$i%02d")
    val prior = Map("q01" -> 2.5, "q03" -> 1.0) ++ others.map(_ -> 1.0)
    val now = Map("q01" -> 0.9, "q03" -> 1.2) ++ others.map(_ -> 1.0)
    val (_, _, flags) = Bench.adjudicate(prior, now,
      Seq("q01", "q03") ++ others, hist)
    // q01: 0.9 < 2.0/1.35 = 1.48 → improvement; q03 has ONE history point
    // → fixed envelope vs prior (1.2/1.0 inside ×1.35) → no flag
    assert(flags.map(f => f.name -> f.verdict) === Seq("q01" -> "improvement"))
  }
}
