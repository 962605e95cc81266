package graft

import org.apache.spark.sql.SparkSession

/** See [[Bench.readjudicate]]. */
object BenchReadjudicate {
  def main(args: Array[String]): Unit = {
    val priorPath = args(0)
    val fullPath = if (args.length > 1) args(1) else "BENCH_FULL.json"
    val histPath = if (args.length > 2) args(2) else "BENCH_HISTORY.json"
    val json = Bench.readjudicate(priorPath, fullPath, histPath)
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DELTAS.json"),
      json.getBytes("UTF-8"))
    println(json.linesIterator.take(7).mkString("\n"))
  }
}

object Bench {

  /** True median: average the two middle elements for even n (a two-run
    * sample's "median" must not report the slower run). */
  def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) 0.0
    else {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

  /** Parse the flat `{"name": sec, ...}` shape Bench itself writes to
    * BENCH_FULL.json — the committed copy is the prior round's per-query
    * band the drift check adjudicates against. */
  def parsePriorFull(path: java.nio.file.Path): Map[String, Double] =
    if (!java.nio.file.Files.isRegularFile(path)) Map.empty
    else {
      val re = """"([A-Za-z0-9_]+)"\s*:\s*([0-9.eE+-]+)""".r
      val text = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      re.findAllMatchIn(text).map(m => m.group(1) -> m.group(2).toDouble).toMap
    }

  case class Flag(name: String, prev: Double, now: Double, ratio: Double,
                  verdict: String)

  /** Control-ratio sanity band. A control outside it means the WHOLE
    * checked population moved together — either a major box-drift episode
    * or a UNIFORM code regression, which are indistinguishable in-run on
    * this box (ADVICE r11: excluding neither, a uniform 1.5× code
    * regression reads as control 1.5 and zero flags). Such runs raise a
    * `control_alert` in BENCH_DELTAS and their medians are QUARANTINED
    * from the history append — otherwise one inflated run widens every
    * band and the regression becomes in-band and invisible from the next
    * round on (the one-round ratchet). */
  val ControlSaneLo = 0.8
  val ControlSaneHi = 1.25

  /** Whether this run's medians may be appended to BENCH_HISTORY.json.
    * None = append; Some(reason) = quarantine. Runs with UNRESOLVED
    * regression-class verdicts are quarantined too: appending a genuinely
    * regressed median would ratchet its own band outward and launder the
    * regression into the envelope — and so are runs whose AGGREGATE exits
    * its anchor band ([[aggregateCheck]]): per-query envelopes structurally
    * absorb a fleet-wide ~1.15×/round creep (observed +6.6% median
    * r11→r12 at control 1.006, adjudicated box tide only by judge
    * inspection — VERDICT r12 #3), so the aggregate gets its own band and
    * its own quarantine. */
  def historyAppendDecision(control: Double, flags: Seq[Flag],
                            aggregate: Option[AggregateCheck] = None)
      : Option[String] = {
    val unresolved = flags.count(f =>
      f.verdict == "regression" || f.verdict == "needs-subset-confirm")
    if (control < ControlSaneLo || control > ControlSaneHi)
      Some(s"control_ratio $control outside [$ControlSaneLo, $ControlSaneHi] " +
        "— broad box drift or a uniform code regression; confirm on a " +
        "quiet box before trusting this run's medians")
    else if (unresolved > 0)
      Some(s"$unresolved unresolved regression-class flag(s) — appending " +
        "their medians would widen their own bands (one-round ratchet)")
    else aggregate.filter(_.alert).map(a =>
      f"aggregate median ${a.now}%.3f outside its anchor band " +
        f"[${a.lo}%.3f, ${a.hi}%.3f] (control-adjusted ${a.adjusted}%.3f) " +
        "— fleet-wide creep that per-query envelopes absorb; confirm on a " +
        "quiet box before these medians may ratchet the history")
  }

  /** Per-round AGGREGATE medians reconstructed from the committed
    * per-query history: round k-from-latest's aggregate = the median over
    * queries of their k-th-from-last recorded median. Histories have
    * different lengths (queries enter across rounds), so alignment is
    * from the END, and an offset only yields an aggregate when at least
    * half the queries have a point there (early sparse rounds are not a
    * representative fleet median). Latest first. */
  def aggregateMedians(history: Map[String, Seq[Double]]): Seq[Double] = {
    if (history.isEmpty) return Nil
    val maxLen = history.values.map(_.length).max
    (0 until maxLen).flatMap { k =>
      val vals = history.values.toSeq.collect {
        case h if h.length > k => h(h.length - 1 - k)
      }
      if (vals.length * 2 >= history.size) Some(median(vals)) else None
    }
  }

  /** Aggregate-anchor tolerance. Deliberately TIGHTER than the per-query
    * ×1.35 envelope: the fleet median is a 300+-sample statistic whose
    * same-code run-to-run spread is a few percent where single queries
    * swing ±30%, and 1.15 is exactly the per-round creep rate the r12
    * verdict observed slipping through per-query bands. */
  val AggregateTol: Double = 1.15

  case class AggregateCheck(now: Double, adjusted: Double,
                            lo: Double, hi: Double) {
    /** The RAW aggregate adjudicates the append (a uniform creep is
      * indistinguishable from box drift in-run — control-deflating it
      * here would absorb exactly the ratchet this check exists to stop);
      * `adjusted` is reported for the human/subset adjudication. */
    def alert: Boolean = now < lo || now > hi
  }

  /** The run's aggregate vs the committed anchor band
    * [min/tol, max·tol] over the per-round aggregate medians. None when
    * the run covers less than half the history's queries (subset modes —
    * a 4-query aggregate is not comparable to the fleet median) or the
    * history is too shallow (< 2 rounds). */
  def aggregateCheck(history: Map[String, Seq[Double]],
                     now: Map[String, Double],
                     names: Seq[String], control: Double)
      : Option[AggregateCheck] = {
    val covered = names.filter(n => history.contains(n) &&
      now.getOrElse(n, 0.0) > 0.0)
    if (history.isEmpty || covered.length * 2 < history.size) return None
    val anchors = aggregateMedians(history)
    if (anchors.length < 2) return None
    val agg = median(covered.map(now))
    def r3(x: Double) = math.rint(x * 1000) / 1000
    Some(AggregateCheck(r3(agg), r3(agg / math.max(control, 1e-9)),
      r3(anchors.min / AggregateTol), r3(anchors.max * AggregateTol)))
  }

  /** The one-paste cross-run confirmation for regression-class flags (the
    * r11 q337 lesson: in-run re-times run on the same degraded box stretch
    * and can re-measure the artifact — only a SEPARATE run adjudicates an
    * extreme flag). Controls = the two untouched checked queries with the
    * tightest history bands above 0.2 s: if the suspects re-measure at the
    * controls' inflation, verdict box-drift. */
  def confirmCmd(suspects: Seq[String], checked: Seq[String],
                 flagged: Set[String], history: Map[String, Seq[Double]],
                 now: Map[String, Double], sfDir: String): String = {
    val controls = checked.filterNot(flagged)
      .filter(n => now.getOrElse(n, 0.0) > 0.2)
      .sortBy { n =>
        val h = history.getOrElse(n, Nil)
        val spread = if (h.length >= 2 && h.min > 0) h.max / h.min
                     else Double.MaxValue
        (spread, n)
      }
      .take(2)
    s"SPARK_GRAFT_SF_DIR=$sfDir SPARK_GRAFT_BENCH_ONLY=" +
      (suspects ++ controls).mkString(",") + " sbt 'runMain graft.Bench'"
  }

  /** Parse the `{"name": [m1, m2, …], …}` per-query round-median history
    * Bench maintains in BENCH_HISTORY.json (committed; grows one entry
    * per round, capped at [[HistoryKeep]]). */
  def parseHistory(path: java.nio.file.Path): Map[String, Seq[Double]] =
    if (!java.nio.file.Files.isRegularFile(path)) Map.empty
    else {
      val re = """"([A-Za-z0-9_]+)"\s*:\s*\[([0-9.,eE+\s-]*)\]""".r
      val text = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      re.findAllMatchIn(text).map(m => m.group(1) ->
        m.group(2).split(",").map(_.trim).filter(_.nonEmpty)
          .map(_.toDouble).toSeq).toMap
    }

  /** Round medians kept per query in the history band. */
  val HistoryKeep: Int = 10

  /** Parse the `{"controls": [c1, c2, …]}` per-append control-ratio side
    * file (BENCH_HISTORY_CONTROLS.json — one entry per history append,
    * end-aligned with the history columns). Empty when absent: the file
    * was introduced in round 14, so earlier appends have no recorded
    * control. */
  def parseControls(path: java.nio.file.Path): Seq[Double] =
    if (!java.nio.file.Files.isRegularFile(path)) Nil
    else {
      val text = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      """"controls"\s*:\s*\[([0-9.,eE+\s-]*)\]""".r.findFirstMatchIn(text)
        .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty)
          .map(_.toDouble).toSeq)
        .getOrElse(Nil)
    }

  /** Per-query HISTORY band: with ≥2 recorded round medians the envelope
    * is [min/1.35, max·1.35] of the query's own history — a query that has
    * swung 2.3–5.8 s across same-code rounds (the heavy shingle/media
    * family does, on this box) is in-band anywhere inside its observed
    * range, while a stable query keeps a tight band. Fewer than 2 points
    * falls back to the fixed ×1.35 ratio envelope vs the prior round. */
  private def historyBand(history: Map[String, Seq[Double]],
                          name: String): Option[(Double, Double)] = {
    val h = history.getOrElse(name, Nil)
    if (h.length >= 2) Some((h.min / 1.35, h.max * 1.35)) else None
  }

  /** Drift adjudication vs a committed prior band — pure so the spec can
    * pin the classification. Envelope: per-query history band when ≥2
    * round medians exist ([[historyBand]] — the round-10 adjudicator
    * cried wolf on ten same-code heavy-tail queries precisely because a
    * fixed ×1.35 envelope cannot model per-query variance), else the
    * fixed ×1.35 ratio band vs the prior round. Either way an absolute
    * move ≤0.1 s never flags (sub-100 ms queries jitter multiplicatively
    * for free).
    *
    * Each flag carries a VERDICT (the untouched-control rule — never
    * adjudicate raw numbers on this box, it drifts +17–30% for hours at a
    * time): control = median now/prev ratio over the checked, NON-flagged
    * queries >0.2 s (code untouched between bands moves only with the
    * box). A flag whose measurement, deflated by the control, falls back
    * inside its envelope (or whose control-adjusted absolute move is
    * under 0.1 s) is `box-drift`; a residual move beyond it is a real
    * `regression` (or `improvement` when faster) and needs a bisect.
    *
    * Returns (checked count, control ratio, flags). */
  def adjudicate(prior: Map[String, Double], now: Map[String, Double],
                 names: Seq[String],
                 history: Map[String, Seq[Double]] = Map.empty)
      : (Int, Double, Seq[Flag]) = {
    val checked = names.filter(n => prior.contains(n) && now.getOrElse(n, 0.0) > 0.0)
    def outside(n: String, v: Double): Boolean = historyBand(history, n) match {
      case Some((lo, hi)) => (v > hi || v < lo) && math.abs(v - prior(n)) > 0.1
      case None =>
        val ratio = v / math.max(prior(n), 1e-9)
        (ratio > 1.35 || ratio < 1 / 1.35) && math.abs(v - prior(n)) > 0.1
    }
    val ratios = checked.map(n => n -> now(n) / math.max(prior(n), 1e-9)).toMap
    val flaggedNames = checked.filter(n => outside(n, now(n)))
    // Control pool: with a real population, ALL checked queries >0.2 s —
    // the median is robust to the few genuine regressions, and excluding
    // flagged queries would BIAS the box estimate exactly when the box
    // inflates broadly (mass flags → control from the unrepresentative
    // remainder → every flag mis-verdicts regression). Below 10 checked
    // queries a median over everything degenerates (a single flagged
    // query would deflate itself to 1.0), so the small-population rule
    // stays exclude-flagged.
    val pool = if (checked.length >= 10) checked
               else checked.filterNot(flaggedNames.toSet)
    val controlSet = pool.filter(n => now(n) > 0.2).map(ratios)
    val control = if (controlSet.isEmpty) 1.0 else median(controlSet)
    // band-edge tolerance: the control itself is a median ESTIMATE of the
    // box factor — when the box is visibly off nominal (|control-1| large)
    // the deflation carries that same uncertainty, so a deflated
    // measurement a few % past its band edge is measurement noise, not
    // signal (r11: four "regressions" 4–8% past their maxima under a
    // 1.135× control, all box state). Capped at 10%; a QUIET box keeps
    // the strict band.
    val tol = math.min(0.1, math.abs(control - 1.0))
    def r3(x: Double) = math.rint(x * 1000) / 1000
    val flagged = flaggedNames.map { n =>
      val adjusted = now(n) / control
      val band = historyBand(history, n)
      val inBandAdjusted = band match {
        case Some((lo, hi)) =>
          adjusted <= hi * (1 + tol) && adjusted >= lo / (1 + tol)
        case None =>
          val residual = ratios(n) / control
          residual <= 1.35 * (1 + tol) && residual >= 1 / (1.35 * (1 + tol))
      }
      val envHi = band.map(_._2).getOrElse(prior(n) * 1.35)
      val verdict =
        if (inBandAdjusted ||
            math.abs(now(n) - prior(n) * control) <= 0.1) "box-drift"
        // direction from the control-DEFLATED measurement, not the raw
        // ratio: relative to the box a surviving flag may have moved
        // opposite to its raw sign
        else if (band.exists(b => adjusted < b._1) ||
                 (band.isEmpty && ratios(n) / control < 1.0))
          "improvement"
        // a measurement PAST DOUBLE its envelope cannot be confirmed
        // in-run: the auto re-times run on the same box stretch that
        // produced it and can re-measure the artifact (r11: q337 flagged
        // at 13.7×, re-timed twice in-run, still 5.2 s — a clean subset
        // run read 0.343 s, dead in-band). Such flags need a SEPARATE-run
        // subset confirm before they count; BENCH_DELTAS carries the
        // exact command line.
        else if (now(n) > 2 * envHi) "needs-subset-confirm"
        else "regression"
      Flag(n, r3(prior(n)), r3(now(n)),
        math.rint(ratios(n) * 100) / 100, verdict)
    }
    (checked.length, math.rint(control * 1000) / 1000, flagged)
  }

  /** The BENCH_DELTAS.json body — shared by the live run and
    * [[readjudicate]] so both carry the same adjudication surface:
    * verdicts, the control-sanity alert, the history-append decision, and
    * the one-paste subset-confirm command for regression-class flags. */
  private[graft] def deltasJson(checked: Int, control: Double,
      flagged: Seq[Flag], history: Map[String, Seq[Double]],
      prior: Map[String, Double], now: Map[String, Double],
      sfDir: String, aggregate: Option[AggregateCheck] = None): String = {
    val flaggedJson = flagged.map { f =>
      s"""    {"query":"${f.name}","prev":${f.prev},"now":${f.now},"ratio":${f.ratio},"verdict":"${f.verdict}"}"""
    }.mkString("[\n", ",\n", "\n  ]")
    val suspects = flagged.filter(f =>
      f.verdict == "regression" || f.verdict == "needs-subset-confirm")
      .map(_.name)
    val checkedNames = now.keys.toSeq.sorted.filter(prior.contains)
    val cmd =
      if (suspects.isEmpty) ""
      else confirmCmd(suspects, checkedNames, flagged.map(_.name).toSet,
        history, now, sfDir)
    val alert = control < ControlSaneLo || control > ControlSaneHi
    val append = historyAppendDecision(control, flagged, aggregate)
      .fold("appended")(r => s"quarantined: $r")
    val aggJson = aggregate.fold("null")(a =>
      s"""{"now": ${a.now}, "control_adjusted": ${a.adjusted}, "band": [${a.lo}, ${a.hi}], "alert": ${a.alert}}""")
    s"""{\n  "envelope": "per-query history band [min/1.35, max*1.35] of committed BENCH_HISTORY.json round medians (>=2 points), else fixed x1.35 vs prior; |now-prev| <= 0.1s never flags",\n  "adjudication": "verdict per flag via the untouched-control rule: control_ratio = median now/prev of checked queries >0.2s (all of them at population size, non-flagged below 10); box-drift when the control-deflated measurement re-enters its band widened by min(10%, |control-1|) (or the control-adjusted move is <0.1s); past DOUBLE the envelope the verdict is needs-subset-confirm (in-run re-times share the box state and cannot confirm an extreme flag — run confirm_cmd in a separate process); else regression/improvement; regressions are auto re-timed twice before the verdict stands",\n  "aggregate_anchor": "RAW fleet median vs [min/$AggregateTol, max*$AggregateTol] of the per-round aggregate medians reconstructed from BENCH_HISTORY.json (end-aligned, >=half-population offsets only); an alert quarantines the history append — per-query envelopes absorb fleet-wide creep, this band owns it (r12 verdict #3)",\n  "aggregate": $aggJson,\n  "history_queries": ${history.size},\n  "prior_queries": ${prior.size},\n  "checked": $checked,\n  "control_ratio": $control,\n  "control_alert": $alert,\n  "history_append": "$append",\n  "confirm_cmd": "$cmd",\n  "flagged": ${if (flagged.isEmpty) "[]" else flaggedJson}\n}\n"""
  }

  /** Offline re-adjudication of an existing bench run through the
    * PRODUCTION [[adjudicate]] — for refreshing BENCH_DELTAS.json after an
    * adjudicator fix without paying a full re-run (the measured medians in
    * BENCH_FULL.json are unchanged facts; only their classification moved).
    * Usage: `runMain graft.BenchReadjudicate <priorFull> [fullPath] [histPath]`
    * — `priorFull` is the PRIOR round's BENCH_FULL (e.g. extracted from
    * git), the others default to the working-tree artifacts. */
  private[graft] def readjudicate(priorPath: String, fullPath: String,
                                  histPath: String): String = {
    val prior = parsePriorFull(java.nio.file.Paths.get(priorPath))
    val now = parsePriorFull(java.nio.file.Paths.get(fullPath))
    val history = parseHistory(java.nio.file.Paths.get(histPath))
    val names = now.keys.toSeq.sorted
    val (checked, control, flagged) = adjudicate(prior, now, names, history)
    deltasJson(checked, control, flagged, history, prior, now,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
      aggregateCheck(history, now, names, control))
  }

  /** The corpus-shingle family: the bench's heavy tail (>2 s at sf0.1, all
    * re-deriving shingles from the same documents relation). Heavy queries
    * get median-of-5 instead of median-of-3 — same-code rounds have shown
    * ±30% single-pass swings exactly here — and this is the family the
    * shared-scan experiment re-times against one cached base relation. */
  val shingleFamily: Seq[String] = Seq(
    "q20_minhash_lsh", "q21_jaccard_pairs", "q26_fingerprint",
    "q64_near_dup_lsh", "q143_minhash_calibration", "q266_greedy_coverage",
    "q267_simhash_recall", "q271_heaps_fit", "q273_good_turing",
    "q286_distinct_ngrams")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val heavyReps = math.max(reps, sys.env.getOrElse("SPARK_GRAFT_BENCH_HEAVY_REPS", "5").toInt)
    val sharedMode = sys.env.get("SPARK_GRAFT_BENCH_SHARED").contains("1")
    val spark = graft.util.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Logs.quietKBoundedWindowWarnings()

    val outDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", ".")
    // Subset mode (SPARK_GRAFT_BENCH_ONLY=q20_minhash_lsh,q64_...): time just
    // the named queries while iterating on an operator. Artifacts divert to
    // BENCH_SUBSET.json so a partial run can never clobber the committed
    // full-run band (BENCH_FULL.json) or its drift adjudication.
    val onlySubset: Option[Set[String]] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Prior per-query medians (committed BENCH_FULL.json) — read BEFORE the
    // run overwrites the file. This is the historical band for the drift
    // check; a missing file (first run) just disables adjudication.
    val prior = parsePriorFull(java.nio.file.Paths.get(outDir, "BENCH_FULL.json"))
    // Per-query round-median history (committed BENCH_HISTORY.json): the
    // variance-aware envelope for the drift check — also read BEFORE this
    // run appends to it.
    val history = parseHistory(java.nio.file.Paths.get(outDir, "BENCH_HISTORY.json"))

    // Warm up JIT/codegen/parquet-reader paths so measured queries aren't
    // paying one-time JVM cost (a cluster is long-warm). Cold cost is
    // dominated by Janino compilation + JIT of each query's generated code,
    // which is data-size-independent — so run EVERY query once at sf0.001:
    // tiny inputs buy the same warm code the sf0.1 pass then reuses.
    val warmDir = new java.io.File(new java.io.File(sfDir).getParent, "sf0.001")
    val warmPath = if (warmDir.isDirectory) warmDir.getPath else sfDir
    if (warmPath == sfDir)
      System.err.println(s"[bench] WARNING: no sf0.001 sibling dir — warming at " +
        s"full measurement scale $sfDir (bench wall time roughly doubles)")
    val names = {
      val all = SparkEntry.queries.keys.toSeq.sorted
      onlySubset.fold(all)(s => all.filter(s))
    }
    names.foreach { q =>
      try SparkEntry.queries(q)(spark, warmPath).count()
      catch { case _: Throwable => }
    }
    spark.sharedState.cacheManager.clearCache()

    // Median-of-N per query: single-shot timings on a shared box are
    // contaminated by GC pauses, page-cache state and sibling-process
    // contention (round-2's phantom 59 s q47 was exactly this) — the
    // per-query median is stable run-to-run within ~10%. Repetitions are
    // INTERLEAVED (full pass 1, then pass 2, ...) so a transient system
    // stall contaminates one pass, not all reps of one query. The shingle
    // family gets `heavyReps` (extra late passes): its multi-second queries
    // have shown ±30% same-code swings that median-of-3 can't adjudicate.
    val targetReps: Map[String, Int] =
      names.map(n => n -> (if (shingleFamily.contains(n)) heavyReps else reps)).toMap
    val maxReps = targetReps.values.max
    val samples = scala.collection.mutable.Map
      .empty[String, List[Double]].withDefaultValue(Nil)

    def r3(x: Double) = math.rint(x * 1000) / 1000
    // Keep the stdout JSON line SMALL (the driver tails stdout): summary
    // stats over ALL queries plus per-query medians for a headline subset
    // only — the production-path flagships (IVF/LSH, search, dedup).
    val headline = Seq(
      "q01_pruned_scan", "q03_join_multiway", "q06_topk_orders",
      "q15_knn_cosine", "q20_minhash_lsh", "q47_domain_search",
      "q61_ann_rule", "q62_bm25", "q64_near_dup_lsh", "q66_skew_join",
      "q81_bfs_distances", "q93_maxsim", "q98_ivf_multiprobe",
      "q115_fused_search",
      // the maintained-serving family: probe-a-standing-index latencies
      // next to their recompute baselines above
      "q334_maintained_lsh_probe", "q341_point_probe",
      "q342_ivf_point_probe", "q343_maintained_verified_pairs",
      "q344_point_verified_probe", "q347_live_session_survivor_probe")
    def writeFile(name: String, content: String): Unit = {
      val p = java.nio.file.Paths.get(outDir, name)
      java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    }

    // Drift adjudication vs the committed prior band (see [[adjudicate]]).
    def driftReport(): (Int, Double, Seq[Flag]) =
      adjudicate(prior, names.map(n => n -> median(samples(n))).toMap, names,
        history)
    def summaryLine(repsDone: Int): String = {
      val results = names.map(n => n -> median(samples(n)))
      val byName = results.toMap
      val qs = headline.flatMap(q => byName.get(q).map(v => s"\"$q\":${r3(v)}"))
        .mkString("{", ",", "}")
      val medians = results.map(_._2)
      val (checked, control, flagged) = driftReport()
      val nReg = flagged.count(_.verdict == "regression")
      val drift = s"""{"checked":$checked,"flagged":${flagged.length},"control_ratio":$control,"regressions":$nReg}"""
      s"""{"metric":"total","value":${r3(medians.sum)},"unit":"sec","n":${medians.length},"reps":$repsDone,"median":${r3(median(medians))},"drift":$drift,"queries":$qs,"sf":"$sfDir"}"""
    }
    // The durable artifacts: the SAME line goes to BENCH.json in the repo
    // root (plus a full per-query breakdown in BENCH_FULL.json and the
    // drift adjudication in BENCH_DELTAS.json) so the driver never depends
    // on stdout-tail parsing. Written AFTER EVERY COMPLETED PASS, not once
    // at the end: a run killed by a wall-clock cap still leaves a real
    // artifact from its finished passes.
    def writeArtifacts(repsDone: Int): Unit =
      try if (onlySubset.isDefined) {
        val full = names.map(n => s"""  "$n": ${r3(median(samples(n)))}""")
          .mkString("{\n", ",\n", "\n}\n")
        writeFile("BENCH_SUBSET.json", full)
      } else {
        writeFile("BENCH.json", summaryLine(repsDone) + "\n")
        val full = names.map(n => s"""  "$n": ${r3(median(samples(n)))}""")
          .mkString("{\n", ",\n", "\n}\n")
        writeFile("BENCH_FULL.json", full)
        val (checked, control, flagged) = driftReport()
        val nowMap = names.map(n => n -> median(samples(n))).toMap
        writeFile("BENCH_DELTAS.json", deltasJson(checked, control, flagged,
          history, prior, nowMap, sfDir,
          aggregateCheck(history, nowMap, names, control)))
      } catch {
        case e: Throwable => System.err.println(s"[bench] file write failed: $e")
      }

    def timeOnce(name: String): Unit = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // Drop this query's persisted intermediates before the next one
      // runs: accumulated caches would otherwise make late queries pay
      // the GC bill for the early ones.
      spark.sharedState.cacheManager.clearCache()
      samples(name) = dt :: samples(name)
    }
    for (rep <- 1 to maxReps) {
      for (name <- names if rep <= targetReps(name)) timeOnce(name)
      writeArtifacts(rep)
    }

    if (onlySubset.isEmpty) {
      // Auto re-time (the manual q49 protocol, automated): a flag that
      // verdicts "regression" gets two extra timed passes before the
      // verdict stands — the heavy tail's single-pass swings median out
      // with more samples; a real regression survives them. Artifacts are
      // rewritten from the enlarged sample sets.
      val suspects = driftReport()._3.filter(_.verdict == "regression")
        .map(_.name)
      if (suspects.nonEmpty) {
        System.err.println(s"[bench] re-timing ${suspects.length} regression " +
          s"flag(s): ${suspects.mkString(", ")}")
        for (_ <- 1 to 2; name <- suspects) timeOnce(name)
        writeArtifacts(maxReps)
      }
      // Append this run's medians to the committed per-query history band
      // (the envelope future rounds adjudicate against), capped at the
      // last HistoryKeep rounds — UNLESS the run is quarantined: a run
      // with unresolved regression-class flags or an out-of-band control
      // would widen the very bands that should catch it next round
      // (ADVICE r11's one-round ratchet).
      val (_, finalControl, finalFlags) = driftReport()
      val finalNow = names.map(n => n -> median(samples(n))).toMap
      historyAppendDecision(finalControl, finalFlags,
        aggregateCheck(history, finalNow, names, finalControl)) match {
        case Some(reason) =>
          System.err.println(s"[bench] history append QUARANTINED: $reason")
        case None =>
          val histJson = names.map { n =>
            val h = (history.getOrElse(n, Nil) :+ median(samples(n)))
              .takeRight(HistoryKeep)
            s"""  "$n": [${h.map(r3).mkString(", ")}]"""
          }.mkString("{\n", ",\n", "\n}\n")
          writeFile("BENCH_HISTORY.json", histJson)
          // r13 verdict #8: record each appended round's control ratio in a
          // lockstep side file (END-aligned with the history columns, same
          // HistoryKeep cap) so cross-round control-adjusted claims are
          // computable from committed artifacts instead of hand-derived.
          // Separate file, not a reserved history key: parseHistory's
          // consumers (bands, aggregate anchor) must keep seeing queries
          // only. Additions-only; no band changes.
          val controls = (parseControls(
            java.nio.file.Paths.get(outDir, "BENCH_HISTORY_CONTROLS.json"))
            :+ finalControl).takeRight(HistoryKeep)
          writeFile("BENCH_HISTORY_CONTROLS.json",
            s"""{\n  "controls": [${controls.map(r3).mkString(", ")}]\n}\n""")
      }
    }

    // Shared-scan experiment (opt-in, SPARK_GRAFT_BENCH_SHARED=1): re-time
    // the shingle family with the base tables cached once via the
    // Tables.load seam — the "materialize the hot relation once" curve for
    // BENCH_NOTES, vs the cold per-query re-read measured above. Runs
    // AFTER the main loop so the primary artifact is untouched; results go
    // to BENCH_SHARED.json, never the stdout contract line.
    if (sharedMode) {
      val cold = names.map(n => n -> median(samples(n))).toMap
      Tables.enableSharedScan()
      shingleFamily.foreach { q =>
        try SparkEntry.queries(q)(spark, sfDir).count()
        catch { case _: Throwable => }
      }
      val shared = scala.collection.mutable.Map
        .empty[String, List[Double]].withDefaultValue(Nil)
      for (_ <- 1 to reps; q <- shingleFamily if SparkEntry.queries.contains(q)) {
        val t0 = System.nanoTime()
        try SparkEntry.queries(q)(spark, sfDir).count()
        catch { case _: Throwable => }
        shared(q) = (System.nanoTime() - t0) / 1e9 :: shared(q)
        // NOTE: no clearCache here — keeping the shared base cache warm is
        // the whole experiment.
      }
      Tables.disableSharedScan()
      val lines = shingleFamily.map { q =>
        s"""  "$q": {"cold": ${r3(cold.getOrElse(q, 0.0))}, "shared": ${r3(median(shared(q)))}}"""
      }.mkString("{\n", ",\n", "\n}\n")
      writeFile("BENCH_SHARED.json", lines)
      System.err.println("[bench] shared-scan results written to BENCH_SHARED.json")
    }

    // Materialized-signature experiment (opt-in,
    // SPARK_GRAFT_BENCH_MATERIALIZED=1): the shared-scan experiment showed
    // base-table caching buys the shingle family only 3–19% because the
    // cost is the DERIVED relation — so measure the other strategy: build
    // the MinHash band table once (what a corpus snapshot would persist,
    // q20's exact parameters), then time the q20 tail (banded candidates +
    // exact-Jaccard verify over candidate docs) against the standing table.
    // This is the amortization a production dedup pipeline actually runs:
    // build once per snapshot, query many times (and the delta path,
    // q194/appendLshBands, maintains the same table incrementally).
    if (sys.env.get("SPARK_GRAFT_BENCH_MATERIALIZED").contains("1")) {
      import org.apache.spark.sql.functions.{broadcast, col}
      import graft.ops.Dedup
      val docs = Tables.documents(spark, sfDir)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-bench-mat").toString
      val bandsPath = tmp + "/bands"
      def secs(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val tBuild = secs {
        Dedup.bands(Dedup.minhashSignatures(
            Dedup.shingleRaw(docs, "doc_id", "text", 3), 16), 16, 4)
          .write.mode("overwrite").parquet(bandsPath)
      }
      def tail(): Unit = { // minhashLsh's verification, from the standing table
        val cand = Dedup.candidatePairs(spark.read.parquet(bandsPath)).persist()
        val candDocs = cand.select(col("doc_a").as("doc_id"))
          .union(cand.select(col("doc_b").as("doc_id"))).distinct()
        val candTexts = docs.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        val sh = Dedup.shingleSets(candTexts, "doc_id", "text", 3).persist()
        Dedup.jaccardVerify(cand, sh, 0.5).count()
        cand.unpersist(); sh.unpersist()
      }
      val tTail = median((1 to reps).map(_ => secs(tail())))
      val cold = { // main-loop median, or time the full pipeline directly
        val m = median(samples("q20_minhash_lsh"))
        if (m > 0) m
        else median((1 to reps).map(_ => secs {
          Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5).count()
        }))
      }
      writeFile("BENCH_MATERIALIZED.json",
        s"""{\n  "q20_cold_full_pipeline": ${r3(cold)},\n  "band_table_build_once": ${r3(tBuild)},\n  "q20_tail_vs_standing_table": ${r3(tTail)},\n  "tail_speedup_vs_cold": ${r3(cold / math.max(tTail, 1e-9))}\n}\n""")
      System.err.println("[bench] materialized results written to BENCH_MATERIALIZED.json")
    }

    println(summaryLine(maxReps))
    System.out.flush()
    spark.stop()
  }
}
