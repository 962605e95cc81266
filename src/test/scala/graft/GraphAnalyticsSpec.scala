package graft

import graft.ops.GraphAnalytics

class GraphAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: two chains and an isolate pair") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),    // comp 1
      (10L, 11L),                      // comp 10
      (20L, 21L), (21L, 22L)           // comp 20
    ).toDF("src", "dst")
    val cc = GraphAnalytics.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components converge on a cycle") {
    val edges = Seq((5L, 6L), (6L, 7L), (7L, 5L)).toDF("src", "dst")
    val cc = GraphAnalytics.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet === Set(5L))
  }

  test("star CC == min-label CC == union-find on a random graph, all paths") {
    // long chains (worst case for min-label), a big cycle, isolates via
    // self-referencing pairs, and random cross links — deterministic seed
    val rnd = new scala.util.Random(42)
    val chain = (0L until 40L).map(i => (i, i + 1))                   // diameter 40
    val cycle = (1000L until 1100L).map(i => (i, 1000L + (i - 999L) % 100L))
    val random = (1 to 200).map(_ => (2000L + rnd.nextInt(150), 2000L + rnd.nextInt(150)))
    val edges = (chain ++ cycle ++ random).toDF("src", "dst")

    val minLabel = GraphAnalytics.connectedComponentsMinLabel(edges, maxIter = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // force the distributed star path (threshold 0 disables union-find)
    val star = GraphAnalytics.connectedComponents(edges, smallGraphEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unionFind = GraphAnalytics.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(star === minLabel)
    assert(unionFind === minLabel)
    assert(star(40L) === 0L)    // chain collapsed to its min in O(log n) rounds
  }

  test("star CC: fixpoint reached exactly at round maxIter succeeds via the confirm round") {
    // chain 0-1-2: round 1 already yields the stable star {(1,0),(2,0)} but
    // that differs from the initial orientation, so with maxIter=1 the loop
    // exits "unconverged" and only the confirmation round proves the fixpoint
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val cc = GraphAnalytics.connectedComponents(edges, maxIter = 1, smallGraphEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("star CC: genuinely unconverged at maxIter fails loudly instead of emitting garbage") {
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      GraphAnalytics.connectedComponents(chain, maxIter = 1, smallGraphEdges = 0).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("pageRank: sink of a star graph outranks its sources") {
    val edges = Seq(("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"))
      .toDF("src", "dst")
    val pr = GraphAnalytics.pageRank(edges, iterations = 15)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr("hub") > pr("b"))
    assert(pr("hub") > pr("c"))
    assert(pr("a") > pr("b"))         // 'a' gets the hub's rank back
    // ranks are a probability-ish distribution: all positive
    assert(pr.values.forall(_ > 0))
  }

  test("dedupClusters picks min doc id as representative") {
    val pairs = Seq((3L, 7L), (7L, 9L), (20L, 30L)).toDF("doc_a", "doc_b")
    val out = GraphAnalytics.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(3L -> 3L, 7L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L))
  }

  test("triangleCounts: known triangles, direction/duplication/self-loop-proof") {
    // K4 on {1,2,3,4} (4 triangles, 3 per vertex) + a pendant edge + noise:
    // reversed duplicates and a self loop must not change counts
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L),                    // pendant — 5 is in no triangle
      (2L, 1L), (3L, 1L),          // reversed duplicates
      (3L, 3L)                     // self loop
    ).toDF("src", "dst")
    val out = GraphAnalytics.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts matches brute force on a random graph (skewed degrees)") {
    val rnd = new scala.util.Random(7)
    // hub-heavy: vertex 0 joins many edges -> exercises the degree orientation
    val raw = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)) ++
      (1 to 60).map(_ => (0L, rnd.nextInt(40).toLong))
    val edges = raw.toDF("src", "dst")
    val out = GraphAnalytics.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // brute force over the canonical undirected edge set
    val canon = raw.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val verts = canon.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- verts; j <- verts if j > i; k <- verts if k > j
      if canon((i, j)) && canon((j, k)) && canon((i, k))
    } { brute(i) += 1; brute(j) += 1; brute(k) += 1 }
    assert(out === brute.toMap)
  }

  test("bfsDistances: first-visit depths, unreachable absent, depth capped") {
    //  0 -> 1 -> 2 -> 3 -> 4 ; 0 -> 2 (shortcut) ; 9 isolated target-only
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 2L), (8L, 9L))
      .toDF("src", "dst")
    val sources = Seq(0L).toDF("id")
    val out = GraphAnalytics.bfsDistances(edges, sources, maxDepth = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 2, 4L -> 3))

    val capped = GraphAnalytics.bfsDistances(edges, sources, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped === Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 2))
  }

  test("kCore: K5 survives k=4, appendages peel away (cascading)") {
    // K5 on {1..5} + a chain 5-10-11-12 + a pendant triangle fan 20-21-22
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val extras = Seq((5L, 10L), (10L, 11L), (11L, 12L), (20L, 21L), (21L, 22L), (20L, 22L))
    val edges = (k5 ++ extras).toDF("src", "dst")
    val core4 = GraphAnalytics.kCore(edges, 4).as[Long].collect().toSet
    assert(core4 === Set(1L, 2L, 3L, 4L, 5L))
    // k=2: chain peels completely (cascade 12→11→10), triangle survives
    val core2 = GraphAnalytics.kCore(edges, 2).as[Long].collect().toSet
    assert(core2 === Set(1L, 2L, 3L, 4L, 5L, 20L, 21L, 22L))
    // k=6 exceeds any degree: empty core
    assert(GraphAnalytics.kCore(edges, 6).count() === 0L)
  }

  test("kCore: truncated peel fails loudly instead of returning a superset") {
    // a path graph peels only its 2 endpoints per round — maxIter=2 cannot
    // finish a 30-vertex path at k=2, and the survivors are NOT a 2-core
    val path = (0L until 30L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      GraphAnalytics.kCore(path, k = 2, maxIter = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // with enough rounds the same graph converges (to the empty core)
    assert(GraphAnalytics.kCore(path, k = 2, maxIter = 30).count() === 0L)
  }

  test("linkPrediction: only non-adjacent pairs, correct CN count and jaccard") {
    // 1–2, 2–3, 1–4: candidates are (1,3) via 2 and (2,4) via 1, both
    // jaccard 1/(2+1-1) = 0.5; adjacent pairs must not appear
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L)).toDF("src", "dst")
    val out = GraphAnalytics.linkPrediction(edges, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 3L, 1L, 0.5), (2L, 4L, 1L, 0.5)))
  }

  test("randomWalks: edge-respecting, lock-step, reproducible") {
    val rnd = new scala.util.Random(5)
    val pairs = (1 to 150).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2).distinct
    val edges = pairs.toDF("src", "dst")
    val starts = Seq(0L, 1L, 2L).toDF("id")
    def run() = GraphAnalytics.randomWalks(edges, starts, steps = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val out = run()
    val sym = (pairs ++ pairs.map(_.swap)).toSet
    // every walk starts at its start node and has contiguous steps
    out.groupBy(_._1).foreach { case (w, rows) =>
      val byStep = rows.sortBy(_._2)
      assert(byStep.head === ((w, 0, w)))
      assert(byStep.map(_._2).toSeq === byStep.indices)
      // each hop follows an existing (symmetrized) edge
      byStep.sliding(2).foreach {
        case Array(a, b) => assert(sym.contains((a._3, b._3)),
          s"walk $w hopped ${a._3}->${b._3} without an edge")
        case _ =>
      }
    }
    // reproducible: identical corpus on a second run
    assert(run().toSeq === out.toSeq)
  }

  test("pageRank exactFold: agrees with plain sum, conserves ≤1 mass, ranks hubs") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 300).map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(p => p._1 != p._2).toDF("src", "dst")
    val folded = GraphAnalytics.pageRank(edges, iterations = 6, exactFold = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val summed = GraphAnalytics.pageRank(edges, iterations = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(folded.keySet === summed.keySet)
    // same math, different addition order — equal to ~ulp accumulation
    folded.foreach { case (id, r) => assert(math.abs(r - summed(id)) < 1e-12) }
    // total mass ≤ 1 (dangling leakage only) and every rank ≥ base
    val total = folded.values.sum
    assert(total > 0.5 && total <= 1.0 + 1e-9)
    assert(folded.values.forall(_ >= (1 - 0.85) / folded.size - 1e-12))
  }

  test("pageRank exactFold gate: driver path == forced-distributed path, bit-exact") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 400).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2).toDF("src", "dst")
    val restart = Seq((3L, 0.5), (7L, 0.5)).toDF("id", "r")
    for (r <- Seq(None, Some(restart))) {
      val gated = GraphAnalytics.pageRank(edges, iterations = 5,
          exactFold = true, restart = r)
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      val dist = GraphAnalytics.pageRank(edges, iterations = 5,
          exactFold = true, restart = r, smallGraphEdges = 0)
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
      assert(gated.keySet === dist.keySet)
      // the fold order is fully specified on both paths: BIT-equal, no ulp
      gated.foreach { case (id, rank) => assert(rank === dist(id), s"vertex $id") }
    }
  }

  test("small-graph gates: driver paths equal forced-distributed paths exactly") {
    val rnd = new scala.util.Random(31)
    val edges = (1 to 500).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2).toDF("src", "dst")
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet

    assert(rows(GraphAnalytics.labelPropagation(edges, rounds = 4)) ===
      rows(GraphAnalytics.labelPropagation(edges, rounds = 4, smallGraphEdges = 0)))

    val srcs = Seq(1L, 5L).toDF("id")
    assert(rows(GraphAnalytics.bfsDistances(edges, srcs, maxDepth = 6)) ===
      rows(GraphAnalytics.bfsDistances(edges, srcs, maxDepth = 6, smallGraphEdges = 0)))

    val seeds = Seq((0L, 1L), (1L, 5L), (2L, 9L)).toDF("seed", "id")
    assert(rows(GraphAnalytics.bfsDistancesMulti(edges, seeds, maxDepth = 6)) ===
      rows(GraphAnalytics.bfsDistancesMulti(edges, seeds, maxDepth = 6, smallGraphEdges = 0)))

    assert(rows(GraphAnalytics.kCore(edges, k = 3)) ===
      rows(GraphAnalytics.kCore(edges, k = 3, smallGraphEdges = 0)))

    assert(rows(GraphAnalytics.triangleCounts(edges)) ===
      rows(GraphAnalytics.triangleCounts(edges, smallGraphEdges = 0)))

    val succ = (0L to 120L).map(v => (v, (v * v + 1) % 121)).toDF("id", "next")
    assert(rows(GraphAnalytics.functionalScc(succ)) ===
      rows(GraphAnalytics.functionalScc(succ, smallGraphEdges = 0)))

    val starts = Seq(1L, 2L, 3L, 77L).toDF("id")
    assert(rows(GraphAnalytics.randomWalks(edges, starts, steps = 4)) ===
      rows(GraphAnalytics.randomWalks(edges, starts, steps = 4, smallGraphEdges = 0)))
  }

  test("labelPropagation: two bridged cliques keep separate communities") {
    // two 4-cliques {1..4} and {5..8} joined by bridge 4–5: within-clique
    // majorities dominate the single bridge vote, so after 4 synchronous
    // rounds each clique carries its own min-id label
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(1L to 4L) ++ clique(5L to 8L) ++ Seq((4L, 5L)))
      .toDF("src", "dst")
    val out = GraphAnalytics.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).map(out).toSet === Set(1L))
    assert((5L to 8L).map(out).toSet === Set(5L))
  }

  test("modularity: bridged cliques score strongly positive; sums close") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(1L to 4L) ++ clique(5L to 8L) ++ Seq((4L, 5L)))
      .toDF("src", "dst")
    val labels = GraphAnalytics.labelPropagation(edges, rounds = 4)
    val out = GraphAnalytics.modularity(edges, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val m = 13.0 // 2 × C(4,2) + bridge
    // invariants: members cover the graph, Σ intra ≤ m (bridge is inter),
    // Σ degree_sum = 2m
    assert(out.map(_._2).sum === 8L)
    assert(out.map(_._3).sum === 12L) // all but the bridge edge
    assert(out.map(_._4).sum === 26L)
    // hand-computed Q_c for the {1..4} community: 6/13 − (13/26)² = 0.2115…
    val q1 = out.find(_._1 == 1L).get._5
    assert(math.abs(q1 - (6.0 / m - 0.25)) < 1e-12)
    // the 2-clique partition is strongly modular overall
    assert(out.map(_._5).sum > 0.4)
  }

  test("labelPropagation is schedule-free: matches a single-threaded sync model") {
    // reference model: same synchronous update computed serially on the
    // driver — the distributed rounds must agree exactly, any rounds count
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 120).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).distinct
    val sym = (pairs ++ pairs.map(_.swap)).distinct
    val verts = sym.flatMap(p => Seq(p._1, p._2)).distinct
    var model = verts.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      model = verts.map { v =>
        val votes = sym.filter(_._2 == v).map(e => model(e._1))
          .groupBy(identity).map { case (l, vs) => (l, vs.size) }
        v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val out = GraphAnalytics.labelPropagation(pairs.toDF("src", "dst"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === model)
  }

  test("bfsDistances: multi-source takes the nearer source") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 3L)).toDF("src", "dst")
    val sources = Seq(0L, 10L).toDF("id")
    val out = GraphAnalytics.bfsDistances(edges, sources, maxDepth = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(0L -> 0, 10L -> 0, 1L -> 1, 3L -> 1, 2L -> 2))
  }

  test("pageRank personalized: rank decays with distance from the seed; " +
    "plain run stays uniform") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val restart = Seq((0L, 1.0)).toDF("id", "r")
    val ppr = GraphAnalytics.pageRank(edges, iterations = 20,
        restart = Some(restart))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppr(0L) > ppr(1L) && ppr(1L) > ppr(2L) && ppr(2L) > ppr(3L),
      s"PPR must decay along the cycle from the seed: $ppr")
    val plain = GraphAnalytics.pageRank(edges, iterations = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain.values.map(v => math.abs(v - 0.25)).max < 1e-9,
      s"plain PageRank on a symmetric cycle must be uniform: $plain")
  }

  test("functionalScc: cycles become SCCs, tails and self-loops label " +
    "themselves") {
    // rho shapes: 3-cycle 0→1→2→0 with tail 4→3→0; self-loop 5→5 fed by 6;
    // 2-cycle 7↔8
    val succ = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L), (4L, 3L),
      (5L, 5L), (6L, 5L), (7L, 8L), (8L, 7L)
    ).toDF("id", "next")
    val out = GraphAnalytics.functionalScc(succ)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(
      0L -> 0L, 1L -> 0L, 2L -> 0L,        // the 3-cycle
      3L -> 3L, 4L -> 4L,                  // tail singletons
      5L -> 5L,                            // self-loop cycle
      6L -> 6L,                            // its tail
      7L -> 7L, 8L -> 7L))                 // the 2-cycle
  }
}
