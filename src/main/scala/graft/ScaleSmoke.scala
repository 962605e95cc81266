package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.GraphAnalytics

/** Scale smoke for the distributed connected-components path (not part of
  * `sbt test` — run manually: `sbt "runMain graft.ScaleSmoke [nRandomEdges]"`).
  *
  * Builds a graph no driver-side path could cheat through: 100 chains of
  * 1000 vertices (diameter 999 — the min-label worst case; the star
  * algorithm must collapse them in O(log n) alternations) plus a random
  * hash-generated component soup, then checks the two defining invariants
  * distributedly instead of against a second implementation:
  *   1. edge consistency — both endpoints of every edge share a component;
  *   2. label minimality — each component's label equals its min member id.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nRandom = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = graft.util.EngineConf.tuned(SparkSession.builder()).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Logs.quietKBoundedWindowWarnings()

    // 100 chains of length 1000: vertices [0, 100000), edge i→i+1 within a chain
    val chains = spark.range(0, 100000)
      .filter(col("id") % 1000 =!= 999)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    // random soup over vertices [1000000, 1200000)
    val random = spark.range(0, nRandom).select(
      (pmod(xxhash64(col("id")), lit(200000)) + 1000000L).as("src"),
      (pmod(xxhash64(col("id") * 7 + 13), lit(200000)) + 1000000L).as("dst"))
    val edges = chains.union(random)

    val t0 = System.nanoTime()
    val cc = GraphAnalytics.connectedComponents(edges, maxIter = 30,
      smallGraphEdges = 0).persist()
    val nVerts = cc.count()
    val secs = (System.nanoTime() - t0) / 1e9

    val lab = cc.select(col("id"), col("comp"))
    val badEdges = edges
      .join(lab.withColumnRenamed("id", "src").withColumnRenamed("comp", "c1"), "src")
      .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("comp", "c2"), "dst")
      .filter(col("c1") =!= col("c2")).count()
    val badLabels = cc.groupBy(col("comp")).agg(min(col("id")).as("mn"))
      .filter(col("comp") =!= col("mn")).count()
    val nComps = cc.select(col("comp")).distinct().count()
    val chainComps = cc.filter(col("id") < 100000)
      .select(col("comp")).distinct().count()

    println(f"[scale-smoke] vertices=$nVerts components=$nComps " +
      f"chainComponents=$chainComps ccSeconds=$secs%.1f " +
      f"edgeViolations=$badEdges labelViolations=$badLabels")
    assert(badEdges == 0, "edge endpoints in different components")
    assert(badLabels == 0, "component label is not the min member")
    assert(chainComps == 100, s"expected 100 chain components, got $chainComps")

    // ---- range join: bin-width invariance at 2M points × 200k intervals.
    // The bin width is a physical knob — it must NEVER change results.
    // Comparing two widths distributedly needs no second implementation.
    val base = lit(1700000000L)
    val points = spark.range(0, 2000000).select(
      col("id").as("point_id"),
      pmod(xxhash64(col("id")), lit(5000)).as("k"),
      timestamp_seconds(base + pmod(xxhash64(col("id") + 17), lit(2592000L))).as("ts"))
    val ivStart = pmod(xxhash64(col("id") * 31 + 7), lit(2592000L))
    val intervals = spark.range(0, 200000).select(
      col("id").as("iv_id"),
      pmod(xxhash64(col("id") + 3), lit(5000)).as("k"),
      timestamp_seconds(base + ivStart).as("w_start"),
      timestamp_seconds(base + ivStart + pmod(xxhash64(col("id") + 29), lit(7200L)) + 1).as("w_end"))
    val t1 = System.nanoTime()
    val narrow = graft.ops.Temporal.rangeJoin(points, "ts", intervals,
      "w_start", "w_end", binWidthSec = 600, keys = Seq("k")).count()
    val wide = graft.ops.Temporal.rangeJoin(points, "ts", intervals,
      "w_start", "w_end", binWidthSec = 3600, keys = Seq("k")).count()
    val rjSecs = (System.nanoTime() - t1) / 1e9
    println(f"[scale-smoke] rangeJoin matches=$narrow rjSeconds=$rjSecs%.1f")
    assert(narrow == wide, s"bin width changed results: $narrow vs $wide")
    assert(narrow > 0, "range join produced nothing — generator broken")

    // ---- scd2: versions must TILE each key's timeline (valid_to of
    // version i equals valid_from of version i+1; exactly one open
    // version per key) at 2M events × 100k keys.
    val changes = spark.range(0, 2000000).select(
      col("id").as("event_id"),
      pmod(xxhash64(col("id") * 13 + 5), lit(100000)).as("k"),
      timestamp_seconds(base + pmod(xxhash64(col("id") + 41), lit(10000000L))).as("ts"),
      pmod(xxhash64(col("id") * 3 + 11), lit(3)).cast("string").as("tier"))
    val t2 = System.nanoTime()
    val dim = graft.ops.Temporal.scd2(changes, "k", "ts", "event_id", Seq("tier")).persist()
    val nVersions = dim.count()
    val scdSecs = (System.nanoTime() - t2) / 1e9
    val wTile = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("valid_from"))
    val gaps = dim
      .withColumn("next_from", lead(col("valid_from"), 1).over(wTile))
      .filter((col("next_from").isNotNull && !(col("valid_to") <=> col("next_from"))) ||
        (col("next_from").isNull && col("valid_to").isNotNull))
      .count()
    val openPerKey = dim.filter(col("is_current")).groupBy(col("k"))
      .agg(count(lit(1)).as("n")).filter(col("n") =!= 1).count()
    val nKeys = dim.select(col("k")).distinct().count()
    println(f"[scale-smoke] scd2 versions=$nVersions keys=$nKeys " +
      f"scdSeconds=$scdSecs%.1f tilingViolations=$gaps badOpenCounts=$openPerKey")
    assert(gaps == 0, "scd2 versions do not tile the key timeline")
    assert(openPerKey == 0, "a key has != 1 open version")

    // ---- triangles: 200k disjoint K3s (analytically 200k triangles, every
    // vertex on exactly one) + 100k chain edges that close nothing. Also
    // exercises the degree orientation under duplication: each K3 edge is
    // emitted twice in opposite directions.
    val k3 = spark.range(0, 200000).select(col("id"))
    val triEdges = k3.select((col("id") * 3).as("src"), (col("id") * 3 + 1).as("dst"))
      .union(k3.select((col("id") * 3 + 1).as("src"), (col("id") * 3 + 2).as("dst")))
      .union(k3.select((col("id") * 3 + 2).as("src"), (col("id") * 3).as("dst")))
    val triNoise = spark.range(0, 100000)
      .select((col("id") + 10000000L).as("src"), (col("id") + 10000001L).as("dst"))
    val t3 = System.nanoTime()
    val tc = GraphAnalytics.triangleCounts(
      triEdges.union(triEdges.select(col("dst").as("src"), col("src").as("dst")))
        .union(triNoise)).persist()
    val triVerts = tc.count()
    val triBad = tc.filter(col("triangles") =!= 1).count()
    val triSecs = (System.nanoTime() - t3) / 1e9
    println(f"[scale-smoke] triangles verts=$triVerts bad=$triBad triSeconds=$triSecs%.1f")
    assert(triVerts == 600000, s"expected 600000 triangle vertices, got $triVerts")
    assert(triBad == 0, "a K3 vertex counted != 1 triangle")

    // ---- BFS: complete binary tree on [1, 2^18) via i→2i, i→2i+1.
    // dist(v) = floor(log2 v) analytically; frontier doubles every round
    // (wide-frontier stress, the opposite shape of the CC chain case).
    val tree = spark.range(1, 131072).select(col("id").as("src"), (col("id") * 2).as("dst"))
      .union(spark.range(1, 131072).select(col("id").as("src"), (col("id") * 2 + 1).as("dst")))
    val t4 = System.nanoTime()
    val dists = GraphAnalytics.bfsDistances(tree,
      spark.range(1).select(lit(1L).as("id")), maxDepth = 17,
      smallGraphEdges = 0).persist() // force the DISTRIBUTED path — this tier pins it
    val bfsN = dists.count()
    // floor(log2 v) computed EXACTLY as binary-digit count − 1 (a float
    // log2 can land at 2.9999… on exact powers of two and floor wrong)
    val bfsBad = dists
      .filter(col("dist") =!= (length(conv(col("id"), 10, 2)) - 1).cast("int")).count()
    val bfsSecs = (System.nanoTime() - t4) / 1e9
    println(f"[scale-smoke] bfs reached=$bfsN bad=$bfsBad bfsSeconds=$bfsSecs%.1f")
    assert(bfsN == 262143, s"expected 262143 reached vertices, got $bfsN")
    assert(bfsBad == 0, "bfs dist != floor(log2(id)) on the binary tree")

    // ---- bloom semi join: exactness at 10M fact rows × 10k dim keys, with
    // a deliberate int-vs-long key-type mismatch (the sketch-width trap).
    val factB = spark.range(0, 10000000).select(col("id").as("k"))
    val dimB = spark.range(0, 10000000, 1000)
      .select(col("id").cast("int").as("k"))
    val t5 = System.nanoTime()
    val bloomMatches = graft.ops.Pruning
      .bloomSemiJoin(factB, "k", dimB, "k", expectedItems = 20000L).count()
    val bloomSecs = (System.nanoTime() - t5) / 1e9
    println(f"[scale-smoke] bloomSemiJoin matches=$bloomMatches bloomSeconds=$bloomSecs%.1f")
    assert(bloomMatches == 10000, s"expected 10000 semi-join matches, got $bloomMatches")

    // ---- bounded top-k aggregator at 10M rows × 10 groups: the partial
    // aggregation must reduce each map partition to ≤ k rows per group and
    // the result must be the exact per-group maxima (score == id makes the
    // expected winners analytic).
    val t6 = System.nanoTime()
    val topkRows = spark.range(0, 10000000).select(
      (col("id") % 10).as("g"), col("id").cast("double").as("score"), col("id"))
    val top3 = graft.ops.TopK.topK(3)
    val got = topkRows.groupBy(col("g"))
      .agg(top3(col("score"), col("id")).as("top"))
      .select(col("g"), explode(col("top")).as("s"))
      .select(col("g"), col("s.id").as("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 10L).flatMap(g =>
      Seq(9999990L + g, 9999980L + g, 9999970L + g).map(g -> _)).toSet
    val topkSecs = (System.nanoTime() - t6) / 1e9
    println(f"[scale-smoke] topK groups=10 rows=10000000 topkSeconds=$topkSecs%.1f")
    assert(got == want, s"topK lost maxima: ${got.diff(want)} / ${want.diff(got)}")

    // ---- flagship ANN path: IVF probe cost must grow SUB-linearly while
    // the corpus grows 10×. Clustered synthetic corpus (64 true centers,
    // hash-noise around them, 16 dims); centroid count scales with the
    // corpus (32 → 192), so the probed slice (nProbe=8 clusters) stays
    // roughly flat while a full scan grows 10×. Also checks recall: the
    // probed top-1 must equal the exact full-scan top-1.
    def vecCorpus(n: Long): org.apache.spark.sql.DataFrame = {
      val center = col("id") % 64
      spark.range(0, n).select(col("id"),
        transform(sequence(lit(0), lit(15)), d =>
          ((pmod(xxhash64(center, d), lit(2001)) / lit(1000.0) - 1) +
            (pmod(xxhash64(col("id"), d, lit(7)), lit(2001)) / lit(1000.0) - 1) * 0.05)
            .cast("float")).as("embedding"))
    }
    val queryVec = vecCorpus(64).filter(col("id") === 7)   // center 7, tiny noise
      .select(col("embedding").as("qvec"))
    def probeStats(n: Long, nCentroids: Int): (Long, Long, Double, Double) = {
      val corpus = vecCorpus(n).localCheckpoint(true)      // time the SEARCH, not the generator
      val built = graft.engine.IvfIndex.build(corpus, "id", "embedding", nCentroids)
      // materialize the assignment INTO the probed index — index build is
      // offline; only the probe is the serving path being timed
      val idx = built.copy(assigned = built.assigned.localCheckpoint(true))
      val tp = System.nanoTime()
      val pruned = graft.engine.IvfIndex.prunedCorpus(idx, queryVec, nProbe = 8)
      val probedRows = pruned.count()
      val probeTop1 = graft.ops.Similarity.knnCosine(
        pruned, queryVec, "id", "embedding", k = 1, threshold = -1.0)
        .collect().head.getLong(0)
      val probeSecs = (System.nanoTime() - tp) / 1e9
      val tf = System.nanoTime()
      val exactTop1 = graft.ops.Similarity.knnCosine(
        corpus, queryVec, "id", "embedding", k = 1, threshold = -1.0)
        .collect().head.getLong(0)
      val fullSecs = (System.nanoTime() - tf) / 1e9
      assert(probeTop1 == exactTop1,
        s"IVF probe missed the true nearest neighbor: $probeTop1 vs $exactTop1")
      (probedRows, n, probeSecs, fullSecs)
    }
    val (probedS, nS, probeSecsS, fullSecsS) = probeStats(30000L, 32)
    val (probedL, nL, probeSecsL, fullSecsL) = probeStats(300000L, 192)
    println(f"[scale-smoke] ivf small: corpus=$nS probed=$probedS " +
      f"probeSeconds=$probeSecsS%.1f fullSeconds=$fullSecsS%.1f")
    println(f"[scale-smoke] ivf large: corpus=$nL probed=$probedL " +
      f"probeSeconds=$probeSecsL%.1f fullSeconds=$fullSecsL%.1f")
    // corpus ×10 but the probed slice must stay within ×3 (sub-linear scan)
    assert(probedL < 3 * probedS,
      s"IVF probe scan grew linearly: $probedS -> $probedL for 10x corpus")
    assert(probedL.toDouble / nL < 0.1,
      s"IVF probe reads ${probedL.toDouble / nL * 100}%% of the corpus")

    // ---- MinHash-LSH dedup: verified pairs must grow ~linearly with the
    // corpus (an all-pairs path would grow 100× for a 10× corpus). Docs are
    // 40 hash-generated tokens; every 100th doc gets a near-copy (one token
    // changed ⇒ shingle jaccard ≈ 0.85), so planted-pair recall is also
    // measurable.
    def docCorpus(n: Long): org.apache.spark.sql.DataFrame = {
      spark.range(0, n).select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(39)), j =>
          concat(lit("w"), pmod(xxhash64(
            when(col("id") % 100 === 1 && j < lit(39), col("id") - 1)
              .otherwise(col("id")), j), lit(50000)))), " ").as("text"))
    }
    def lshStats(n: Long): (Long, Long, Double) = {
      val docs = docCorpus(n).localCheckpoint(true)
      val t = System.nanoTime()
      val pairs = graft.ops.Dedup.minhashLsh(docs, "doc_id", "text",
        shingleK = 3, numHashes = 16, numBands = 4, threshold = 0.5)
        .localCheckpoint(true)
      val total = pairs.count()
      val planted = pairs.filter(col("doc_b") === col("doc_a") + 1 &&
        col("doc_a") % 100 === 0).count()
      (total, planted, (System.nanoTime() - t) / 1e9)
    }
    val (pairsS, plantedS, lshSecsS) = lshStats(20000L)
    val (pairsL, plantedL, lshSecsL) = lshStats(200000L)
    println(f"[scale-smoke] lsh small: docs=20000 pairs=$pairsS planted=$plantedS/200 " +
      f"lshSeconds=$lshSecsS%.1f")
    println(f"[scale-smoke] lsh large: docs=200000 pairs=$pairsL planted=$plantedL/2000 " +
      f"lshSeconds=$lshSecsL%.1f")
    assert(pairsL < 20 * pairsS,
      s"LSH pair count grew super-linearly: $pairsS -> $pairsL for 10x docs")
    assert(plantedS >= 170 && plantedL >= 1700,
      s"LSH planted-pair recall too low: $plantedS/200, $plantedL/2000")

    // ---- entity-resolution semantic stage (the round-3 scale fix): the
    // IVF-probed candidate×corpus pair stream must grow SUB-linearly with
    // the property corpus (the broadcast-corpus path it replaces scores
    // every same-label row per candidate — linear per candidate AND
    // broadcasts the big side). Centroid count scales with the corpus, so
    // the probed slice stays roughly flat across a 10× corpus.
    val candER = vecCorpus(100).select(
      concat(lit("c"), col("id")).as("cand_id"),
      lit("Person").as("cand_label"), col("embedding").as("cand_vec"))
    def erStats(n: Long, nCentroids: Int): (Long, Long, Double) = {
      val sem = vecCorpus(n).select(
        concat(lit("n"), col("id")).as("sem_id"),
        lit("Person").as("cand_label"), col("embedding").as("ex_vec"))
        .localCheckpoint(true)
      val t = System.nanoTime()
      val pairs = graft.engine.Ingest
        .semanticProbePairs(candER, sem, nCentroids, nProbe = 8)
        .localCheckpoint(true)
      val probed = pairs.count()
      // recall: every candidate sits near a true center, so its probed
      // clusters must contain a near-exact (≥0.95) match
      val matched = pairs.groupBy(col("cand_id"))
        .agg(max(col("sem_score")).as("m")).filter(col("m") >= 0.95).count()
      (probed, matched, (System.nanoTime() - t) / 1e9)
    }
    val (erProbedS, erMatchS, erSecS) = erStats(30000L, 32)
    val (erProbedL, erMatchL, erSecL) = erStats(300000L, 192)
    println(f"[scale-smoke] er-semantic small: corpus=30000 probedPairs=$erProbedS " +
      f"matched=$erMatchS/100 erSeconds=$erSecS%.1f")
    println(f"[scale-smoke] er-semantic large: corpus=300000 probedPairs=$erProbedL " +
      f"matched=$erMatchL/100 erSeconds=$erSecL%.1f")
    assert(erProbedL < 3 * erProbedS,
      s"semantic probe pairs grew linearly: $erProbedS -> $erProbedL for 10x corpus")
    assert(erProbedL.toDouble / (300000.0 * 100) < 0.1,
      "semantic probe reads >10% of the candidate×corpus product")
    assert(erMatchS == 100 && erMatchL == 100,
      s"probed clusters missed a near-exact match: $erMatchS/$erMatchL of 100")

    // ---- contamination detector (q117 shape): the inverted-index join
    // must grow ~linearly — an eval×train product would grow ~100× for a
    // 10× corpus. Every doc ≡1 (mod 100) is a near-copy of its train
    // predecessor (≥30 shared 8-grams); hash-token vocabulary keeps
    // accidental shingle collisions negligible.
    import graft.functions.Fns
    def contamStats(n: Long): (Long, Long, Double) = {
      val docs = docCorpus(n).withColumn("source",
        when(col("doc_id") % 100 === 1, lit("eval")).otherwise(lit("train")))
        .localCheckpoint(true)
      val t = System.nanoTime()
      val sh = docs
        .select(col("doc_id"), col("source"), Fns.tokens(col("text")).as("tk"))
        .select(col("doc_id"), col("source"),
          explode(Fns.shingles(col("tk"), 8)).as("ng"))
        .distinct()
      val ev = sh.filter(col("source") === "eval")
      val tr = sh.filter(col("source") === "train")
        .select(col("ng"), col("doc_id").as("train_id"))
      val res = ev.join(tr, Seq("ng"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("ng")).as("shared"))
        .localCheckpoint(true)
      val flagged = res.count()
      val strong = res.filter(col("shared") >= 20).count()
      (flagged, strong, (System.nanoTime() - t) / 1e9)
    }
    val (cFlagS, cStrongS, cSecS) = contamStats(20000L)
    val (cFlagL, cStrongL, cSecL) = contamStats(200000L)
    println(f"[scale-smoke] contamination small: docs=20000 flagged=$cFlagS " +
      f"strong=$cStrongS/200 cSeconds=$cSecS%.1f")
    println(f"[scale-smoke] contamination large: docs=200000 flagged=$cFlagL " +
      f"strong=$cStrongL/2000 cSeconds=$cSecL%.1f")
    assert(cStrongS >= 195 && cStrongL >= 1950,
      s"planted contamination missed: $cStrongS/200, $cStrongL/2000")
    assert(cFlagL < 20 * cFlagS,
      s"contamination join grew super-linearly: $cFlagS -> $cFlagL for 10x docs")

    // ---- batch KNN (q122 shape): one corpus scan for a 64-query batch;
    // the bounded TopK aggregator must emit EXACTLY k rows per query at
    // every scale (a window-sort fallback would also pass rows but blow
    // wall time — printed for the bench notes), and each query planted at
    // a corpus point must find itself at rank 1.
    def bknnStats(n: Long): (Long, Long, Double) = {
      val corpus = vecCorpus(n).localCheckpoint(true)
      val queries = vecCorpus(64)
        .select(col("id").as("q_id"), col("embedding").as("qvec"))
      val t = System.nanoTime()
      val res = graft.ops.Similarity.knnBatch(
        corpus, queries, "id", "embedding", "q_id", "qvec", k = 5)
        .localCheckpoint(true)
      val rows = res.count()
      val selfHits = res.filter(col("rank") === 1 && col("id") === col("q_id")).count()
      (rows, selfHits, (System.nanoTime() - t) / 1e9)
    }
    val (bRowsS, bSelfS, bSecS) = bknnStats(30000L)
    val (bRowsL, bSelfL, bSecL) = bknnStats(300000L)
    println(f"[scale-smoke] batchKnn small: corpus=30000 rows=$bRowsS " +
      f"selfHits=$bSelfS/64 bSeconds=$bSecS%.1f")
    println(f"[scale-smoke] batchKnn large: corpus=300000 rows=$bRowsL " +
      f"selfHits=$bSelfL/64 bSeconds=$bSecL%.1f")
    assert(bRowsS == 64 * 5 && bRowsL == 64 * 5,
      s"batch KNN row bound broken: $bRowsS / $bRowsL, want ${64 * 5}")
    assert(bSelfS == 64 && bSelfL == 64,
      s"a planted query missed itself at rank 1: $bSelfS / $bSelfL of 64")

    // ---- link prediction (q139 shape): candidate pairs materialize only
    // at shared neighbors (Σ deg² wedges) — on a degree-bounded ring+skip
    // graph they must grow LINEARLY in vertices, never toward the n² pair
    // product.
    def lpStats(n: Long): (Long, Double) = {
      val edges = spark.range(n).select(
          col("id").as("src"),
          explode(sequence(lit(1), lit(4))).as("k"))
        .select(col("src"), ((col("src") + col("k")) % n).as("dst"))
      val t = System.nanoTime()
      val cand = graft.ops.GraphAnalytics.linkPredictionCandidates(edges)
        .localCheckpoint(true)
      (cand.count(), (System.nanoTime() - t) / 1e9)
    }
    val (lpCandS, lpSecS) = lpStats(20000L)
    val (lpCandL, lpSecL) = lpStats(200000L)
    println(f"[scale-smoke] linkPred small: verts=20000 candidates=$lpCandS lpSeconds=$lpSecS%.1f")
    println(f"[scale-smoke] linkPred large: verts=200000 candidates=$lpCandL lpSeconds=$lpSecL%.1f")
    assert(lpCandL < 20 * lpCandS,
      s"link-prediction candidates grew super-linearly: $lpCandS -> $lpCandL for 10x vertices")
    assert(lpCandS < 30 * 20000L && lpCandL < 30 * 200000L,
      s"candidate count exceeds the Σ deg² wedge bound: $lpCandS / $lpCandL")

    // ---- random walks (q140 shape): lock-step batch — output is EXACTLY
    // starts × (steps+1) rows at every corpus scale (walks never fan out);
    // wall time printed for the bench notes.
    def rwStats(n: Long): (Long, Double) = {
      val edges = spark.range(n).select(
          col("id").as("src"),
          explode(sequence(lit(1), lit(4))).as("k"))
        .select(col("src"), ((col("src") + col("k")) % n).as("dst"))
      val starts = spark.range(64).select(col("id"))
      val t = System.nanoTime()
      val rows = graft.ops.GraphAnalytics.randomWalks(edges, starts, steps = 5,
          smallGraphEdges = 0) // force the DISTRIBUTED path — this tier pins it
        .localCheckpoint(true).count()
      (rows, (System.nanoTime() - t) / 1e9)
    }
    val (rwRowsS, rwSecS) = rwStats(20000L)
    val (rwRowsL, rwSecL) = rwStats(200000L)
    println(f"[scale-smoke] walks small: verts=20000 rows=$rwRowsS rwSeconds=$rwSecS%.1f")
    println(f"[scale-smoke] walks large: verts=200000 rows=$rwRowsL rwSeconds=$rwSecL%.1f")
    assert(rwRowsS == 64L * 6 && rwRowsL == 64L * 6,
      s"random-walk output not lock-step bounded: $rwRowsS / $rwRowsL, want ${64 * 6}")

    // ---- PageRank exactFold hub tier (q132 shape at scale): one celebrity
    // vertex with 10⁶ in-edges. The two-level fold must survive it — level-1
    // aggregation buffers hold ≤ in-deg/1024 entries (~1k structs here), not
    // the whole 10⁶ in-neighborhood — and must agree with the plain-sum
    // production path to fp tolerance (same arithmetic, different fold order).
    {
      val n = 1000000L
      val hubEdges = spark.range(1, n).select(col("id").as("src"), lit(0L).as("dst"))
        .union(spark.range(0, n).select(col("id").as("src"),
          ((col("id") + 1) % n).as("dst")))
      val t = System.nanoTime()
      val exact = GraphAnalytics.pageRank(hubEdges, iterations = 2,
        exactFold = true).withColumnRenamed("rank", "r_exact")
      val plain = GraphAnalytics.pageRank(hubEdges, iterations = 2,
        exactFold = false).withColumnRenamed("rank", "r_plain")
      val joined = exact.join(plain, "id")
        .select(max(abs(col("r_exact") - col("r_plain"))).as("md"),
          sum(col("r_exact")).as("total"), count(lit(1)).as("nv"))
        .head()
      val prSecs = (System.nanoTime() - t) / 1e9
      val (maxDiff, total, nv) = (joined.getDouble(0), joined.getDouble(1), joined.getLong(2))
      println(f"[scale-smoke] pagerank-hub verts=$nv inDeg=${n - 1} " +
        f"maxDiffVsSum=$maxDiff%.2e prSeconds=$prSecs%.1f")
      assert(nv == n, s"pagerank lost vertices: $nv of $n")
      // reorder drift over a 10⁶-term double sum is O(n·eps·Σ) ≈ 5e-11;
      // 1e-9 catches algorithmic divergence without flaking on fp order
      assert(maxDiff < 1e-9,
        s"exactFold diverged from production sum path beyond fp tolerance: $maxDiff")
      assert(total > 0.1 && total <= 1.000001, s"rank mass off: $total")
    }

    // ---- MinHash calibration (q143 shape): same shuffle budget as the LSH
    // tier — signatures from ONE map-side-combined agg; banding FPs are the
    // POINT here (kept for tuning), so only wall time + band-candidate
    // sub-linearity are asserted.
    {
      def calStats(n: Long): (Long, Double) = {
        val docs = docCorpus(n)
        val t = System.nanoTime()
        val rows = graft.ops.Dedup.minhashCalibration(docs, "doc_id", "text",
          shingleK = 3, numHashes = 16, numBands = 4)
          .localCheckpoint(true).count()
        (rows, (System.nanoTime() - t) / 1e9)
      }
      val (calS, calSecS) = calStats(20000L)
      val (calL, calSecL) = calStats(200000L)
      println(f"[scale-smoke] calibration small: docs=20000 pairs=$calS calSeconds=$calSecS%.1f")
      println(f"[scale-smoke] calibration large: docs=200000 pairs=$calL calSeconds=$calSecL%.1f")
      assert(calL < 20 * math.max(calS, 50L),
        s"calibration candidate pairs grew super-linearly: $calS -> $calL for 10x docs")
    }

    // ---- Collocation lift (q90 shape): the top-vocab bound caps pair keys,
    // so candidate pair rows must stay ~flat as the corpus grows (vocab cap
    // is corpus-independent); wall time printed for the bench notes.
    {
      def colStats(n: Long): (Long, Double) = {
        val docs = docCorpus(n)
        val t = System.nanoTime()
        val rows = graft.ops.TextAnalysis.collocationLift(docs, "doc_id", "text",
          topTokens = 200, minPairDocs = 3, topN = 30)
          .localCheckpoint(true).count()
        (rows, (System.nanoTime() - t) / 1e9)
      }
      val (colS, colSecS) = colStats(20000L)
      val (colL, colSecL) = colStats(200000L)
      println(f"[scale-smoke] collocations small: docs=20000 rows=$colS colSeconds=$colSecS%.1f")
      println(f"[scale-smoke] collocations large: docs=200000 rows=$colL colSeconds=$colSecL%.1f")
      assert(colS <= 30 && colL <= 30, s"topN bound violated: $colS / $colL")
    }

    // ---- functional SCC (q157 shape): pointer doubling over the quadratic
    // map v -> (v² + 1) mod n — arbitrary rho shapes with ~√n cycles.
    // ⌈log₂ n⌉ rounds of an exactly-n-row self-join; invariants checked
    // distributedly: total coverage, cycle labels closed under succ, and
    // every label labels itself.
    {
      val n = 200000L
      val succ = spark.range(0, n).select(col("id"),
        ((col("id") * col("id") + 1) % n).as("next"))
      val t = System.nanoTime()
      val scc = GraphAnalytics.functionalScc(succ, smallGraphEdges = 0)
        .persist() // force the DISTRIBUTED path — this tier pins it
      val total = scc.count()
      val sccSecs = (System.nanoTime() - t) / 1e9
      val lbl = scc.select(col("id"), col("scc"))
      // non-singleton members are cycle vertices: their successor must
      // carry the same label
      val viaNext = lbl.filter(col("scc") =!= col("id"))
        .join(succ, "id")
        .join(lbl.select(col("id").as("next"), col("scc").as("scc_n")), "next")
        .filter(col("scc") =!= col("scc_n")).count()
      // a label must label itself (it is the min member of its cycle)
      val badRoots = lbl.select(col("scc").as("id")).distinct()
        .join(lbl, "id").filter(col("scc") =!= col("id")).count()
      println(f"[scale-smoke] functionalScc verts=$total cycleViolations=$viaNext " +
        f"rootViolations=$badRoots sccSeconds=$sccSecs%.1f")
      assert(total == n, s"functionalScc lost vertices: $total of $n")
      assert(viaNext == 0, "cycle label not closed under successor")
      assert(badRoots == 0, "an SCC label does not label itself")
      scc.unpersist()
    }

    // ---- Winnowing fingerprints (q181 shape): the sketch size is a fixed
    // fraction of the shingle count (~2/(w+1)), and the pair join runs on
    // the df-capped fingerprint inverted index — planted near-dup pairs
    // (id%100==1 copies 39/40 words of id-1, sharing long token runs) must
    // surface while total pair rows stay ~linear in the corpus.
    {
      def winStats(n: Long): (Long, Long, Long, Double) = {
        val docs = docCorpus(n)
        val t = System.nanoTime()
        val fps = graft.ops.Curation.winnowingFingerprints(
          docs, "doc_id", "text", k = 3, w = 4).localCheckpoint(true)
        val nFps = fps.count()
        val pairs = graft.ops.Curation.winnowingPairs(
          fps, minShared = 2, maxFpDf = 20).localCheckpoint(true)
        val total = pairs.count()
        val planted = pairs.filter(col("doc_b") === col("doc_a") + 1 &&
          col("doc_a") % 100 === 0).count()
        (nFps, total, planted, (System.nanoTime() - t) / 1e9)
      }
      val (fpsS, pairsS2, plantedS2, secS) = winStats(20000L)
      val (fpsL, pairsL2, plantedL2, secL) = winStats(200000L)
      println(f"[scale-smoke] winnowing small: docs=20000 fps=$fpsS pairs=$pairsS2 " +
        f"planted=$plantedS2/200 winSeconds=$secS%.1f")
      println(f"[scale-smoke] winnowing large: docs=200000 fps=$fpsL pairs=$pairsL2 " +
        f"planted=$plantedL2/2000 winSeconds=$secL%.1f")
      // sketch stays a fixed fraction of the corpus (38 shingles/doc -> ~35
      // window minima before distinct); pairs must not go quadratic
      assert(fpsL < 12 * fpsS, s"fingerprint count super-linear: $fpsS -> $fpsL")
      assert(pairsL2 < 20 * math.max(pairsS2, 50L),
        s"winnowing pair count super-linear: $pairsS2 -> $pairsL2 for 10x docs")
      // a 39/40-word copy shares whole token runs -> winnowing guarantee
      assert(plantedS2 >= 190 && plantedL2 >= 1900,
        s"winnowing planted recall too low: $plantedS2/200, $plantedL2/2000")
    }

    // ---- Segment boilerplate (q177 shape): shuffle keys are segment
    // strings only (corpus-linear); planted 39/40-word copies share aligned
    // 3-token segments with their source, so both ends of each planted pair
    // must report a nonzero dup fraction.
    {
      def segStats(n: Long): (Long, Long, Double) = {
        val docs = docCorpus(n)
        val t = System.nanoTime()
        val out = graft.ops.Curation.segmentBoilerplate(
          docs, "doc_id", "text", segLen = 3).localCheckpoint(true)
        val rows = out.count()
        val plantedDup = out.filter(
          (col("doc_id") % 100 === 0 || col("doc_id") % 100 === 1) &&
            col("n_dup") > 0).count()
        (rows, plantedDup, (System.nanoTime() - t) / 1e9)
      }
      val (rowsS, dupS, secS) = segStats(20000L)
      val (rowsL, dupL, secL) = segStats(200000L)
      println(f"[scale-smoke] boilerplate small: docs=20000 rows=$rowsS " +
        f"plantedDup=$dupS/400 segSeconds=$secS%.1f")
      println(f"[scale-smoke] boilerplate large: docs=200000 rows=$rowsL " +
        f"plantedDup=$dupL/4000 segSeconds=$secL%.1f")
      assert(rowsS == 20000L && rowsL == 200000L, "per-doc report lost rows")
      assert(dupS >= 380 && dupL >= 3800,
        s"planted boilerplate recall too low: $dupS/400, $dupL/4000")
    }

    // ---- Prefix-filtered exact Jaccard (q189 shape): every doc carries a
    // boilerplate prefix whose shingles have df == corpus size — exactly the
    // keys that send the naive inverted-index join quadratic. The prefix
    // filter admits only each doc's n−ceil(t·n)+1 RAREST shingles as join
    // keys, so boilerplate never generates candidates; and because the
    // operator is EXACT (no LSH recall loss), every planted pair must
    // surface and nothing else may.
    {
      def bpCorpus(n: Long) = docCorpus(n).select(col("doc_id"),
        concat(lit("terms of service apply to this site "), col("text")).as("text"))
      def pfjStats(n: Long): (Long, Long, Double) = {
        val docs = bpCorpus(n).localCheckpoint(true)
        val t = System.nanoTime()
        val pairs = graft.ops.Dedup.prefixFilterJoin(docs, "doc_id", "text",
          shingleK = 3, threshold = 0.5).localCheckpoint(true)
        val total = pairs.count()
        val planted = pairs.filter(col("doc_b") === col("doc_a") + 1 &&
          col("doc_a") % 100 === 0).count()
        (total, planted, (System.nanoTime() - t) / 1e9)
      }
      val (pfS, pfPlS, pfSecS) = pfjStats(20000L)
      val (pfL, pfPlL, pfSecL) = pfjStats(200000L)
      println(f"[scale-smoke] prefixJoin small: docs=20000 pairs=$pfS " +
        f"planted=$pfPlS/200 pfjSeconds=$pfSecS%.1f")
      println(f"[scale-smoke] prefixJoin large: docs=200000 pairs=$pfL " +
        f"planted=$pfPlL/2000 pfjSeconds=$pfSecL%.1f")
      assert(pfPlS == 200 && pfPlL == 2000,
        s"prefix join lost planted pairs (must be exact): $pfPlS/200, $pfPlL/2000")
      assert(pfS == pfPlS && pfL == pfPlL,
        s"unexpected extra pairs at t=0.5: $pfS vs $pfPlS, $pfL vs $pfPlL")
      assert(pfSecL < 25 * math.max(pfSecS, 1.0),
        f"prefix join wall time super-linear under boilerplate: " +
          f"$pfSecS%.1f -> $pfSecL%.1f for 10x docs")
    }

    // ---- Spectral Gramian (q184 shape): the aggregation output is d²
    // rows REGARDLESS of corpus size — the property that makes power
    // iteration corpus-scale-safe (shuffle bounded by dim, not rows).
    {
      def gramStats(n: Long): (Long, Double) = {
        val vecs = vecCorpus(n)
        val t = System.nanoTime()
        val rows = graft.ops.Spectral.gramian(vecs, "embedding")
          .localCheckpoint(true).count()
        (rows, (System.nanoTime() - t) / 1e9)
      }
      val (gS, gSecS) = gramStats(10000L)
      val (gL, gSecL) = gramStats(100000L)
      println(f"[scale-smoke] gramian small: vecs=10000 cells=$gS gramSeconds=$gSecS%.1f")
      println(f"[scale-smoke] gramian large: vecs=100000 cells=$gL gramSeconds=$gSecL%.1f")
      assert(gS == gL, s"Gramian cell count must be corpus-independent: $gS vs $gL")
    }

    // ---- IVF-routed hubness (q251 shape): the all-pairs diagnostic routes
    // every query through 2 probed lists, so SCORED CANDIDATE PAIRS grow
    // ~linearly with the corpus when the centroid count scales with it —
    // the brute-force variant (q247) would grow corpus².
    {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorFunctions.l2sq
      def hubStats(n: Long, nCentroids: Int): (Long, Double) = {
        val corpus = vecCorpus(n).localCheckpoint(true)
        val cent = corpus.filter(col("id") < nCentroids)
          .select(col("id").as("centroid_id"), col("embedding").as("cvec"))
          .localCheckpoint(true)
        val t = System.nanoTime()
        val assigned = graft.ops.Similarity.ivfAssign(
          corpus, cent, "id", "embedding")
        val wq = Window.partitionBy(col("q_id"))
          .orderBy(col("dist"), col("centroid_id"))
        val qProbes = corpus
          .select(col("id").as("q_id"), col("embedding").as("qvec"))
          .crossJoin(broadcast(cent))
          .withColumn("dist", round(l2sq(col("qvec"), col("cvec")), 6))
          .withColumn("rn", row_number().over(wq))
          .filter(col("rn") <= 2)
          .select(col("q_id"), col("centroid_id").as("q_centroid"))
        val pairs = assigned
          .join(qProbes, col("centroid_id") === col("q_centroid"))
          .filter(col("id") =!= col("q_id"))
          .count()
        (pairs, (System.nanoTime() - t) / 1e9)
      }
      val (hpS, hSecS) = hubStats(10000L, 64)
      val (hpL, hSecL) = hubStats(100000L, 640)
      println(f"[scale-smoke] ivf-hubness small: vecs=10000 candidatePairs=$hpS " +
        f"hubSeconds=$hSecS%.1f")
      println(f"[scale-smoke] ivf-hubness large: vecs=100000 candidatePairs=$hpL " +
        f"hubSeconds=$hSecL%.1f")
      // corpus ×10 → candidate pairs must stay ~linear (≤ 20×, not 100×)
      assert(hpL < 20L * hpS,
        s"IVF hubness candidate pairs grew super-linearly: $hpS -> $hpL")
      assert(hpL < (100000L * 99999L) / 10,
        s"IVF hubness scored a near-quadratic candidate set: $hpL")
    }

    // ---- Greedy k-center (q239 shape): each selection round is ONE corpus
    // scan against broadcast centers — wall time must scale ~linearly with
    // the corpus, and the per-round scored relation is rows × |centers|.
    {
      import graft.functions.VectorFunctions.cosineSim
      def kcStats(n: Long): (Long, Double) = {
        val corpus = vecCorpus(n).localCheckpoint(true)
        val t = System.nanoTime()
        var centers = corpus.orderBy(col("id")).limit(1).localCheckpoint(true)
        (1 to 3).foreach { _ =>
          val next = corpus
            .crossJoin(broadcast(centers.select(col("embedding").as("cvec"))))
            .withColumn("dist",
              lit(1.0) - cosineSim(col("embedding"), col("cvec")))
            .groupBy(col("id"))
            .agg(min(col("dist")).as("mind"),
              first(col("embedding")).as("embedding"))
            .orderBy(desc("mind"), col("id")).limit(1)
            .localCheckpoint(true)
          centers = centers.union(next.select(col("id"), col("embedding")))
            .localCheckpoint(true)
        }
        (centers.count(), (System.nanoTime() - t) / 1e9)
      }
      val (kcS, kcSecS) = kcStats(50000L)
      val (kcL, kcSecL) = kcStats(500000L)
      println(f"[scale-smoke] kcenter small: vecs=50000 centers=$kcS " +
        f"kcSeconds=$kcSecS%.1f")
      println(f"[scale-smoke] kcenter large: vecs=500000 centers=$kcL " +
        f"kcSeconds=$kcSecL%.1f")
      assert(kcS == 4 && kcL == 4, s"k-center picked $kcS/$kcL centers, want 4")
      assert(kcSecL < 25 * math.max(kcSecS, 1.0),
        f"k-center wall time super-linear: $kcSecS%.1f -> $kcSecL%.1f for 10x")
    }

    // ---- Exact-rank tier (the q206/q213/q229/q237/q250/q258/q274/q278
    // replacement shape): the two-pass BSP ranker at 10⁷ rows. The small
    // tier pins BIT-equality with the single-window form (the claim that
    // made the refactor hash-safe); the large tier pins the invariants a
    // single-task sort cannot fake: rank bijection, ANSI ntile bucket
    // sizing, bucket/order consistency, and per-task row bounds (no
    // partition ever holds the whole relation).
    {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.PrefixSum
      def freqRel(n: Long) = spark.range(0, n).select(
        col("id").as("k"),
        // cast back to long: Spark's long/long division yields DOUBLE
        (lit(10000000L) /
          (pmod(xxhash64(col("id") * 31 + 7), lit(1000000L)) + 1L))
          .cast("long").as("x"))
      val order = Seq(col("x"), col("k"))
      val small = freqRel(200000L).localCheckpoint(true)
      val twoPass = PrefixSum.globalRowNumber(small, order, "rn")
      val oneTask = small.withColumn("rn",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      val rankDiff = twoPass.select(col("k"), col("rn"))
        .join(oneTask.select(col("k"), col("rn").as("rn1")), "k")
        .filter(col("rn") =!= col("rn1")).count()
      val ntDiff = PrefixSum.globalNtile(small, 10, order, "b")
        .select(col("k"), col("b"))
        .join(small.withColumn("b1",
            ntile(10).over(Window.orderBy(order: _*)))
          .select(col("k"), col("b1")), "k")
        .filter(col("b") =!= col("b1")).count()
      println(s"[scale-smoke] exact-rank small: rows=200000 " +
        s"rankMismatches=$rankDiff ntileMismatches=$ntDiff")
      assert(rankDiff == 0, "two-pass rank diverged from the single-window form")
      assert(ntDiff == 0, "two-pass ntile diverged from the single-window form")

      val n = 10000000L
      val big = freqRel(n).localCheckpoint(true)
      val t = System.nanoTime()
      val ranked = PrefixSum.globalRowNumber(big, order, "rn")
        .localCheckpoint(true)
      val rkSecs = (System.nanoTime() - t) / 1e9
      val st = ranked.agg(count(lit(1)).as("c"), min(col("rn")).as("mn"),
        max(col("rn")).as("mx"), count_distinct(col("rn")).as("d")).head()
      assert(st.getLong(0) == n && st.getLong(1) == 1L &&
        st.getLong(2) == n && st.getLong(3) == n,
        s"rank not a 1..N bijection: $st")
      val perTask = ranked.withColumn("p", spark_partition_id())
        .groupBy(col("p")).agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head().getLong(0)
      println(f"[scale-smoke] exact-rank large: rows=$n " +
        f"maxTaskRows=$perTask rankSeconds=$rkSecs%.1f")
      assert(perTask < 4 * n / 32,
        s"rank funneled $perTask of $n rows through one task")
      val t2 = System.nanoTime()
      val nt = PrefixSum.globalNtile(big, 10, order, "b").localCheckpoint(true)
      val ntSecs = (System.nanoTime() - t2) / 1e9
      val buckets = nt.groupBy(col("b"))
        .agg(count(lit(1)).as("c"),
          min(struct(col("x"), col("k"))).as("lo"),
          max(struct(col("x"), col("k"))).as("hi"))
        .orderBy(col("b")).collect()
      println(f"[scale-smoke] exact-ntile large: buckets=${buckets.length} " +
        f"ntileSeconds=$ntSecs%.1f")
      assert(buckets.length == 10, s"expected 10 buckets: ${buckets.length}")
      val cs = buckets.map(_.getLong(1))
      assert(cs.max - cs.min <= 1, s"ANSI bucket sizing violated: ${cs.toSeq}")
      buckets.sliding(2).foreach { case Array(a, b) =>
        val (hiA, loB) = (a.getStruct(3), b.getStruct(2))
        val ordered = hiA.getLong(0) < loB.getLong(0) ||
          (hiA.getLong(0) == loB.getLong(0) && hiA.getLong(1) < loB.getLong(1))
        assert(ordered, s"bucket ${a.getInt(0)} overlaps ${b.getInt(0)}: $hiA vs $loB")
      }
    }

    // ---- Large-vocab text tier: the documents fixture's ~31-word base
    // vocabulary never stresses vocab-keyed shuffles, so the q229 (Zipf
    // top-k + OLS), q258 (unigram^0.75 sampling table) and q145 (per-doc
    // unigram surprise) shapes run here against 10⁶ DISTINCT tokens. The
    // Zipf fit doubles as a numeric check: cnt(r) = ⌊10⁷/r⌋ has slope −1
    // by construction.
    {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.PrefixSum
      val V = 1000000L
      val tf = spark.range(1, V + 1).select(
        concat(lit("t"), col("id")).as("w"),
        (lit(10000000L) / col("id")).cast("long").as("cnt"))
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      val zipf = tf.orderBy(desc("cnt"), col("w")).limit(200)
        .withColumn("rank",
          row_number().over(Window.orderBy(desc("cnt"), col("w"))))
        .agg(count(lit(1)).as("n_terms"),
          expr("regr_slope(ln(cnt), ln(rank))").as("slope")).head()
      val zSecs = (System.nanoTime() - t0) / 1e9
      println(f"[scale-smoke] zipf 1e6-vocab: topTerms=${zipf.getLong(0)} " +
        f"slope=${zipf.getDouble(1)}%.4f zipfSeconds=$zSecs%.1f")
      assert(zipf.getLong(0) == 200L, "top-200 cut lost terms")
      assert(math.abs(zipf.getDouble(1) + 1.0) < 0.02,
        s"Zipf slope off the constructed -1: ${zipf.getDouble(1)}")

      val t1 = System.nanoTime()
      val wtd = tf.withColumn("wt", pow(col("cnt"), 0.75))
      val zDf = wtd.agg(sum(col("wt").cast("decimal(38,15)")).as("z"))
      val closing = PrefixSum.globalRunningSum(wtd, Seq(col("w")),
          col("wt").cast("decimal(38,15)"))
        .crossJoin(broadcast(zDf))
        .select((col("running").cast("double") / col("z").cast("double"))
          .as("cum_p"))
        .agg(count(lit(1)).as("n"), max(col("cum_p")).as("mx")).head()
      val nsSecs = (System.nanoTime() - t1) / 1e9
      println(f"[scale-smoke] sampling-table 1e6-vocab: rows=${closing.getLong(0)} " +
        f"cumClose=${closing.getDouble(1)}%.12f nsSeconds=$nsSecs%.1f")
      assert(closing.getLong(0) == V, "sampling table lost vocab rows")
      assert(math.abs(closing.getDouble(1) - 1.0) < 1e-9,
        s"cumulative mass does not close at 1: ${closing.getDouble(1)}")

      val docs = spark.range(0, 200000).select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(20)),
          i => concat(lit("t"), pmod(xxhash64(col("id") * 23 + i.cast("long") * 101),
            lit(V))))).as("text"))
      val t2 = System.nanoTime()
      val sup = graft.ops.TextAnalysis.unigramSurprise(docs, "doc_id", "text")
        .agg(count(lit(1)).as("n"),
          sum(when(col("avg_surprise").isNull, 1L).otherwise(0L)).as("nulls")).head()
      val supSecs = (System.nanoTime() - t2) / 1e9
      println(f"[scale-smoke] surprise 1e6-vocab: docs=${sup.getLong(0)} " +
        f"nulls=${sup.getLong(1)} supSeconds=$supSecs%.1f")
      assert(sup.getLong(0) == 200000L && sup.getLong(1) == 0L,
        "unigram surprise dropped docs or produced nulls at 1e6 vocab")
    }

    // ---- Streaming counters tier (T5 at state pressure): 10⁶ keys, two
    // logical event waves, half the keys' second event arriving LATE
    // (event time before the stored lastTs — the cross-batch disorder the
    // fold must absorb). The streamed decay-at-update state must equal the
    // batch decay-at-read recompute per key: hit counts exactly, EMAs to fp
    // tolerance (same math, different pow association). Pins the
    // decay-at-update contract under 10⁶-key state, not 5-row fixtures.
    // Driver-footprint discipline: a MemoryStream batch rides inside the
    // task binary, so each wave is fed in 100k-row chunks (~12 MiB each,
    // generated on the fly and not retained) instead of one 10⁶-row seq
    // (~122 MiB broadcast, OOMs the 8 GB driver); splitting a wave across
    // micro-batches is MORE adversarial for the fold, not less, since the
    // state now threads extra micro-batch boundaries. The batch recompute
    // reconstructs the same events distributedly from spark.range — no
    // 2×10⁶-row driver-side LocalRelation.
    {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.domain.Schemas.AccessEvent
      import graft.streaming.Counters
      import spark.implicits._
      val nKeys = 1000000
      val chunk = 100000
      val base = 1700000000000L
      def ev(k: Int, batch: Int): AccessEvent = {
        val t1 = base + (k % 97).toLong * 3600000L
        val ts = if (batch == 0) t1
                 else if (k % 2 == 0) t1 + 5L * 86400000L  // on-time
                 else t1 - 3L * 86400000L                  // LATE by 3 days
        AccessEvent(s"e$batch-$k", f"m$k%07d", "u", "retrieval",
          0.5, (k % 10) / 10.0, new java.sql.Timestamp(ts))
      }
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[AccessEvent]
      val query = Counters.counterStream(spark, input.toDS())
        .writeStream.format("memory").queryName("t5scale")
        .outputMode("update").start()
      val t = System.nanoTime()
      try {
        for (b <- 0 to 1; lo <- 0 until nKeys by chunk) {
          input.addData((lo until math.min(lo + chunk, nKeys)).map(ev(_, b)))
          query.processAllAvailable()
        }
      } finally query.stop()
      val strSecs = (System.nanoTime() - t) / 1e9
      // final state per key = the update with the max hit_total (hit counts
      // grow strictly across a key's updates)
      val streamed = spark.table("t5scale")
        .groupBy(col("memory_id"))
        .agg(max(struct(col("hit_total"), col("ema_30d"),
          col("conf_weighted_30d"))).as("s"))
        .select(col("memory_id"), col("s.hit_total").as("hit_s"),
          col("s.ema_30d").as("ema_s"),
          col("s.conf_weighted_30d").as("conf_s"))
      // batch decay-at-read recompute over the SAME events, reconstructed
      // distributedly (same arithmetic as ev(), k = id % nKeys, wave =
      // id / nKeys) — the double math matches bit-for-bit: (k%10)/10.0 is
      // the same IEEE divide either way
      val kC = col("id") % nKeys
      val t1C = lit(base) + (kC % 97) * lit(3600000L)
      val evDf = spark.range(0, 2L * nKeys).select(
          format_string("m%07d", kC).as("memory_id"),
          ((kC % 10).cast("double") / lit(10.0)).as("confidence"),
          when(col("id") < nKeys, t1C)
            .when(kC % 2 === 0, t1C + lit(5L * 86400000L))
            .otherwise(t1C - lit(3L * 86400000L)).as("ms"))
      val lastTs = evDf.groupBy(col("memory_id")).agg(max(col("ms")).as("last_ms"))
      val dec = pow(lit(0.5),
        (col("last_ms") - col("ms")) / lit(86400000.0) / lit(Counters.HalfLifeDays))
      val batch = evDf.join(lastTs, "memory_id")
        .groupBy(col("memory_id"))
        .agg(count(lit(1)).cast("double").as("hit_b"),
          sum(dec).as("ema_b"),
          sum(col("confidence") * dec).as("conf_b"))
      val cmp = streamed.join(batch, "memory_id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("hit_s") =!= col("hit_b"), 1L).otherwise(0L)).as("badHits"),
          max(abs(col("ema_s") - col("ema_b"))).as("emaDiff"),
          max(abs(col("conf_s") - col("conf_b"))).as("confDiff")).head()
      println(f"[scale-smoke] streaming-counters: keys=${cmp.getLong(0)} " +
        f"badHits=${cmp.getLong(1)} emaDiff=${cmp.getDouble(2)}%.2e " +
        f"confDiff=${cmp.getDouble(3)}%.2e streamSeconds=$strSecs%.1f")
      assert(cmp.getLong(0) == nKeys.toLong, s"lost keys: ${cmp.getLong(0)}")
      assert(cmp.getLong(1) == 0L, "streamed hit counts diverged from batch")
      assert(cmp.getDouble(2) < 1e-9 && cmp.getDouble(3) < 1e-9,
        "streamed EMA diverged from the batch decay-at-read recompute")
      spark.sql("DROP TABLE IF EXISTS t5scale")
    }

    // ---- Partition-scoped upsert tier (S4 write path at table scale):
    // a 100-partition table, then an ingest batch touching 3 partitions.
    // The claim that makes MERGE 100 TB-viable: rewrite bytes scale with
    // |touched partitions|, not |table| — pinned by measuring actual bytes
    // whose files changed on disk, plus the equivalence invariant (the
    // scoped upsert's table equals what the full-table upsert computes).
    {
      val dir = java.nio.file.Files.createTempDirectory("upsert-smoke")
        .toString + "/t"
      val nParts = 100
      val table = spark.range(0, 2000000).select(
        concat(lit("p"), lpad(pmod(col("id"), lit(nParts)).cast("string"), 3, "0"))
          .as("part"),
        col("id").as("k"), xxhash64(col("id")).as("v"))
      table.write.partitionBy("part").parquet(dir)
      def fileSig(): Map[String, (Long, Long)] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
          else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
        walk(new java.io.File(dir))
          .map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
      }
      val before = fileSig()
      val totalBytes = before.values.map(_._1).sum
      // batch: 300 updates + 30 inserts, all in partitions p000/p001/p002
      val incoming = spark.range(0, 330).select(
        concat(lit("p"), lpad(pmod(col("id"), lit(3)).cast("string"), 3, "0"))
          .as("part"),
        when(col("id") < 300, pmod(col("id"), lit(3)) + col("id") * nParts)
          .otherwise(col("id") + 10000000L).as("k"),
        lit(-1L).as("v"))
      val t = System.nanoTime()
      val swapped = graft.sources.Writers.upsertPartitioned(
        spark, dir, incoming, "k", Seq("part"))
      val upSecs = (System.nanoTime() - t) / 1e9
      val after = fileSig()
      val rewrittenBytes = after.collect {
        case (path, sig) if !before.get(path).contains(sig) => sig._1 }.sum
      val frac = rewrittenBytes.toDouble / totalBytes
      // equivalence: merged table row count + updated rows all landed
      val updated = spark.read.parquet(dir).filter(col("v") === -1L).count()
      val rows = spark.read.parquet(dir).count()
      println(f"[scale-smoke] upsert-partitioned: swapped=${swapped.length} " +
        f"rewrittenBytes=$rewrittenBytes/$totalBytes (${frac * 100}%.1f%%) " +
        f"rows=$rows updated=$updated upsertSeconds=$upSecs%.1f")
      assert(swapped.length == 3, s"expected 3 swapped partitions, got $swapped")
      assert(updated == 330L, s"expected 330 upserted rows, got $updated")
      assert(rows == 2000030L, s"expected 2000030 rows, got $rows")
      // the scale claim: ≤3 of 100 partitions' bytes rewritten (plus slack
      // for file-count layout differences in the rewritten dirs)
      assert(frac < 0.08,
        f"rewrite amplification $frac%.2f — write path not partition-scoped")

      // ---- Partition-scoped delete (S7 at the same table): erase 100 keys
      // from p005/p006 — only those partitions' bytes may change, and a
      // full-tenant erasure (every p007 row) must REMOVE the directory.
      val beforeDel = fileSig()
      val delTotal = beforeDel.values.map(_._1).sum
      val victims = spark.range(0, 100).select(
        concat(lit("p"), lpad((pmod(col("id"), lit(2)) + 5).cast("string"), 3, "0"))
          .as("part"),
        (pmod(col("id"), lit(2)) + 5 + col("id") * nParts).as("k"))
      val td = System.nanoTime()
      val delTouched = graft.sources.Writers.deletePartitioned(
        spark, dir, victims, "k", Seq("part"))
      val delSecs = (System.nanoTime() - td) / 1e9
      val afterDel = fileSig()
      val delRewritten = afterDel.collect {
        case (path, sig) if !beforeDel.get(path).contains(sig) => sig._1 }.sum
      val delFrac = delRewritten.toDouble / delTotal
      val rowsAfterDel = spark.read.parquet(dir).count()
      println(f"[scale-smoke] delete-partitioned: touched=${delTouched.length} " +
        f"rewrittenBytes=$delRewritten/$delTotal (${delFrac * 100}%.1f%%) " +
        f"rows=$rowsAfterDel deleteSeconds=$delSecs%.1f")
      assert(delTouched.length == 2, s"expected 2 touched partitions, got $delTouched")
      assert(rowsAfterDel == 2000030L - 100L,
        s"expected ${2000030L - 100L} rows after delete, got $rowsAfterDel")
      assert(delFrac < 0.06,
        f"delete amplification $delFrac%.2f — delete path not partition-scoped")
      // full-partition erasure drops the directory
      val gone = spark.read.parquet(dir).filter(col("part") === "p007")
        .select(col("part"), col("k"))
      graft.sources.Writers.deletePartitioned(
        spark, dir, gone, "k", Seq("part"))
      assert(!new java.io.File(dir, "part=p007").exists(),
        "fully-erased partition directory must be removed")
    }

    // ---- Maintained-index DELETE at size (round 10, the GDPR cascade
    // against standing dedup state): a 2M-row standing band table across
    // 50 source partitions plus a 100k-row standing pair feed.
    // lshIndexDelete of one source's victims must (a) rewrite only that
    // source's partition bytes — amplification ∝ the victims' partitions,
    // the property that makes per-request deletes viable against a 100 TB
    // standing table — (b) remove every victim band row and every standing
    // pair touching a victim on either endpoint, and (c) finish in
    // seconds. (The pair feed itself is near-dup-population-sized, so its
    // full-swap purge is bounded by that population, not the corpus.)
    {
      val base = java.nio.file.Files.createTempDirectory("idx-del-smoke").toString
      val bandDir = base + "/bands"
      val pairDir = base + "/pairs"
      // 500k docs × 4 band rows; source = doc_id % 50
      val bands = spark.range(0, 2000000).select(
        (col("id") / 4).cast("long").as("doc_id"),
        pmod(col("id"), lit(4)).cast("int").as("band_idx"),
        md5(concat(lit("bk"), pmod(xxhash64(col("id")), lit(400000)).cast("string")))
          .as("band_key"),
        concat(lit("s"), pmod((col("id") / 4).cast("long"), lit(50)).cast("string"))
          .as("source"))
      bands.write.partitionBy("source").parquet(bandDir)
      val pairFeed = spark.range(0, 100000).select(
        col("id").as("doc_a"), (col("id") + 1L).as("doc_b"))
        .withColumn("pair_key", to_json(struct(col("doc_a"), col("doc_b"))))
      graft.sources.Writers.swapWrite(pairFeed, pairDir)

      def sig(d: String): Map[String, (Long, Long)] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
          else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
        walk(new java.io.File(d))
          .map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
      }
      val before = sig(bandDir)
      val totalBytes = before.values.map(_._1).sum
      // victims: 1000 docs, all in source s7
      val victims = spark.range(0, 1000).select(
        (col("id") * 50L + 7L).as("doc_id"), lit("s7").as("source"))
        .localCheckpoint(true)
      val t0 = System.nanoTime()
      graft.streaming.Sinks.lshIndexDelete(bandDir, victims, "doc_id",
        partitionCols = Seq("source"), pairTables = Seq(pairDir))
      val secs = (System.nanoTime() - t0) / 1e9
      val after = sig(bandDir)
      val rewritten = after.collect {
        case (path, s) if !before.get(path).contains(s) => s._1 }.sum
      val frac = rewritten.toDouble / totalBytes
      val standing = spark.read.parquet(bandDir)
      val victimRows = standing.join(broadcast(victims.select(col("doc_id"))),
        Seq("doc_id"), "left_semi").count()
      val rows = standing.count()
      val pairsLeft = spark.read.parquet(pairDir)
      val victimPairs = pairsLeft.filter(
        pmod(col("doc_a"), lit(50)) === 7 && col("doc_a") < 50000L ||
        pmod(col("doc_b"), lit(50)) === 7 && col("doc_b") < 50000L).count()
      println(f"[scale-smoke] index-delete: rewrittenBytes=$rewritten/$totalBytes " +
        f"(${frac * 100}%.1f%%) rows=$rows victimRows=$victimRows " +
        f"victimPairs=$victimPairs seconds=$secs%.1f")
      assert(victimRows == 0L, "victim band rows survived the index delete")
      assert(rows == 2000000L - 4000L, s"expected ${2000000L - 4000L} rows, got $rows")
      assert(victimPairs == 0L, "standing pairs touching a victim survived")
      assert(frac < 0.06,
        f"index-delete amplification $frac%.2f — not partition-scoped")
      assert(secs < 60, f"index-delete took $secs%.1f s at 2M rows")
    }

    // ---- Posting-list pair generation at size: coOccurrenceEdges must
    // equal the self-join formulation EXACTLY (same src/dst/n_co multiset)
    // on a 2M-row basket relation with duplicates and a skewed container,
    // and the whole run must stay hash-aggregated (the raised object-agg
    // fallback) — the sort-based path would still be correct, so the
    // invariant pinned here is equality + wall-clock sanity, while the
    // plan shape (one exchange, no join) is pinned by PLAN_BUDGET.
    {
      val baskets = spark.range(0, 2000000).select(
        pmod(xxhash64(col("id")), lit(300000)).as("container"),
        pmod(xxhash64(col("id") * 7 + 3), lit(50000)).as("item"))
        // one pathological container with 2000 items (2M occurrence pairs)
        .union(spark.range(0, 2000).select(lit(-1L).as("container"),
          col("id").as("item")))
        .localCheckpoint(true)
      val tpl = System.nanoTime()
      val pl = GraphAnalytics.coOccurrenceEdges(
          baskets, "container", "item", minCount = 2)
        .localCheckpoint(true)
      val plEdges = pl.count()
      val plSecs = (System.nanoTime() - tpl) / 1e9
      val joined = baskets.select(col("container"), col("item").as("src"))
        .join(baskets.select(col("container"), col("item").as("dst")), "container")
        .filter(col("src") < col("dst"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n_co"))
        .filter(col("n_co") >= 2)
      val diff = pl.unionAll(joined)
        .groupBy(col("src"), col("dst"), col("n_co"))
        .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
      println(f"[scale-smoke] posting-pairs: edges=$plEdges seconds=$plSecs%.1f " +
        f"joinDiff=$diff")
      assert(diff == 0, "posting-list pairs differ from the self-join formulation")
      assert(plEdges > 0, "co-occurrence generator produced nothing")
    }

    // ---- Adversarial hot bucket: 10⁵ docs share ONE LSH band bucket
    // among 2M rows (the boilerplate-corpus attack on banded dedup).
    // Uncapped, that bucket alone buffers a 10⁵-element posting array in
    // one aggregation buffer and emits ~5×10⁹ pairs from ONE task;
    // the bounded posting aggregate (StopBucketDf = 2¹⁶) saturates at
    // cap+1 elements and drops it as a stop-bucket, so the run must
    // finish in seconds and emit exactly the healthy buckets' pairs.
    {
      import graft.ops.Dedup
      val healthy = spark.range(0, 2000000).select(
        lit(0).as("band_idx"),
        concat(lit("b"), pmod(xxhash64(col("id")), lit(900000)).cast("string"))
          .as("band_key"),
        col("id").as("doc_id"))
      val bands = healthy
        .union(spark.range(10000000, 10100000).select(lit(1).as("band_idx"),
          lit("HOT").as("band_key"), col("id").as("doc_id")))
        .localCheckpoint(true)
      val th = System.nanoTime()
      val capped = Dedup.candidatePairs(bands).localCheckpoint(true)
      val nCapped = capped.count()
      val hotSecs = (System.nanoTime() - th) / 1e9
      // ground truth for the healthy buckets only (small df everywhere:
      // the self-join is safe there)
      val expect = healthy.select(col("band_idx"), col("band_key"), col("doc_id").as("x"))
        .join(healthy.select(col("band_idx"), col("band_key"), col("doc_id").as("y")),
          Seq("band_idx", "band_key"))
        .filter(col("x") < col("y"))
        .select(col("x").as("doc_a"), col("y").as("doc_b")).distinct()
      val hotDiff = capped.unionAll(expect)
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
      val hotTouched = capped
        .filter(col("doc_a") >= 10000000L || col("doc_b") >= 10000000L).count()
      println(f"[scale-smoke] hot-bucket: pairs=$nCapped seconds=$hotSecs%.1f " +
        f"healthyDiff=$hotDiff hotPairs=$hotTouched")
      assert(hotTouched == 0, "stop-bucket pairs leaked through the cap")
      assert(hotDiff == 0, "capped pairs differ from healthy-only ground truth")
      assert(hotSecs < 120,
        f"hot-bucket tier took $hotSecs%.1f s — the df cap is not bounding work")

      // ---- Drop AUDIT on the same adversarial corpus ("no silent caps"):
      // the report must count exactly the one saturated bucket and its
      // 10⁵-row dropped mass — what the capped run above silently skipped
      // is now a measured, surfaced number.
      val audit = Dedup.stopBucketAudit(bands,
        Seq("band_idx", "band_key"), "doc_id").head()
      println(s"[scale-smoke] drop-audit: buckets=${audit.getLong(0)} " +
        s"stop=${audit.getLong(1)} dropped=${audit.getLong(2)} " +
        s"total=${audit.getLong(3)}")
      assert(audit.getLong(1) == 1L,
        s"audit must count exactly the HOT bucket, got ${audit.getLong(1)}")
      assert(audit.getLong(2) == 100000L,
        s"audit must count the hot bucket's full row mass, got ${audit.getLong(2)}")
      assert(audit.getLong(3) == 2100000L,
        s"audit total_rows must cover the whole band relation, got ${audit.getLong(3)}")

      // ---- The STREAMING twin: the same hot bucket arriving through the
      // ingest delta (appendLshBands' new×all against a standing table
      // holding the 10⁵-member bucket). The bounded posting step must keep
      // the batch's delta to the healthy buckets' pairs and finish in
      // seconds — uncapped, one batch doc in the hot bucket fans out 10⁵
      // delta rows per shared band, and a boilerplate BATCH would emit
      // df² of them. State is fabricated directly in the band schema
      // (deterministic synthetic keys), so this tier times ONLY the delta
      // step, not corpus shingling.
      {
        import spark.implicits._
        val standing = bands.select(col("doc_id"),
            col("band_idx"), col("band_key").cast("string").as("band_key"))
          .localCheckpoint(true)
        // one new doc landing in the hot bucket AND one healthy bucket
        val newDoc = Seq((999999999L, 1, "HOT"), (999999999L, 0, "b42"))
          .toDF("doc_id", "band_idx", "band_key")
        val td = System.nanoTime()
        // same shape as Dedup.appendLshBands' delta: touched-key bounded
        // posting (via the production postingPairs buffer bound), joined
        // from the new side
        val posting = standing
          .join(broadcast(newDoc.select(col("band_idx"), col("band_key"))),
            Seq("band_idx", "band_key"), "left_semi")
          .groupBy(col("band_idx"), col("band_key"))
          .agg(graft.ops.BoundedCollect.boundedCollectList(
            col("doc_id"), graft.ops.Dedup.StopBucketDf).as("ys"))
          .filter(col("ys").isNotNull)
        val delta = newDoc.select(col("doc_id").as("x"), col("band_idx"), col("band_key"))
          .join(posting, Seq("band_idx", "band_key"))
          .select(col("x"), explode(col("ys")).as("y"))
          .filter(col("x") =!= col("y"))
          .select(least(col("x"), col("y")).as("doc_a"),
                  greatest(col("x"), col("y")).as("doc_b"))
          .distinct()
          .localCheckpoint(true)
        val nDelta = delta.count()
        val dSecs = (System.nanoTime() - td) / 1e9
        val hotLeaked = delta
          .filter(col("doc_a") >= 10000000L && col("doc_a") < 999999999L).count() +
          delta.filter(col("doc_b") >= 10000000L && col("doc_b") < 999999999L).count()
        val healthyBucketSize = standing
          .filter(col("band_idx") === 0 && col("band_key") === "b42").count()
        println(f"[scale-smoke] delta-hot-bucket: delta=$nDelta " +
          f"healthyBucket=$healthyBucketSize seconds=$dSecs%.1f hotLeaked=$hotLeaked")
        assert(hotLeaked == 0, "hot standing bucket leaked into the streaming delta")
        assert(nDelta == healthyBucketSize,
          s"delta should pair the new doc with exactly the healthy bucket's members")
        assert(dSecs < 60,
          f"streaming delta tier took $dSecs%.1f s — the bound is not holding")
      }
    }

    // ---- Bounded top-k at size: 8M scored rows × 20k groups through the
    // TopK aggregate — the buffer is k-bounded so the shuffle ships
    // ≤ partitions × groups × k rows; invariant checked distributedly:
    // per group exactly k rows, ranks 1..k, scores non-increasing, and
    // every kept score ≥ the group's true kth score from a window pass.
    {
      val k = 10
      val scored = spark.range(0, 8000000).select(
        pmod(xxhash64(col("id") * 31 + 1), lit(20000)).as("g"),
        (pmod(xxhash64(col("id") + 9), lit(1000000)) / lit(1000.0)).as("score"),
        col("id"))
      val top = graft.ops.TopK.topK(k)
      val tk0 = System.nanoTime()
      val kept = scored.groupBy(col("g"))
        .agg(top(col("score"), col("id")).as("t"))
        .select(col("g"), posexplode(col("t")).as(Seq("r0", "s")))
        .select(col("g"), col("s.score").as("score"), col("s.id").as("id"))
        .localCheckpoint(true)
      val keptRows = kept.count()
      val tkSecs = (System.nanoTime() - tk0) / 1e9
      val badGroups = kept.groupBy(col("g")).agg(
          count(lit(1)).as("n"), min(col("score")).as("worst"))
        .filter(col("n") =!= k).count()
      val wk = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(desc("score"), col("id"))
      val missed = scored
        .withColumn("rn", row_number().over(wk)).filter(col("rn") <= k)
        .select(col("g"), col("score"), col("id"))
        .unionAll(kept)
        .groupBy(col("g"), col("score"), col("id"))
        .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
      println(f"[scale-smoke] topk-agg: rows=$keptRows seconds=$tkSecs%.1f " +
        f"badGroups=$badGroups windowDiff=$missed")
      assert(badGroups == 0, "a group did not keep exactly k rows")
      assert(missed == 0, "TopK result differs from the window ground truth")
    }

    // ---- Clustered serving layout tier (round 11, VERDICT #1): the
    // standing band table written through the maintenance sink's
    // (band_idx, band_key)-clustered layout must answer a point probe
    // WITHOUT scanning the collection. Pinned by the parquet scan's
    // numOutputRows — the rows that SURVIVE row-group skipping under the
    // pushed literal IN — against an unclustered copy of the same table:
    // same probe, same answer, near-full-scan row count. Files are capped
    // small so the 2M-row fixture has enough skippable units; at the
    // 100 TB north star the same granularity comes from row groups and
    // page column-indexes inside production-sized files.
    {
      import graft.ops.Dedup
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val base = java.nio.file.Files.createTempDirectory("clustered-probe").toString
      val docs = docCorpus(500000L)
        .withColumn("source", pmod(col("doc_id"), lit(2)).cast("string"))
        .localCheckpoint(true)
      val newBands = Dedup.bands(Dedup.minhashSignaturesHashed(
          Dedup.shingleHashRaw(docs, "doc_id", "text", 3), 16), 16, 4)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .localCheckpoint(true)
      val total = newBands.count()
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "10000")
      val tCl = System.nanoTime()
      graft.sources.Writers.upsertPartitioned(spark, base + "/clustered",
        newBands, "doc_id", Seq("source"),
        sortCols = Seq("band_idx", "band_key"))
      val clSecs = (System.nanoTime() - tCl) / 1e9
      newBands.write.partitionBy("source").parquet(base + "/unclustered")
      spark.conf.unset("spark.sql.files.maxRecordsPerFile")

      // probe doc 12300 has a planted near-dup (12301 shares 39/40 tokens)
      val probeText = docs.filter(col("doc_id") === 12300L).head().getString(1)
      def probeScan(path: String): (Set[(Long, Long)], Long) = {
        val standing = spark.read.parquet(path)
        val out = Dedup.probeNearDupsLocal(standing, Seq((12300L, probeText)),
          org.apache.spark.sql.types.LongType, shingleK = 3,
          numHashes = 16, numBands = 4)
        val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        def walk(p: SparkPlan): Seq[SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case o => o +: o.children.flatMap(walk)
        }
        val scanned = walk(out.queryExecution.executedPlan)
          .collect { case f: FileSourceScanExec =>
            f.metrics.get("numOutputRows").map(_.value).getOrElse(0L) }.sum
        (pairs, scanned)
      }
      val (pairsCl, rowsCl) = probeScan(base + "/clustered")
      val (pairsUn, rowsUn) = probeScan(base + "/unclustered")
      println(f"[scale-smoke] clustered-probe: bands=$total " +
        f"clusteredScanRows=$rowsCl (${rowsCl * 100.0 / total}%.1f%%) " +
        f"unclusteredScanRows=$rowsUn (${rowsUn * 100.0 / total}%.1f%%) " +
        f"pairs=${pairsCl.size} writeSeconds=$clSecs%.1f")
      assert(pairsCl == pairsUn, "layout changed the probe answer")
      assert(pairsCl.contains((12300L, 12301L)),
        s"planted near-dup missing from the point probe: $pairsCl")
      assert(rowsCl < total / 10,
        f"clustered probe scanned ${rowsCl * 100.0 / total}%.1f%% of the " +
          "standing table — the pushed filter is not skipping files")
      assert(rowsUn > total / 2,
        "control broken: the unclustered copy should be a near-full scan")

      // ---- Serving-session twin (round 12): the SAME 2M-row standing
      // table behind a compiled-plan session — the warm per-request path
      // must hold its latency class at scale (the scan is a few row
      // groups; the plan is cached), and a GDPR delete through the
      // cascade must be visible to the LIVE session at its very next
      // request (generation auto-refresh — no new session, no caller
      // convention).
      {
        import spark.implicits._
        val standingPath = base + "/clustered"
        val session = new graft.engine.Serving.LshProbeSession(
          spark.read.parquet(standingPath),
          org.apache.spark.sql.types.LongType,
          shingleK = 3, numHashes = 16, numBands = 4,
          standingPath = Some(standingPath))
        val pool = docs.filter(col("doc_id").between(12300L, 12319L))
          .select(col("doc_id"), col("text")).collect()
          .map(r => Seq((r.getLong(0): Any, r.getString(1))))
        // parity with the fresh path on the big table, then warm medians
        val viaSession = session.probeRows(pool.head)
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(viaSession == pairsCl,
          "session probe diverged from the fresh path at 2M rows")
        (0 until 4).foreach(i => session.probeRows(pool(i % pool.length)))
        val lat = (0 until 20).map { i =>
          val t0 = System.nanoTime()
          session.probeRows(pool(i % pool.length))
          (System.nanoTime() - t0) / 1e6
        }.sorted
        val warmMs = lat(lat.length / 2)
        // GDPR: purge the planted near-dup through the cascade — the live
        // session must stop serving it at the next request
        graft.streaming.Sinks.lshIndexDelete(standingPath,
          Seq((12301L, "1")).toDF("doc_id", "source"),
          partitionCols = Seq("source"))
        val after = session.probeRows(pool.head)
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[scale-smoke] serving-session: warmMs=$warmMs%.0f " +
          f"pairsBefore=${viaSession.size} pairsAfter=${after.size}")
        assert(!after.exists(p => p._1 == 12301L || p._2 == 12301L),
          s"live session served the purged victim at 2M rows: $after")
        assert(after == viaSession.filterNot(p =>
            p._1 == 12301L || p._2 == 12301L),
          "post-delete session answer is not exactly the survivor set")
      }
    }

    // ---- IVF point-probe layout twin (round 11, VERDICT #2): the
    // standing assignment written by the maintenance sink
    // (label-partitioned, centroid_id-sorted files) must serve
    // `IvfIndex.probePoint`'s literal IN with row-group skipping — scan
    // rows ≈ the probed clusters' mass, never the collection. Control:
    // the same assignment written unsorted reads everything.
    {
      import graft.engine.IvfIndex
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val base = java.nio.file.Files.createTempDirectory("ivf-probe-layout").toString
      val corpus = vecCorpus(2000000L)
        .select(col("id").as("vec_id"), col("embedding"),
          pmod(col("id"), lit(2)).cast("int").as("label"))
        .localCheckpoint(true)
      val total = corpus.count()
      val built = IvfIndex.build(corpus, "vec_id", "embedding", nCentroids = 64)
      graft.sources.Writers.swapWrite(built.centroids, base + "/centroids")
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "10000")
      val tAs = System.nanoTime()
      graft.streaming.Sinks.indexAppendPartitioned(base + "/assigned",
        spark.read.parquet(base + "/centroids"), "vec_id", "embedding",
        Seq("label"))(corpus, 0L)
      val asSecs = (System.nanoTime() - tAs) / 1e9
      graft.ops.Similarity.ivfAssign(corpus, built.centroids, "vec_id", "embedding")
        .write.partitionBy("label").parquet(base + "/unclustered")
      spark.conf.unset("spark.sql.files.maxRecordsPerFile")
      def probeTop(path: String): (Long, Long) = {
        val assigned = spark.read.parquet(path)
        val centroids = spark.read.parquet(base + "/centroids")
        val pruned = IvfIndex.probePoint(assigned, centroids, queryVec, nProbe = 8)
        val top = graft.ops.Similarity.knnCosine(pruned, queryVec,
          "vec_id", "embedding", k = 1, threshold = -1.0)
        val id = top.collect().head.getLong(0)
        def walk(p: SparkPlan): Seq[SparkPlan] = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case o => o +: o.children.flatMap(walk)
        }
        val scanned = walk(top.queryExecution.executedPlan)
          .collect { case f: FileSourceScanExec =>
            f.metrics.get("numOutputRows").map(_.value).getOrElse(0L) }.sum
        (id, scanned)
      }
      val (topCl, rowsCl) = probeTop(base + "/assigned")
      val (topUn, rowsUn) = probeTop(base + "/unclustered")
      val exactTop = graft.ops.Similarity.knnCosine(corpus, queryVec,
        "vec_id", "embedding", k = 1, threshold = -1.0).collect().head.getLong(0)
      println(f"[scale-smoke] ivf-probe-layout: rows=$total " +
        f"clusteredScanRows=$rowsCl (${rowsCl * 100.0 / total}%.1f%%) " +
        f"unclusteredScanRows=$rowsUn (${rowsUn * 100.0 / total}%.1f%%) " +
        f"top1=$topCl sinkSeconds=$asSecs%.1f")
      assert(topCl == topUn && topCl == exactTop,
        s"layout changed the probe answer: $topCl / $topUn / exact $exactTop")
      assert(rowsCl < total / 4,
        f"clustered IVF probe scanned ${rowsCl * 100.0 / total}%.1f%% — the " +
          "pushed centroid IN is not skipping row groups")
      assert(rowsUn > total / 2,
        "control broken: the unclustered assignment should be a near-full scan")
    }

    println("[scale-smoke] PASS")
    spark.stop()
  }
}
