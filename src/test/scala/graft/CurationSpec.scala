package graft

import graft.ops.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("gopherGate: metrics are exact and the gate flips per rule") {
    val docs = Seq(
      (1L, "the cat sat on the mat and a dog ran by it now"), // 12 tokens, stopwordy
      (2L, "aa aa aa aa aa aa aa aa aa aa aa aa"),             // repetition: distinct 1/12
      (3L, "zz")                                               // too short
    ).toDF("doc_id", "text")
    val out = Curation.gopherGate(docs, "doc_id", "text",
        minTokens = 5, maxTokens = 20, minMeanWordLen = 1.0,
        maxMeanWordLen = 5.0, minStopHits = 2, minDistinctRatio = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getFloat(2), r.getLong(3), r.getFloat(4), r.getBoolean(5)))).toMap
    val (n1, mw1, sh1, dr1, p1) = out(1L)
    assert(n1 === 13L)
    // "the cat sat on the mat and a dog ran by it now": 3+3+3+2+3+3+3+1+3+3+2+2+3 = 34
    assert(mw1 === (34.0 / 13).toFloat)
    assert(sh1 >= 3L) // the, the, and, a, in? -> the×2, and, a, plus "in"? no; ≥3 is safe
    assert(dr1 > 0.5f && p1)
    val (_, _, _, dr2, p2) = out(2L)
    assert(dr2 === (1.0 / 12).toFloat && !p2) // repetition floor rejects
    assert(!out(3L)._5) // token-count floor rejects
  }

  test("topNgramFraction: dominant bigram and lexicographic tie-break") {
    val docs = Seq(
      (1L, "a b a b a b c"), // "a b" ×3 of 6 bigram positions
      (2L, "x y z w")        // all unique → tie broken to lexicographically first
    ).toDF("doc_id", "text")
    val out = Curation.topNgramFraction(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getFloat(4)))).toMap
    assert(out(1L) === (("a b", 3L, 6L, 0.5f)))
    assert(out(2L) === (("x y", 1L, 3L, (1.0 / 3).toFloat))) // "x y" < "y z" < "z w"
  }

  test("segmentBoilerplate: cross-doc duplicate flagged, intra-doc repeat is not") {
    val docs = Seq(
      (1L, "p q r a b c x y z"),  // shares "p q r" with doc 2
      (2L, "p q r d e f"),
      (3L, "m n o m n o")         // repeats ITS OWN segment -> df counts docs, not rows
    ).toDF("doc_id", "text")
    val out = Curation.segmentBoilerplate(docs, "doc_id", "text", segLen = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getFloat(3)))).toMap
    assert(out(1L) === ((3L, 1L, (1.0 / 3).toFloat)))
    assert(out(2L) === ((2L, 1L, 0.5f)))
    assert(out(3L) === ((2L, 0L, 0.0f))) // self-repetition is q176's signal, not boilerplate
  }

  test("winnowing: shared run of w+k-1 tokens guarantees a shared fingerprint") {
    // k=3, w=4: any shared run of 6 tokens must produce >= 1 shared fp.
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight $shared nine ten"),
      (3L, "totally different words entirely here now then")
    ).toDF("doc_id", "text")
    val fps = Curation.winnowingFingerprints(docs, "doc_id", "text", k = 3, w = 4)
    val f1 = fps.filter($"doc_id" === 1L).select("fp").as[Long].collect().toSet
    val f2 = fps.filter($"doc_id" === 2L).select("fp").as[Long].collect().toSet
    val f3 = fps.filter($"doc_id" === 3L).select("fp").as[Long].collect().toSet
    assert((f1 & f2).nonEmpty)
    assert((f1 & f3).isEmpty && (f2 & f3).isEmpty)
    // density: winnowing keeps far fewer than all shingles
    val nShingles1 = 12 - 3 + 1
    assert(f1.size < nShingles1)
  }

  test("winnowingPairs: df cap drops ubiquitous fingerprints, minShared filters") {
    // the run "c1 c2 c3 c4 c5 c6" appears in ALL 5 docs -> its fingerprints
    // land in >= 4 docs (window sets differ between the short and long docs,
    // so not necessarily all 5) and the df cap of 3 drops every one of them;
    // only docs 1 and 2 ALSO share a private run (df=2, kept).
    val common = "c1 c2 c3 c4 c5 c6"
    val priv = "p1 p2 p3 p4 p5 p6 p7"
    val docs = Seq(
      (1L, s"$common a1 $priv"),
      (2L, s"$common b1 $priv b2"),
      (3L, s"$common x1 x2 x3"),
      (4L, s"$common y1 y2 y3"),
      (5L, s"$common z1 z2 z3")
    ).toDF("doc_id", "text")
    val fps = Curation.winnowingFingerprints(docs, "doc_id", "text", k = 3, w = 4)
    val pairs = Curation.winnowingPairs(fps, minShared = 1, maxFpDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    // no pair among 3,4,5 survives: their only overlap was the df-capped run
    assert(!pairs.exists { case (x, y) => x >= 3L && y >= 3L })
  }
}
