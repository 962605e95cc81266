package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words entirely here now"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "one two")                                      // < 3 tokens: no shingles
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length === 4)
    val dupGroup = out.find(_.getLong(2) == 2L).get
    assert(dupGroup.getLong(1) === 1L) // keep_id = min(1, 4)
  }

  test("jaccard pairs finds near-dup above threshold") {
    val out = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // (1,4) exact dup → jaccard 1.0; (1,2) and (2,4) differ in last token:
    // 7 shingles each, 6 shared → 6/8 = 0.75
    assert(out.map(t => (t._1, t._2)).toSet === Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(out.find(t => t._1 == 1L && t._2 == 4L).get._3 === 1.0)
    assert(math.abs(out.find(t => t._1 == 1L && t._2 == 2L).get._3 - 0.75) < 1e-12)
  }

  test("minhash LSH finds the same verified pairs as exact jaccard here") {
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact dup is always caught; high-jaccard pairs caught with these params
    assert(lsh.contains((1L, 4L)))
    assert(lsh.subsetOf(Set((1L, 2L), (1L, 4L), (2L, 4L))))
  }

  test("simhash: identical docs share fingerprint, disjoint docs differ") {
    val out = Dedup.simhash(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === out(4L))
    assert(out(1L) !== out(3L))
    assert(out.values.forall(v => v >= 0 && v < (1L << 16)))
  }

  test("shingleSets drops documents shorter than k tokens") {
    val sh = Dedup.shingleSets(docs, "doc_id", "text", 3)
    assert(sh.filter($"doc_id" === 5L).count() === 0)
  }

  test("shingleSets: per-doc array_distinct == relational distinct, ZERO exchanges") {
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(8) // pre-spread so the parallelism guard is a no-op
    val a = Dedup.shingleSets(corpus, "doc_id", "text", 3)
    val b = Dedup.shingleRaw(corpus, "doc_id", "text", 3).distinct()
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)
    // the whole substrate must be shuffle-free: distinctness is per-doc set
    // semantics, so no exchange of the corpus shingle relation may exist
    val exchanges = a.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, s"shingleSets shuffled:\n${a.queryExecution.executedPlan}")
  }

  test("simhashPairs: banded LSH path returns exactly the all-pairs result") {
    // 40 docs drawn from overlapping token pools so hamming-close pairs exist
    val corpus = (1L to 40L).map { i =>
      val words = (0 until 12).map(j => s"w${(i + j * (1 + i % 3)) % 17}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    // maxDist 3: even 4-bit bands; 4: uneven widths (4,3,3,3,3); 0: one
    // whole-signature band (exact-dup path, 64-shift guard)
    for (maxDist <- Seq(0, 3, 4)) {
      val allPairs = Dedup.simhashPairs(corpus, "doc_id", "text", bits = 16, maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // threshold 0 forces the banded join
      val banded = Dedup.simhashPairs(corpus, "doc_id", "text", bits = 16, maxDist,
          broadcastDocs = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      if (maxDist > 0) assert(allPairs.nonEmpty)
      assert(banded === allPairs, // pigeonhole: banding exact for maxDist < bands
        s"banded != all-pairs at maxDist=$maxDist")
    }
  }

  test("minhashCalibration: exact dup estimates 1.0 with zero error, bounds hold") {
    val out = Dedup.minhashCalibration(docs, "doc_id", "text",
        shingleK = 3, numHashes = 16, numBands = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (est14, true14, err14) = out((1L, 4L)) // exact duplicates
    assert(est14 === 1.0 && true14 === 1.0 && err14 === 0.0)
    out.values.foreach { case (e, t, err) =>
      assert(e >= 0.0 && e <= 1.0 && t >= 0.0 && t <= 1.0)
      assert(err === e - t)
    }
  }

  test("appendLshBands: batch folds reproduce the full-corpus bands and pairs") {
    val corpus = docs.filter(col("doc_id") =!= 5) // only shingle-able docs
    val batch1 = corpus.filter(col("doc_id") <= 2)
    val batch2 = corpus.filter(col("doc_id") > 2)
    val empty = spark.emptyDataset[(Long, Int, String)]
      .toDF("doc_id", "band_idx", "band_key")
    val (state1, delta1) = Dedup.appendLshBands(empty, batch1,
      "doc_id", "text", shingleK = 3, numHashes = 16, numBands = 4)
    val (state2, delta2) = Dedup.appendLshBands(state1, batch2,
      "doc_id", "text", shingleK = 3, numHashes = 16, numBands = 4)
    // folded state == full one-shot band table (min is a monoid)
    val full = Dedup.bands(Dedup.minhashSignatures(
      Dedup.shingleRaw(corpus, "doc_id", "text", 3), 16), 16, 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(rows(state2) === rows(full))
    // union of deltas == full-run candidate pairs
    val fullPairs = Dedup.candidatePairs(full)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val deltas = (delta1.collect() ++ delta2.collect())
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(deltas === fullPairs)
    // the known near/exact-dup cluster {1,2,4} is found incrementally
    assert(deltas.contains((1L, 4L)) && deltas.contains((1L, 2L)))
    // at-least-once redelivery: re-folding batch2 leaves the state unchanged
    val (stateReplay, _) = Dedup.appendLshBands(state2, batch2,
      "doc_id", "text", shingleK = 3, numHashes = 16, numBands = 4)
    assert(rows(stateReplay) === rows(full),
      "replayed batch duplicated band rows in the standing state")
  }

  test("localBandKeys: driver-side band keys are bit-identical to the " +
    "cluster pipeline's (incl. short/null-text docs getting none)") {
    val fixture = Seq(
      ("d1", "alpha beta gamma delta epsilon zeta"),
      ("d2", "two tokens"),                               // < k → no bands
      ("d3", null),                                       // null → no bands
      ("d4", "one two three four five six seven one two"),
      ("d5", "Alpha BETA gamma delta epsilon zeta"))      // lowercase parity
    val docs = fixture.toDF("doc_id", "text")
    val cluster = Dedup.bands(Dedup.minhashSignaturesHashed(
        Dedup.shingleHashRaw(docs, "doc_id", "text", 3), 16), 16, 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val local = fixture.flatMap { case (id, t) =>
      Dedup.localBandKeys(t, 3, 16, 4).map { case (b, k) => (id, b, k) }
    }.toSet
    assert(local === cluster,
      s"driver-side band derivation diverged from the cluster kernels")
    assert(!local.exists(r => r._1 == "d2" || r._1 == "d3"))
    // case-folding parity: d5 is d1 modulo case → identical band keys
    assert(local.filter(_._1 == "d5").map(r => (r._2, r._3))
      === local.filter(_._1 == "d1").map(r => (r._2, r._3)))
  }

  test("localBandKeys: parity with the cluster kernels over randomized " +
    "texts (vocab sizes, token counts, casing, repeated tokens)") {
    val rnd = new scala.util.Random(20260816L)
    val vocab = Vector("alpha", "Beta", "GAMMA", "delta", "e", "zz-9", "x")
    val fixture = (0 until 40).map { i =>
      val n = rnd.nextInt(9) // 0..8 tokens — includes sub-k docs
      val text = (0 until n).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
      (s"r$i", if (i % 13 == 7) null else text)
    }
    val docs = fixture.toDF("doc_id", "text")
    val cluster = Dedup.bands(Dedup.minhashSignaturesHashed(
        Dedup.shingleHashRaw(docs, "doc_id", "text", 3), 16), 16, 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val local = fixture.flatMap { case (id, t) =>
      Dedup.localBandKeys(t, 3, 16, 4).map { case (b, k) => (id, b, k) }
    }.toSet
    assert(local === cluster,
      "randomized parity failed between driver-side and cluster band keys")
  }

  test("probeNearDups guard binds before the driver materializes: an " +
    "over-limit probe fails fast") {
    val standing = Seq((1L, 0, "k")).toDF("doc_id", "band_idx", "band_key")
    val corpus = spark.range(0, Dedup.PointProbeMaxDocs + 1L)
      .select(col("id").as("doc_id"), lit("a b c d").as("text"))
    val e = intercept[IllegalArgumentException] {
      Dedup.probeNearDups(standing, corpus, "doc_id", "text",
        shingleK = 2, numHashes = 16, numBands = 4)
    }
    assert(e.getMessage.contains("POINT-probe path"))
  }
}
