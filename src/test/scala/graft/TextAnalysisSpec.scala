package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions.col

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat and the dog ran"),
    (2L, "el perro y el gato en la casa de los vecinos"),
    (3L, "xyzzy plugh quux")
  ).toDF("doc_id", "text")

  test("langId picks the language with most marker hits, 'und' when none") {
    val out = TextAnalysis.langId(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "es")
    assert(out(3L) === "und")
  }

  test("quality: ttr and stopword ratio bounds") {
    val out = TextAnalysis.quality(docs, "doc_id", "text").collect()
    out.foreach { r =>
      val ttr = r.getDouble(3); val stopRatio = r.getDouble(4); val q = r.getDouble(5)
      assert(ttr > 0 && ttr <= 1.0)
      assert(stopRatio >= 0 && stopRatio <= 1.0)
      assert(q > 0 && q <= 1.0)
    }
    val byId = out.map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(byId(3L) > byId(1L)) // no stopwords + all-distinct beats stopword-heavy
  }

  test("tokenCounts: whitespace tokens and bpe estimate") {
    val out = TextAnalysis.tokenCounts(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L)._1 === 10L)
    assert(out(3L) === ((3L, 16L, 4L)))
  }

  test("tokenCounts: BPE-ish regex segments letters, digit runs and glyphs separately") {
    val d = Seq((1L, "abc12 de-f!")).toDF("doc_id", "text")
    // segments: abc | 12 | de | - | f | !  → 6
    val re = TextAnalysis.tokenCounts(d, "doc_id", "text")
      .select("re_tokens").head().getLong(0)
    assert(re === 6L)
  }

  test("fingerprint: identical content → identical fingerprint") {
    val dup = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d f"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.fingerprint(dup, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === out(2L))
    assert(out(1L)._1 !== out(3L)._1)
    assert(out(1L)._3 === 3L) // 5 tokens → 3 distinct 3-shingles
  }

  test("language-stratified sample caps each language at the quota, deterministically") {
    val docs = (
      (1L to 10L).map(i => (i, "the cat of the house is here and to stay")) ++   // en
      (11L to 13L).map(i => (i, "el gato de la casa y los otros que en")) ++     // es
      Seq((20L, "xyzzy plugh"))                                                  // und
    ).toDF("doc_id", "text")
    val out = TextAnalysis.languageStratifiedSample(docs, "doc_id", "text", quota = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byLang = out.groupBy(_._2)
    assert(byLang("en").length === 4)   // 10 candidates capped at quota
    assert(byLang("es").length === 3)   // under quota → all kept
    assert(byLang("und").length === 1)
    assert(byLang("en").map(_._3).sorted === Seq(1, 2, 3, 4))
    // deterministic: a second run picks the identical sample
    val again = TextAnalysis.languageStratifiedSample(docs, "doc_id", "text", quota = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq === again.toSeq)
  }

  test("duplicateNgramStats: boilerplate grams flagged, short docs survive with zero grams") {
    // "a b c" appears in docs 1,2,3 (df=3 → common at minDocFreq=3);
    // every other gram is rarer; doc 5 is too short for any 3-gram
    val docs = Seq(
      (1L, "a b c x y"), (2L, "a b c p q"), (3L, "a b c"),
      (4L, "m n o p q"), (5L, "hi")).toDF("doc_id", "text")
    val out = TextAnalysis.duplicateNgramStats(docs, "doc_id", "text", n = 3, minDocFreq = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((3L, 1L, 1.0 / 3)))  // {a b c, b c x, c x y} — one common
    assert(out(3L) === ((1L, 1L, 1.0)))      // its only gram is the boilerplate
    assert(out(4L) === ((3L, 0L, 0.0)))      // unique content
    assert(out(5L) === ((0L, 0L, 0.0)))      // no grams, not dropped
  }

  test("scrubPii masks email, then phone, then long digit runs — in that order") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org call 555-867-5309 acct 1234567890"),
      (2L, "short num 123456 stays, 1234567 goes"),
      (3L, "clean text untouched")).toDF("id", "text")
    val out = TextAnalysis.scrubPii(df, "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "mail <EMAIL> call <PHONE> acct <ID>")
    assert(out(2L) === "short num 123456 stays, <ID> goes")
    assert(out(3L) === "clean text untouched")
  }

  test("repetitionStats: top-gram coverage and distinct ratio per doc") {
    val docs = Seq(
      (1L, "go go go go go"),        // 2-grams: 4x "go go" → frac 1.0, distinct 1/4
      (2L, "a b a b a b"),           // grams: {a b}x3 {b a}x2 → top 3/5
      (3L, "all words differ here"), // 3 distinct grams, top run 1 → 1/3
      (4L, "solo")                   // no 2-grams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(1L) === ((4L, 4L, 1L, 1.0, 0.25)))
    assert(out(2L) === ((3L, 5L, 2L, 0.6, 0.4)))
    assert(out(3L) === ((1L, 3L, 3L, 1.0 / 3, 1.0)))
    assert(out(4L) === ((0L, 0L, 0L, 0.0, 0.0)))
  }

  test("tfidfTopTerms: distinctive terms outrank ubiquitous ones") {
    val corpus = Seq(
      (1L, "common zebra"),
      (2L, "common words here"),
      (3L, "common words there")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(corpus, "doc_id", "text", topN = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getString(1)).toMap
    // doc 1: "zebra" (df=1, idf ln(2)+1) beats "common" (df=3, idf 1)
    assert(out((1L, 1)) === "zebra")
    assert(out((1L, 2)) === "common")
    // every doc gets exactly topN rows (it has ≥2 distinct terms)
    assert(out.size === 6)
  }

  test("curate: dup beats low_quality beats repetitive beats ok") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the riverbank today"),
      (2L, "go go go go go go"),                      // repetitive (and low ttr)
      (3L, "the quick brown fox jumps over the lazy dog near the riverbank today"), // dup of 1
      (4L, "a the of and to in is a the of and to") // stopword soup → low quality
    ).toDF("doc_id", "text")
    val out = TextAnalysis.curate(corpus, "doc_id", "text",
        minQuality = 0.5, maxTopGramFrac = 0.3)
      .collect().map(r => r.getLong(0) -> ((r.getString(4), r.getBoolean(5)))).toMap
    assert(out(1L) === (("ok", true)))
    assert(out(3L) === (("dup", false)))      // dup wins even though identical quality
    assert(out(4L)._1 === "low_quality")
    assert(out(2L)._1 === "low_quality" || out(2L)._1 === "repetitive")
    // doc 2 must NOT be ok; if its quality clears the floor it's repetitive
    assert(!out(2L)._2)
  }

  test("mixtureSample: sqrt smoothing upweights rare domains, quotas respected") {
    // 900 "web" docs vs 100 "code" docs. Proportional (α=1) would give code
    // 10% of the budget; sqrt smoothing gives it 30/(30+10)=25%.
    val corpus = ((1L to 900L).map(i => (i, "web")) ++
      (901L to 1000L).map(i => (i, "code"))).toDF("doc_id", "source")
    val out = TextAnalysis.mixtureSample(corpus, "doc_id", "source", budget = 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("code") === 25) // floor(100 * 10/40)
    assert(bySrc("web") === 75)  // floor(100 * 30/40)
    // ranks are dense 1..quota within each domain
    assert(out.filter(_._2 == "code").map(_._3).sorted === (1 to 25))
    // deterministic: second run draws the identical sample
    val again = TextAnalysis.mixtureSample(corpus, "doc_id", "source", budget = 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(again.toSet === out.toSet)
  }

  test("bpeMerges: hand-checked merge sequence with frequency weighting and tie order") {
    // vocab: hello×2, bell×1 → r1 pairs: (e l)=3 ties (l l)=3, lexicographic
    // smallest wins; r2 merges (el l); r3: (ell o)=2 ties (h ell)=2, 'e'<'h'
    val corpus = Seq((1L, "hello hello bell")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(corpus, "doc_id", "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1, "e l", "el", 3L),
      (2, "el l", "ell", 3L),
      (3, "ell o", "ello", 2L)))
  }

  test("curriculum: balanced phases per domain, dense positions, clean docs first") {
    val corpus = (1L to 40L).map { i =>
      val txt = if (i % 4 == 0) "a the of and to in is a the of and to" // stopword soup
        else s"document number $i carries distinct useful words like item$i value$i"
      (i, txt, if (i <= 20) "web" else "code")
    }.toDF("doc_id", "text", "source")
    val out = TextAnalysis.curriculum(corpus, "doc_id", "text", "source", phases = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    out.groupBy(_._2).foreach { case (_, rows) =>
      // ntile: 20 docs / 4 phases = 5 each
      assert(rows.groupBy(_._3).view.mapValues(_.length).toMap ===
        Map(1 -> 5, 2 -> 5, 3 -> 5, 4 -> 5))
      // positions dense 1..5 within each phase
      rows.groupBy(_._3).values.foreach { ph =>
        assert(ph.map(_._4).sorted.toSeq === (1 to 5))
      }
      // the low-quality stopword-soup docs are never in phase 1
      rows.filter(_._1 % 4 == 0).foreach { case (_, _, phase, _) =>
        assert(phase >= 2, "stopword soup landed in the cleanest phase")
      }
    }
  }

  test("mixtureSample: every domain gets at least one doc") {
    val corpus = ((1L to 995L).map(i => (i, "big")) ++
      Seq((996L, "tiny"))).toDF("doc_id", "source")
    val out = TextAnalysis.mixtureSample(corpus, "doc_id", "source", budget = 10)
      .collect().map(r => r.getString(1))
    assert(out.count(_ == "tiny") === 1)
  }

  test("repetitionStats plan is shuffle-free (pure map-side fold)") {
    val out = TextAnalysis.repetitionStats(docs, "doc_id", "text", n = 2)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"repetitionStats must not shuffle — per-doc work only:\n$p")
  }

  test("containmentPairs: subset doc is fully contained, asymmetry preserved") {
    // doc 2 is a strict prefix-quote of doc 1: every 3-shingle of doc 2
    // appears in doc 1, so containment_b = 1.0 while containment_a < 1.0.
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta"),
      (3L, "totally unrelated words here now")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.containmentPairs(d, "doc_id", "text",
      k = 3, maxShingleDf = 10L, minContainment = 0.5).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    assert(r.getDouble(4) === 1.0)          // doc 2 fully contained in doc 1
    assert(r.getDouble(3) === 2.0 / 6.0)    // 2 of doc 1's 6 shingles shared
  }

  test("containmentPairs: stop-shingle df cap keeps ubiquitous shingles out " +
    "of the self-join") {
    // 8 docs share one ubiquitous shingle; with the cap below 8 that key
    // contributes NO candidate pairs (it is exactly the key that would
    // explode the self-join quadratically at corpus scale).
    val d = (1L to 8L).map(i => (i, s"common stop shingle unique$i tail$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.containmentPairs(d, "doc_id", "text",
      k = 3, maxShingleDf = 7L, minContainment = 0.01)
    assert(out.count() === 0)
    // with the cap raised the pairs appear — the filter, not the data,
    // was what suppressed them
    val loose = TextAnalysis.containmentPairs(d, "doc_id", "text",
      k = 3, maxShingleDf = 8L, minContainment = 0.01)
    assert(loose.count() === 8L * 7L / 2L)
  }

  test("tfidfCosinePairs: exact copies reach sim 1.0; df cap drops " +
    "stop-token-only pairs") {
    val d = Seq(
      (1L, "quantum flux capacitor resonance"),
      (2L, "quantum flux capacitor resonance"),      // exact copy of 1
      (3L, "the the the common words only"),
      (4L, "the the the common words only other")    // shares only capped tokens
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfCosinePairs(d, "doc_id", "text",
      maxTokenDf = 10L, threshold = 0.9).collect()
    // (1,2) are exact copies; (3,4) are near-copies via their shared
    // low-df tokens — both legitimately clear 0.9
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 2L), (3L, 4L)))
    val s12 = out.find(r => r.getLong(0) == 1L).get.getFloat(2)
    assert(math.abs(s12 - 1.0f) < 1e-6f)
    // with every token df-capped at 1 the inverted index is empty → no pairs
    val capped = TextAnalysis.tfidfCosinePairs(d, "doc_id", "text",
      maxTokenDf = 1L, threshold = 0.0)
    assert(capped.count() === 0)
  }

  test("bpeEncode: merges compress repeated character pairs; counts exact") {
    // Replace passes are left-to-right NON-OVERLAPPING (the trailing
    // space of a match is consumed), so "a b a b" -> "ab a b" in round 1;
    // round 2's winner is "a b" AGAIN (ties break lexically, ' ' < 'b'),
    // taking "ab a b" -> "ab ab". Same rule in trainer, encoder, and the
    // DuckDB oracle — the spec pins the exact behavior.
    val d = Seq(
      (1L, "abab abab abab"),
      (2L, "abab xy"),
      (3L, "q")                   // 1-char word: untouched by merges
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(d, "doc_id", "text", rounds = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: 3 words, 12 chars, "a b a b" -> "ab a b" -> "ab ab" = 2 syms
    assert(out(1L) === ((3L, 12L, 6L)))
    // doc 2: "abab" -> 2 syms, "xy" -> "x y" stays 2 syms
    assert(out(2L) === ((2L, 6L, 4L)))
    assert(out(3L) === ((1L, 1L, 1L)))
  }

  test("dsirScores: target-looking docs score above base-looking docs") {
    // target = docs 1,2 (share vocabulary "alpha beta"); doc 3 uses the
    // same words as the target, doc 4 uses words the target never has
    val d = Seq(
      (1L, true, "alpha beta alpha beta"),
      (2L, true, "alpha beta gamma"),
      (3L, false, "alpha beta alpha"),
      (4L, false, "zeta eta theta iota")
    ).toDF("doc_id", "is_t", "text")
    val out = TextAnalysis.dsirScores(d, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getFloat(2)).toMap
    assert(out(3L) > out(4L),
      s"target-vocabulary doc must out-score off-vocabulary doc: $out")
  }

  test("interpolatedSurprise: unigram back-off floors unseen-context cost " +
    "below pure add-one bigram for frequent words") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "the cat sat on the rug")
    ).toDF("doc_id", "text")
    val inter = TextAnalysis.interpolatedSurprise(d, "doc_id", "text", 0.7)
      .collect().map(r => r.getLong(0) -> r.getFloat(2)).toMap
    // all three docs share n-gram structure; scores are finite and close
    assert(inter.values.forall(v => v > 0 && v < 10))
    // doc 3 recombines transitions seen in docs 1-2 → not the max surprise
    assert(inter(3L) <= inter.values.max)
  }

  test("charClassProfile: exact class counts and dominant pick") {
    val d = Seq(
      (1L, "abc 12!"),          // 3 letters, 2 digits, 1 space, 1 other
      (2L, "    "),             // all spaces
      (3L, "12345")             // all digits
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charClassProfile(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getString(7)))).toMap
    assert(out(1L) === ((7L, 3L, 2L, 1L, 1L, "letter")))
    assert(out(2L) === ((4L, 0L, 0L, 4L, 0L, "space")))
    assert(out(3L) === ((5L, 0L, 5L, 0L, 0L, "digit")))
  }

  test("bigramSurprise: empty tokens filtered; short docs absent; repeated " +
    "bigrams score lower than novel ones") {
    val d = Seq(
      (1L, "a b  a b a b"),     // double space → "" token must be dropped
      (2L, "x y"),              // one bigram
      (3L, "solo")              // <2 tokens → no bigrams, absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprise(d, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val byId = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getFloat(2)))).toMap
    // doc 1: tokens a b a b a b after filtering "" → 5 bigrams (ab×3, ba×2)
    assert(byId(1L)._1 === 5L)
    assert(byId(2L)._1 === 1L)
    // frequent (a,b) transitions are less surprising than the once-seen (x,y)
    assert(byId(1L)._2 < byId(2L)._2)
  }
}
