package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns._

/** Text-analysis operators for a training-data pipeline over
  * `documents(doc_id, text)` — language ID, quality scoring, token counting,
  * fingerprinting. All single-pass, codegen-friendly column expressions
  * (no UDFs), so they vectorize over a 100 TB scan.
  *
  * The reference counts tokens for budget enforcement
  * (`memory/memory_graph.py:7005-7010`) and trims content
  * (`memory_graph.py:5175`); the rest generalizes that surface to corpus
  * curation (BASELINE.json north star).
  */
object TextAnalysis {

  /** n-gram / stopword marker sets per language. Tiny, deterministic —
    * a heuristic classifier, not a model. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "de" -> Seq("der", "die", "und", "das", "von", "mit", "ein"))

  /** Language ID: marker-token hit count per language; highest count wins,
    * ties break alphabetically; no hits → "und" (undetermined). */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = array_distinct(tokens(col(textCol)))
    val scoreCols = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      size(array_intersect(toks, array(markers.map(lit): _*))).as(s"score_$lang")
    }
    val withScores = docs.select(Seq(col(idCol).as("doc_id")) ++ scoreCols: _*)
    val best = langMarkers.keys.toSeq.sorted.foldLeft(
      (lit("und"), lit(0))) { case ((bestLang, bestScore), lang) =>
      val s = col(s"score_$lang")
      (when(s > bestScore, lit(lang)).otherwise(bestLang),
       when(s > bestScore, s).otherwise(bestScore))
    }
    withScores
      .withColumn("pred_lang", best._1)
      .withColumn("marker_hits", best._2)
      .select(col("doc_id"), col("pred_lang"), col("marker_hits"))
      .orderBy(col("doc_id"))
  }

  /** Quality features + a composite score in [0,1]:
    * 0.4·min(1, tokens/64) + 0.3·type-token-ratio + 0.3·(1 − stopword-ratio).
    * (length / diversity / stopword mix — the usual cheap quality prior.) */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stop = array(langMarkers.values.flatten.toSeq.distinct.sorted.map(lit): _*)
    docs
      .withColumn("toks", tokens(col(textCol)))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_stop",
        size(filter(col("toks"), t => array_contains(stop, t))).cast("long"))
      // NOTE: ratios of small integers stay UNROUNDED — both engines compute
      // the identical single division, so the doubles are bit-identical,
      // whereas round() itself disagrees across engines exactly at the
      // .xxxx5 boundaries these ratios structurally land on.
      .withColumn("ttr", col("n_distinct") / col("n_tokens"))
      .withColumn("stop_ratio", col("n_stop") / col("n_tokens"))
      .withColumn("quality",
        lit(0.4) * least(lit(1.0), col("n_tokens") / lit(64.0)) +
        lit(0.3) * (col("n_distinct") / col("n_tokens")) +
        lit(0.3) * (lit(1.0) - col("n_stop") / col("n_tokens")))
      .select(col(idCol).as("doc_id"), col("n_tokens"), col("n_distinct"),
        col("ttr"), col("stop_ratio"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Language-stratified corpus sample: per predicted language, the first
    * `quota` docs in deterministic pseudo-random order (`hash60` of the doc
    * id — a seedable shuffle both engines reproduce, unlike rand()). The
    * training-mix curation step: cap each language's contribution instead of
    * letting the majority language swamp the sample. One window shuffle,
    * partitioned by language — skew-safe because the per-partition work is a
    * top-`quota` heap, not a full sort at 100 TB (TakeOrdered semantics via
    * rank pruning; for extreme single-language skew pre-salt the window). */
  def languageStratifiedSample(docs: DataFrame, idCol: String, textCol: String,
                               quota: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("pred_lang"))
      .orderBy(hash60(col("doc_id").cast("string")), col("doc_id"))
    langId(docs, idCol, textCol)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= quota)
      .select(col("doc_id"), col("pred_lang"), col("sample_rank"))
      .orderBy(col("pred_lang"), col("sample_rank"))
  }

  /** Temperature-scaled mixture sampling — the exponential-smoothing domain
    * mix of multilingual pretraining (mBERT / XLM-R style): per-domain
    * quotas ∝ count^alpha renormalized over `budget`, so alpha < 1 upweights
    * rare domains and alpha = 1 is proportional sampling; every quota gets
    * at least one doc. Each domain then fills its quota in the hash60
    * deterministic pseudo-random order (reproducible across retries, unlike
    * rand()).
    *
    * The smoothing arithmetic runs DRIVER-side over the per-domain counts —
    * a catalog-sized collect (bounded by domain cardinality, same contract
    * as the schema registry), folded in sorted-domain order so the double
    * sum is bit-reproducible. At alpha = 0.5 the smoothing is sqrt, which
    * IEEE 754 rounds identically in every engine — the whole sample is then
    * hash-exact against a SQL oracle; other alphas go through pow, where
    * 1-ulp libm drift could flip a floor at a quota boundary.
    *
    * The data-side plan is one groupBy(domain) count + one quota-bounded
    * window per domain — top-`quota` heap semantics, skew-safe at 100 TB
    * for the same reason as `languageStratifiedSample`. */
  def mixtureSample(docs: DataFrame, idCol: String, domainCol: String,
                    budget: Int, alpha: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    def smooth(c: Long): Double =
      if (alpha == 0.5) math.sqrt(c.toDouble) else math.pow(c.toDouble, alpha)
    val counts = docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.foldLeft(0.0) { case (acc, (_, c)) => acc + smooth(c) }
    val quotas = counts.map { case (dom, c) =>
      (dom, math.max(1L, math.floor(budget * (smooth(c) / total)).toLong))
    }
    import spark.implicits._
    val quotaDf = broadcast(quotas.toSeq.toDF("domain", "q"))
    val w = Window.partitionBy(col("domain"))
      .orderBy(hash60(col(idCol).cast("string")), col(idCol))
    docs.select(col(idCol), col(domainCol).as("domain"))
      .withColumn("sample_rank", row_number().over(w))
      .join(quotaDf, "domain")
      .filter(col("sample_rank") <= col("q"))
      .select(col(idCol), col("domain"), col("sample_rank"))
      .orderBy(col("domain"), col("sample_rank"))
  }

  /** Unigram LM surprise — the perplexity-proxy quality filter (the CCNet /
    * Gopher "LM score" step with the LM reduced to the corpus's own unigram
    * distribution): per document, the mean negative log-likelihood
    * −Σ ln(count(w)/total) / n over its tokens. Outlier-high surprise marks
    * gibberish/rare-token soup; outlier-low marks boilerplate. One explode +
    * two aggregations; the corpus total is a one-row broadcast.
    *
    * `avg_surprise` is emitted as float32: ln is the one non-correctly-
    * rounded op in the pipeline (JVM vs libm may differ 1 ulp on some
    * arguments), and the per-doc sum order is partition-dependent —
    * float32 absorbs both (≤1e-13 relative drift vs 1e-7 resolution),
    * the same discipline as the TF-IDF scores (q75). */
  def unigramSurprise(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .localCheckpoint(true) // read by the vocab agg, the total, and the join
    val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val total = toks.count().toDouble
    toks.join(counts, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(-log(col("c") / lit(total))).as("s"))
      .select(col("doc_id"), col("n_tokens"),
        (col("s") / col("n_tokens")).cast("float").as("avg_surprise"))
      .orderBy(col("doc_id"))
  }

  /** BPE merge training — `rounds` sequential merge rounds of byte-pair
    * encoding over the corpus vocabulary (Sennrich et al.): words become
    * space-joined symbol sequences; each round counts adjacent symbol
    * pairs weighted by word frequency, merges the most frequent pair
    * (ties toward the lexicographically smallest), and rewrites the vocab
    * by a literal space-bounded `replace` — greedy left-to-right
    * non-overlapping, identical in any SQL engine, which makes the whole
    * trainer oracle-able. (The boundary-space trick consumes the
    * separator, so a back-to-back run like `l l l l` merges every other
    * occurrence in one round — deterministic; the missed occurrences
    * merge in a later round, as in any BPE trainer variant.) Returns the
    * merge table (round, pair, merged, cnt).
    *
    * Scale posture: everything operates on the DISTINCT-word vocabulary
    * (orders of magnitude smaller than the corpus — the corpus is touched
    * once for word counts); each round is one explode + one aggregation +
    * one TakeOrdered(1) + one map-side rewrite. The merge decision is
    * inherently sequential, so rounds are driver-coordinated like every
    * iterative op here; the per-round collect is ONE row. */
  def bpeMerges(docs: DataFrame, idCol: String, textCol: String,
                rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    val words = docs.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(expr(
        """concat_ws(' ', transform(sequence(1, length(w)),
          |  i -> substring(w, i, 1)))""".stripMargin).as("sym"), col("c"))
      .localCheckpoint(true)
    var vocab = words
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val top = vocab
        .select(col("c"), explode(expr(
          """transform(sequence(1, size(split(sym, ' ')) - 1),
            |  i -> concat(element_at(split(sym, ' '), i), ' ',
            |              element_at(split(sym, ' '), i + 1)))"""
            .stripMargin)).as("pair"))
        .groupBy("pair").agg(sum(col("c")).as("n"))
        .orderBy(desc("n"), col("pair"))
        .limit(1).head()
      val (pair, n) = (top.getString(0), top.getLong(1))
      val merged = pair.replace(" ", "")
      merges += ((r, pair, merged, n))
      // lit() columns, never SQL-literal interpolation — corpus-derived
      // symbols may contain quotes/backslashes the SQL parser would eat
      vocab = vocab.select(
        trim(replace(concat(lit(" "), col("sym"), lit(" ")),
          lit(s" $pair "), lit(s" $merged "))).as("sym"), col("c"))
        .localCheckpoint(true)
    }
    import spark.implicits._
    merges.result().toDF("round", "pair", "merged", "cnt")
      .orderBy(col("round"))
  }

  /** Apply `rounds` trained BPE merges to encode every document: each
    * word becomes its character-symbol sequence, the merge list is
    * applied in training order (one exhaustive left-to-right replace per
    * merge — the same update rule the trainer itself uses on its vocab),
    * and the result is summarized per document as (n_words, n_chars,
    * n_bpe_tokens) — the compression-ratio observability a tokenizer
    * pipeline needs before committing to a merge table. Merges are a
    * `rounds`-row driver collect (bounded by construction); the encode
    * pass itself is one map-side expression chain + one per-doc
    * aggregation — no joins, no windows, scales with the corpus scan. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                rounds: Int): DataFrame = {
    val merges = bpeMerges(docs, idCol, textCol, rounds).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val base = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 1)
      .withColumn("nch", length(col("w")).cast("long"))
      .withColumn("sym", expr(
        """concat_ws(' ', transform(sequence(1, length(w)),
          |  i -> substring(w, i, 1)))""".stripMargin))
    val encoded = merges.foldLeft(base) { case (d, (pair, merged)) =>
      // lit() columns, never SQL-literal interpolation (same rule as the
      // trainer): corpus-derived symbols may contain metacharacters
      d.withColumn("sym",
        trim(replace(concat(lit(" "), col("sym"), lit(" ")),
          lit(s" $pair "), lit(s" $merged "))))
    }
    encoded
      .withColumn("n_sym", size(split(col("sym"), " ")).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("nch")).as("n_chars"),
        sum(col("n_sym")).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Curriculum phase assignment: within each domain, rank documents by
    * quality (clean → noisy) into `phases` equal ntile buckets, then give
    * every phase a deterministic hash60 shuffle order — a curriculum
    * training run streams phase 1 of every domain first, in reproducible
    * pseudo-random order inside each phase. Both windows are partitioned
    * (domain, then domain×phase) — there is no corpus-wide sort, so the
    * plan holds at 100 TB as long as single domains fit their executors
    * (pre-salt a mega-domain if not). */
  def curriculum(docs: DataFrame, idCol: String, textCol: String,
                 domainCol: String, phases: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = quality(docs, idCol, textCol).select(col("doc_id"), col("quality"))
      .join(docs.select(col(idCol).as("doc_id"), col(domainCol).as("domain")),
        "doc_id")
    val byQuality = Window.partitionBy(col("domain"))
      .orderBy(desc("quality"), col("doc_id"))
    val byHash = Window.partitionBy(col("domain"), col("phase"))
      .orderBy(hash60(col("doc_id").cast("string")), col("doc_id"))
    q.withColumn("phase", ntile(phases).over(byQuality))
      .withColumn("pos", row_number().over(byHash))
      .select(col("doc_id"), col("domain"), col("phase"), col("pos"))
      .orderBy(col("domain"), col("phase"), col("pos"))
  }

  /** Token counting: whitespace tokens, characters, a chars/4 budget
    * estimate, and a BPE-ish regex segmentation (letter runs | digit runs |
    * single other-glyphs — the GPT-2-style pre-tokenizer shape, restricted
    * to an ASCII pattern both regex engines read identically). */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
        col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("ws_tokens"),
        length(col(textCol)).cast("long").as("n_chars"),
        ceil(length(col(textCol)) / 4.0).cast("long").as("bpe_est"),
        size(regexp_extract_all(lower(col(textCol)), lit(BpeishPattern), lit(0)))
          .cast("long").as("re_tokens"))
      .orderBy(col("doc_id"))

  /** Corpus-frequency repetition signal (the Gopher/RefinedWeb duplicate
    * n-gram fraction): per document, the share of its DISTINCT word n-grams
    * that are "common" — occurring in ≥ `minDocFreq` distinct documents
    * corpus-wide. A high fraction marks boilerplate/template content a
    * training mix should downweight or drop.
    *
    * Scale shape: one explode → two aggregations, all shuffled on the
    * high-cardinality gram key (no hot keys by construction). The exploded
    * grams relation is consumed twice and deliberately NOT cached — it is
    * corpus-sized, and re-scanning the source beats spilling a cache of it
    * at 100 TB; the common-gram set (post-HAVING) is the only small
    * intermediate. Docs shorter than n tokens surface with zero grams. */
  def duplicateNgramStats(docs: DataFrame, idCol: String, textCol: String,
                          n: Int, minDocFreq: Long): DataFrame = {
    val grams = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        explode_outer(array_distinct(shingles(col("toks"), n))).as("gram"))
    val common = grams.filter(col("gram").isNotNull)
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocFreq)
      .select(col("gram"), lit(1).as("is_common"))
    grams.join(common, Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("gram")).as("n_grams"),
        count(col("is_common")).as("n_common"))
      .withColumn("dup_frac",
        col("n_common").cast("double") / greatest(col("n_grams"), lit(1L)))
      .orderBy(col("doc_id"))
  }

  /** Within-document repetition (the Gopher/RefinedWeb top-n-gram rule):
    * per document, the share of n-gram OCCURRENCES covered by the single
    * most frequent n-gram (`top_gram_frac` — Gopher drops docs where the
    * top 2-gram covers > 0.20) and the distinct/total gram ratio
    * (`distinct_ratio` — low means loopy, templated text).
    *
    * Unlike `duplicateNgramStats` (corpus-frequency, needs a gram shuffle)
    * this is entirely MAP-SIDE: the gram array is sorted per row and the
    * longest equal-run measured with one aggregate() fold — zero shuffles,
    * zero corpus-sized intermediates, embarrassingly parallel over a 100 TB
    * scan. Docs shorter than n tokens report zero grams and 0.0 ratios. */
  /** Longest equal-run in a SORTED array = the count of its most frequent
    * element — one aggregate() fold, no shuffle. */
  private[ops] def longestRun(sorted: Column): Column = {
    val acc0 = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"))
    aggregate(
      sorted, acc0,
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
  }

  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame = {
    val withGrams = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), shingles(col("toks"), n).as("grams"))
      .select(col("doc_id"), col("grams"), array_sort(col("grams")).as("sorted"))
    withGrams
      .withColumn("top_gram_count", longestRun(col("sorted")))
      .withColumn("n_grams", size(col("grams")).cast("long"))
      .withColumn("n_distinct_grams", size(array_distinct(col("grams"))).cast("long"))
      .withColumn("top_gram_frac",
        col("top_gram_count").cast("double") / greatest(col("n_grams"), lit(1L)))
      .withColumn("distinct_ratio",
        col("n_distinct_grams").cast("double") / greatest(col("n_grams"), lit(1L)))
      .select(col("doc_id"), col("top_gram_count"), col("n_grams"),
        col("n_distinct_grams"), col("top_gram_frac"), col("distinct_ratio"))
  }

  /** PII scrubbing: mask emails, phone-shaped numbers, then any long digit
    * run, in that order (emails first so their digits aren't half-eaten by
    * the number pass). Patterns stay in the Java∩RE2 common subset so the
    * DuckDB oracle applies the same semantics; Spark's regexp_replace is
    * global by default (DuckDB needs the 'g' flag). Pure map work — no
    * shuffle, fully codegen'd, scales linearly. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
  val LongDigitPattern = "[0-9]{7,}"
  def scrubPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol,
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>"),
        LongDigitPattern, "<ID>"))

  /** End-to-end corpus curation decision — the composed training-mix gate a
    * 100 TB pipeline runs nightly: exact-dup survivorship, quality floor,
    * repetition ceiling, with language ID carried for downstream
    * stratification. One verdict per document with the FIRST failing rule
    * as the reason (dup > low_quality > repetitive > ok).
    *
    * Scale shape: ONE scan computes every per-document feature map-side
    * (token stats, language scores, sorted-gram run fold) — no joins
    * between the feature operators, no repeated tokenization. The only
    * shuffle pair is the exact-dup keeper join (groupBy content hash →
    * min id, re-join on the hash). Thresholds are caller-set; the
    * individual operators (langId/quality/repetitionStats/Dedup.exact)
    * remain the à-la-carte versions of the same expressions. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double, maxTopGramFrac: Double, n: Int = 2): DataFrame = {
    val stop = array(langMarkers.values.flatten.toSeq.distinct.sorted.map(lit): _*)
    val base = docs.select(col(idCol).as("doc_id"),
      sha2(col(textCol), 256).as("__sha"), tokens(col(textCol)).as("toks"))
    val withGrams = base.select(col("doc_id"), col("__sha"), col("toks"),
      shingles(col("toks"), n).as("grams"))
    val langScoreCols = langMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      size(array_intersect(array_distinct(col("toks")), array(ms.map(lit): _*)))
        .as(s"__s_$lang")
    }
    val feat = withGrams.select(Seq(
      col("doc_id"), col("__sha"),
      size(col("toks")).cast("long").as("__nt"),
      size(array_distinct(col("toks"))).cast("long").as("__nd"),
      size(filter(col("toks"), t => array_contains(stop, t))).cast("long").as("__ns"),
      longestRun(array_sort(col("grams"))).as("__best"),
      size(col("grams")).cast("long").as("__ng")) ++ langScoreCols: _*)
    // same fold as langId: first language (alphabetical) with the max wins
    val best = langMarkers.keys.toSeq.sorted.foldLeft((lit("und"), lit(0))) {
      case ((bl, bs), lang) =>
        val sc = col(s"__s_$lang")
        (when(sc > bs, lit(lang)).otherwise(bl), when(sc > bs, sc).otherwise(bs))
    }
    val keepers = docs.groupBy(sha2(col(textCol), 256).as("__sha"))
      .agg(min(col(idCol)).as("__keep_id"))
    feat.join(keepers, "__sha")
      .withColumn("pred_lang", best._1)
      // identical operand order to `quality` — bit-stable across engines
      .withColumn("quality",
        lit(0.4) * least(lit(1.0), col("__nt") / lit(64.0)) +
        lit(0.3) * (col("__nd") / col("__nt")) +
        lit(0.3) * (lit(1.0) - col("__ns") / col("__nt")))
      .withColumn("top_gram_frac",
        col("__best").cast("double") / greatest(col("__ng"), lit(1L)))
      .withColumn("reason",
        when(col("doc_id") =!= col("__keep_id"), lit("dup"))
          .when(col("quality") < minQuality, lit("low_quality"))
          .when(col("top_gram_frac") > maxTopGramFrac, lit("repetitive"))
          .otherwise(lit("ok")))
      .withColumn("keep", col("reason") === "ok")
      .select(col("doc_id"), col("pred_lang"), col("quality"),
        col("top_gram_frac"), col("reason"), col("keep"))
  }

  /** TF-IDF top terms per document — the lexical summary/keyword operator
    * (BM25's corpus-statistics machinery, reused for per-doc term salience
    * instead of query scoring). Smoothed idf = ln((N+1)/(df+1)) + 1, so
    * every-doc terms still score > 0 and the log argument never hits 0.
    *
    * Scale shape: explode → (doc, term) count [shuffle 1] → vocabulary df
    * [shuffle 2, vocab-sized] → join tf⋈df on term [same key as shuffle 2]
    * → per-doc top-N window [shuffle 3, key doc]. The tf relation is
    * persisted — three consumers (df, N, weights) would otherwise re-run
    * the corpus explode per consumer. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .persist()
    val dfTbl = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = tf.agg(countDistinct(col("doc_id")).as("n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(desc("weight"), col("token"))
    val out = tf.join(dfTbl, "token").crossJoin(broadcast(stats))
      .withColumn("weight",
        col("c").cast("double") *
          (log((col("n") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
      .select(col("doc_id"), col("token"), col("rnk"), col("weight"))
      .localCheckpoint(true) // materialize, then release the cache below
    tf.unpersist()
    out
  }

  /** Collocation mining by lift (= exp(PMI)): for token pairs co-occurring
    * in at least `minPairDocs` documents, lift = P(a,b) / (P(a)·P(b)) =
    * n_ab·N / (df_a·df_b) on presence counts. Pure integer arithmetic + one
    * IEEE division — bit-identical across engines (no transcendental in the
    * compared output; PMI itself is just ln(lift)).
    *
    * The pair blow-up is bounded the standard way: only the `topTokens`
    * most-frequent tokens participate (broadcast list), so the within-doc
    * self-join emits ≤ C(topTokens, 2) distinct keys regardless of corpus
    * size, and the heavy explode is never shuffled raw — it collapses into
    * the (token_a, token_b) aggregation with map-side combine. */
  def collocationLift(docs: DataFrame, idCol: String, textCol: String,
                      topTokens: Int, minPairDocs: Long, topN: Int): DataFrame = {
    val nDocs = docs.count() // parquet metadata count — not a data scan
    // persisted: the corpus-wide explode feeds the vocab aggregation AND
    // both legs of the within-doc self-join — uncached it would re-run
    // tokenize+explode per consumer (same shape tfidfTopTerms caches)
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(tokens(col(textCol)))).as("token"))
      .persist()
    val top = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), asc("token")).limit(topTokens)
    val t = tok.join(broadcast(top), "token")
    val out = t.select(col("doc_id"), col("token").as("token_a"), col("df").as("df_a"))
      .join(t.select(col("doc_id"), col("token").as("token_b"), col("df").as("df_b")),
        "doc_id")
      .filter(col("token_a") < col("token_b"))
      .groupBy(col("token_a"), col("token_b"), col("df_a"), col("df_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairDocs)
      .withColumn("lift", (col("n_ab") * lit(nDocs)) / (col("df_a") * col("df_b")))
      .select(col("token_a"), col("token_b"), col("n_ab"), col("lift"))
      .orderBy(desc("lift"), col("token_a"), col("token_b"))
      .limit(topN)
      .localCheckpoint(true) // materialize, then release the cache below
    tok.unpersist()
    out
  }

  /** Asymmetric shingle CONTAINMENT (Broder): for candidate pairs sharing
    * at least one informative k-shingle, C(A,B) = |S(A)∩S(B)| / |S(A)|.
    * Unlike Jaccard (symmetric — misses a short doc quoted inside a long
    * one), containment finds subset-duplicates: a doc mostly contained in
    * another is a quote/excerpt/expansion the dedup stage should collapse.
    * Reference dedups on whole-content equality (memory_graph.py:10325);
    * containment is its subset-aware corpus-scale generalization.
    *
    * Scale shape: inverted-index self-join on the shingle key — pairs exist
    * only where shingles are SHARED, and shingles occurring in more than
    * `maxShingleDf` documents are dropped first (stop-shingles carry no
    * identity signal and are exactly the keys that would quadratically blow
    * up the self-join at 100 TB). Containment is computed over that
    * informative-shingle space, denominator included, so dropping frequent
    * shingles never inflates the score. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       k: Int, maxShingleDf: Long,
                       minContainment: Double): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(shingles(col("toks"), k))).as("shingle"))
      .localCheckpoint(true) // read by the df agg AND the informative join
    val informative = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf)
      .select(col("shingle"))
    val kept = sh.join(informative, Seq("shingle"))
      .localCheckpoint(true) // read by sizes + both sides of the self-join
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // posting-list pair generation — one shuffle of `kept`, no string-keyed
    // self-join; see Dedup.postingPairs. The posting cap tracks the
    // caller's df filter (maxShingleDf already bounds every kept bucket),
    // so a cap above the default never silently re-drops admitted keys.
    val inter = Dedup.postingPairs(kept, "shingle", "doc_id",
      maxDf = math.max(Dedup.StopBucketDf.toLong, maxShingleDf)
        .min(Int.MaxValue.toLong).toInt)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("containment_a",
        col("n_inter").cast("double") / col("n_a"))
      .withColumn("containment_b",
        col("n_inter").cast("double") / col("n_b"))
      // threshold AND emit the UNROUNDED ratio: 0.79996 must not round up
      // past a 0.8 cut, and round() itself disagrees between Spark
      // (HALF_UP) and DuckDB at .xxxx5 boundaries a small-int ratio like
      // 1/32 lands on exactly. Identical divide sequences are
      // bit-identical across engines — no rounding needed.
      .filter(greatest(col("containment_a"), col("containment_b")) >= minContainment)
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        col("containment_a"), col("containment_b"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Per-document mean negative log-likelihood under an add-one-smoothed
    * BIGRAM language model trained on the corpus itself:
    * p(w2|w1) = (C(w1,w2)+1) / (C(w1)+V), score = −Σ ln p / n_bigrams.
    * The context-sensitive upgrade of `unigramSurprise`: word salad with
    * plausible unigrams but implausible transitions (shuffled text, keyword
    * stuffing) scores high; fluent prose scores low — the perplexity-filter
    * stage of a training-data pipeline (CCNet-style), with the LM itself
    * computed distributively instead of shipped in.
    *
    * Scale shape: one ordered-bigram explode consumed by two aggregations
    * (both map-side combinable, shuffled on high-cardinality token keys),
    * vocabulary size reduced to one broadcast scalar row; scoring re-joins
    * the doc bigrams against the count tables. No corpus-sized cache, no
    * windows. */
  def bigramSurprise(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokens() splits on single spaces, so irregular whitespace yields ""
    // tokens — drop them BEFORE building bigrams and the vocab, exactly as
    // unigramSurprise does, or "" skews both the LM counts and V.
    val toks = docs.select(col(idCol).as("doc_id"),
      filter(tokens(col(textCol)), w => length(w) > 0).as("t"))
    // Spark sequence(1, 0) is DESCENDING, not empty — guard short docs
    // (docs with <2 non-empty tokens have no bigrams and are absent from
    // the output by design; score them upstream with unigramSurprise).
    val bi = toks
      .select(col("doc_id"),
        explode(when(size(col("t")) >= 2,
          expr("""transform(sequence(1, size(t) - 1),
                 |  i -> struct(element_at(t, i) AS w1,
                 |              element_at(t, i + 1) AS w2))""".stripMargin))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .localCheckpoint(true) // read by c2, c1, and the scoring join
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = toks.select(explode(col("t")).as("w")).agg(
      count_distinct(col("w")).as("v"))
    bi.join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("nll",
        -log((col("c2").cast("double") + 1.0) /
          (col("c1").cast("double") + col("v").cast("double"))))
      .groupBy(col("doc_id"))
      // float32, not round(,4): ln drift + partition-dependent sum order
      // make the low double bits nondeterministic (same discipline as
      // unigramSurprise / q75 TF-IDF).
      .agg(count(lit(1)).as("n_bigrams"),
        avg(col("nll")).cast("float").as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** Per-document mean NLL under a Jelinek–Mercer INTERPOLATED bigram LM:
    * p(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/total — the smoothing the
    * CCNet-style perplexity filter actually uses (pure add-one bigram,
    * `bigramSurprise`, over-penalizes rare-but-fluent transitions; the
    * unigram back-off floor fixes that). Same distributed shape as its
    * siblings: token-keyed aggregations, one broadcast scalar row, a
    * scoring re-join; no corpus-sized cache. Output float32 (ln drift). */
  def interpolatedSurprise(docs: DataFrame, idCol: String, textCol: String,
                           lambda: Double): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1): $lambda")
    val toks = docs.select(col(idCol).as("doc_id"),
      filter(tokens(col(textCol)), w => length(w) > 0).as("t"))
    val bi = toks
      .select(col("doc_id"),
        explode(when(size(col("t")) >= 2,
          expr("""transform(sequence(1, size(t) - 1),
                 |  i -> struct(element_at(t, i) AS w1,
                 |              element_at(t, i + 1) AS w2))""".stripMargin))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .localCheckpoint(true) // read by c2, c1, and the scoring join
    val uni = toks.select(explode(col("t")).as("w"))
      .localCheckpoint(true) // read by the unigram counts and the total
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val cu = uni.groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val total = uni.count().toDouble
    bi.join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .join(cu.withColumnRenamed("w", "w2"), Seq("w2"))
      .withColumn("p",
        lit(lambda) * (col("c2").cast("double") / col("c1")) +
          lit(1.0 - lambda) * (col("cu").cast("double") / lit(total)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(-log(col("p"))).cast("float").as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  /** Per-document character-class profile: ratios of letter / digit /
    * whitespace / punctuation-and-other characters plus the dominant
    * class — the cheap script/garbage detector every crawl-cleaning
    * pipeline runs before tokenization (mojibake, base64 blobs, and
    * markup soup all show up as an anomalous class mix). Pure map-side
    * per-row expressions: shuffle-free at any corpus size. */
  def charClassProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = length(col("text_c"))
    def classLen(re: String) =
      length(regexp_replace(col("text_c"), re, ""))
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text_c"))
      .withColumn("n_chars", n.cast("long"))
      // count by deleting the complement class and measuring what's left
      .withColumn("n_letter", classLen("[^a-zA-Z]").cast("long"))
      .withColumn("n_digit", classLen("[^0-9]").cast("long"))
      .withColumn("n_space", classLen("[^ ]").cast("long"))
      .withColumn("n_other",
        (col("n_chars") - col("n_letter") - col("n_digit") - col("n_space")))
      .withColumn("letter_ratio",
        col("n_letter").cast("double") / col("n_chars"))
      .withColumn("dominant",
        when(col("n_letter") >= greatest(col("n_digit"), col("n_space"), col("n_other")), "letter")
          .when(col("n_digit") >= greatest(col("n_space"), col("n_other")), "digit")
          .when(col("n_space") >= col("n_other"), "space")
          .otherwise("other"))
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"), col("n_letter"), col("n_digit"),
        col("n_space"), col("n_other"), col("letter_ratio"), col("dominant"))
      .orderBy(col("doc_id"))
  }

  /** DSIR-style importance scoring (Xie et al., "Data Selection via
    * Importance Resampling"): score every document by its mean
    * log-likelihood RATIO between a target-domain unigram LM and the
    * whole-corpus base LM (both add-one smoothed over the shared corpus
    * vocabulary). High scorers look like the target domain; selecting
    * top-N importance-resamples a general crawl toward a quality/domain
    * target without training a classifier. Token-keyed aggregations +
    * two broadcast scalar rows + one scoring join — the q145/q149 cost
    * family; no corpus-sized state. Score emitted float32 (ln drift). */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 targetPred: Column): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), targetPred.as("is_target"),
        explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .localCheckpoint(true) // base counts, target counts, vocab, scoring
    val base = toks.groupBy(col("w")).agg(count(lit(1)).as("cb"))
    val target = toks.filter(col("is_target"))
      .groupBy(col("w")).agg(count(lit(1)).as("ct"))
    val scalars = toks.agg(
      count(lit(1)).cast("double").as("nb"),
      sum(when(col("is_target"), 1L).otherwise(0L)).cast("double").as("nt"),
      count_distinct(col("w")).cast("double").as("v"))
    toks.join(base, "w")
      .join(target, Seq("w"), "left")
      .crossJoin(broadcast(scalars))
      .withColumn("lr",
        log(((coalesce(col("ct"), lit(0L)).cast("double") + 1.0) /
          (col("nt") + col("v"))) /
          ((col("cb").cast("double") + 1.0) / (col("nb") + col("v")))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        avg(col("lr")).cast("float").as("importance"))
  }

  /** Sparse TF-IDF cosine similarity join (the AllPairs/PPJoin family):
    * pairwise cosine over L2-normalized tf-idf vectors, materialized ONLY
    * for document pairs sharing at least one informative token — an
    * inverted-index self-join whose keys carry a document-frequency cap
    * (`df <= maxTokenDf`). A token present in half the corpus contributes
    * ~N²/4 candidate pairs and near-zero idf weight, so the cap drops
    * exactly the keys that would quadratically blow up the join while
    * moving the dot product only by the low-weight tail; norms are
    * computed over the FULL vector (idf from the whole corpus) so the
    * capped similarity is a true lower bound of full cosine. The lexical
    * twin of the embedding near-dup join (`Similarity.nearDupPairs`);
    * reference analog: Qdrant cosine retrieval (memory_graph.py:1015)
    * re-expressed for sparse lexical vectors.
    *
    * Scale shape: two token-keyed aggregations + one df-capped
    * inverted-index self-join + one pair-keyed aggregation — every
    * intermediate is bounded by (docs × informative tokens); no cartesian
    * anywhere. Output `sim` is float32 (idf's ln + partition-order sums
    * make double low bits nondeterministic).
    *
    * DECISION (pinned, do not re-litigate): this self-join deliberately
    * stays a join rather than converting to the posting-list pair shape
    * every count-based consumer uses ([[graft.ops.Dedup.postingPairs]]).
    * The pair aggregate here SUMS FLOATING-POINT products, and the posting
    * rewrite reorders which (pair, token) contributions meet in which
    * partial buffer — at float32 emit precision that is usually safe, but
    * q150's oracle hash sits on sums of near-cancelling products where a
    * reorder can flip the last bit. The join costs 0.9 s at sf0.1 and its
    * keys are already df-capped (`maxTokenDf`), so the conversion buys one
    * exchange on a non-headline query against a real hash-stability risk.
    * Revisit only with an order-stable summation (sort each pair's
    * contributions before the fold, as the oracle effectively does) AND a
    * re-pinned oracle. */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                       maxTokenDf: Long, threshold: Double): DataFrame = {
    val tk = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val tf = tk.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // read by the doc count, df agg, and weights
    val n = tf.select(col("doc_id")).distinct().count().toDouble
    val dft = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = tf.join(dft, "token")
      .withColumn("weight",
        col("c").cast("double") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0))
    val nrm = w.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("weight") * col("weight"))).as("nrm"))
    val unit = w.join(nrm, "doc_id")
      .filter(col("df") <= maxTokenDf)
      .select(col("doc_id"), col("token"), (col("weight") / col("nrm")).as("u"))
      .localCheckpoint(true) // both sides of the self-join
    unit.as("a")
      .join(unit.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.u") * col("b.u")).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("sim").cast("float").as("sim"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Document fingerprint: sha256 of the content, the min shingle hash
    * (a 1-hash minhash — stable under small edits), and shingle count. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String, shingleK: Int): DataFrame =
    docs
      .withColumn("toks", tokens(col(textCol)))
      .withColumn("sh", shingles(col("toks"), shingleK))
      .select(
        col(idCol).as("doc_id"),
        sha2(col(textCol), 256).as("content_sha"),
        // native kernel: same values as transform(sh, hash60) without the
        // per-shingle interpreted lambda + hex/parse round-trip
        array_min(shingleHashes(col("toks"), shingleK)).as("min_shingle_hash"),
        size(array_distinct(col("sh"))).cast("long").as("n_shingles"))
      .orderBy(col("doc_id"))
}
