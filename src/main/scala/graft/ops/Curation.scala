package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns._

/** Corpus-curation gates and fingerprints for a training-data pipeline —
  * the rule-based document filters (Gopher-style), repetition signals,
  * boilerplate-segment detection (the line-dedup analog for unstructured
  * text), and winnowing fingerprints (the robust document-overlap sketch).
  *
  * Reference dedups whole content (`memory/memory_graph.py:10325`) and trims
  * by length (`memory_graph.py:5175`); these operators generalize that
  * surface to corpus-scale quality gating per the BASELINE.json north star.
  *
  * Scale posture: every per-document metric is a single-pass higher-order
  * array expression (codegen, shuffle-free); the corpus-level stages
  * (segment df, fingerprint pairs) shuffle only compact derived keys, never
  * raw text more than once.
  */
object Curation {

  private def stopArr =
    array(TextAnalysis.langMarkers.values.flatten.toSeq.distinct.sorted.map(lit): _*)

  /** Gopher-style hard-rule quality gate (Rae et al. 2021, Table A1 shape):
    * token-count bounds, mean-word-length band, minimum stop-word hits, and
    * a distinct-token (repetition) floor, each a cheap exact statistic.
    * Every ratio is ONE division of exact integer sums, so the doubles are
    * bit-identical in any engine and the boolean gate can never flip across
    * re-runs; outputs are float32 only at the emit boundary.
    *
    * One shuffle-free projection over the corpus scan — the 100 TB shape. */
  def gopherGate(docs: DataFrame, idCol: String, textCol: String,
                 minTokens: Int, maxTokens: Int,
                 minMeanWordLen: Double, maxMeanWordLen: Double,
                 minStopHits: Int, minDistinctRatio: Double): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"),
      filter(tokens(col(textCol)), w => length(w) > 0).as("tk"))
    t.filter(size(col("tk")) > 0)
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        (aggregate(col("tk"), lit(0L), (acc, w) => acc + length(w))
          .cast("double") / size(col("tk"))).as("mean_wlen"),
        size(filter(col("tk"), w => array_contains(stopArr, w)))
          .cast("long").as("stop_hits"),
        (size(array_distinct(col("tk"))).cast("double") / size(col("tk")))
          .as("distinct_ratio"))
      .withColumn("passed",
        col("n_tokens").between(minTokens, maxTokens) &&
          col("mean_wlen") >= minMeanWordLen &&
          col("mean_wlen") <= maxMeanWordLen &&
          col("stop_hits") >= minStopHits &&
          col("distinct_ratio") >= minDistinctRatio)
      .select(col("doc_id"), col("n_tokens"),
        col("mean_wlen").cast("float").as("mean_wlen"), col("stop_hits"),
        col("distinct_ratio").cast("float").as("distinct_ratio"),
        col("passed"))
  }

  /** Dominant-n-gram coverage (the Gopher repetition family's
    * "fraction in most common n-gram"): per document, the most frequent
    * word n-gram and the fraction of the document's n-gram positions it
    * occupies. Keyword-stuffed / template text scores high; natural text
    * low. Ties break lexicographically so the winner is unique.
    *
    * Scale: explode collapses into a map-side-combined (doc, gram) count;
    * the argmax window partitions by doc over its DISTINCT grams only
    * (bounded by doc length, never corpus-sized). */
  def topNgramFraction(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"),
      filter(tokens(col(textCol)), w => length(w) > 0).as("tk"))
    val grams = t.filter(size(col("tk")) >= n)
      .select(col("doc_id"),
        explode(shingles(col("tk"), n)).as("gram"))
    val counts = grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
    val totals = grams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(desc("c"), asc("gram"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(totals, "doc_id")
      .select(col("doc_id"), col("gram").as("top_gram"),
        col("c").as("top_count"), col("n_grams"),
        (col("c").cast("double") / col("n_grams")).cast("float").as("frac"))
  }

  /** Corpus-duplicated fixed-length segments — the CCNet line-dedup signal
    * adapted to unstructured text: chop each document into NON-overlapping
    * `segLen`-token segments and flag segments whose text appears in ≥ 2
    * distinct documents; report the per-document boilerplate fraction.
    * (CCNet drops duplicated lines before perplexity filtering; a high
    * dup fraction marks navigation chrome / templates / license headers.)
    *
    * Scale: the only shuffle keys are segment strings (corpus-linear, each
    * counted once with map-side combine) — never a doc×doc product. */
  def segmentBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                         segLen: Int): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"),
      filter(tokens(col(textCol)), w => length(w) > 0).as("tk"))
    val segs = t.filter(size(col("tk")) >= segLen)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), (size(col("tk")) / segLen).cast("int") - 1),
          i => concat_ws(" ", slice(col("tk"), i * segLen + lit(1), lit(segLen)))))
          .as("seg"))
    // distinct docs per segment text; a doc repeating its own segment is
    // repetition (q176's signal), not cross-document boilerplate
    val df = segs.distinct()
      .groupBy(col("seg")).agg(count(lit(1)).as("seg_df"))
    segs.join(df, "seg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("seg_df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        (col("n_dup").cast("double") / col("n_segments")).cast("float"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS sketch): hash every word k-shingle, slide a w-wide window
    * over the hash sequence, and keep the minimum of each full window.
    * Guarantee: any shared run of w+k-1 tokens yields at least one shared
    * fingerprint, while storage is ~2/(w+1) of the shingle count. The
    * selected SET per window is tie-rule-independent (the min VALUE is
    * unique per window even when positions tie), so `distinct` over the
    * window minima is deterministic.
    *
    * Hashes are the engine-portable md5-prefix `hash60`, so an external
    * oracle reproduces every fingerprint bit-for-bit.
    *
    * Scale: one posexplode → one bounded trailing-window min (partition =
    * doc, ordered by position) → distinct on (doc, hash). Nothing
    * corpus-quadratic exists in the build. */
  def winnowingFingerprints(docs: DataFrame, idCol: String, textCol: String,
                            k: Int, w: Int): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"),
      filter(tokens(col(textCol)), x => length(x) > 0).as("tk"))
    // native kernel emits the hashes directly — no shingle strings, and the
    // posexplode carries 8-byte longs instead of k-token strings
    val sh = t.select(col("doc_id"),
      posexplode(shingleHashes(col("tk"), k)).as(Seq("pos", "h")))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    sh.withColumn("minh", min(col("h")).over(win))
      .filter(col("pos") >= w - 1) // full windows only
      .select(col("doc_id"), col("minh").as("fp"))
      .distinct()
  }

  /** Document pairs sharing ≥ `minShared` winnowing fingerprints — the
    * plagiarism/overlap report over the sketch. The self-join runs on the
    * fingerprint key (inverted index), so pairs exist only where
    * fingerprints collide; ubiquitous fingerprints (df > maxFpDf) are
    * dropped first, exactly the stop-shingle cap that keeps the join from
    * going quadratic on boilerplate at 100 TB. */
  def winnowingPairs(fps: DataFrame, minShared: Long,
                     maxFpDf: Long): DataFrame = {
    val informative = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxFpDf)
      .select(col("fp"))
    val kept = fps.join(informative, Seq("fp"))
    // posting-list pair generation per fingerprint bucket — one hash-agg
    // shuffle of `kept` instead of a self-join's two legs; fingerprints
    // are distinct per doc, so the pair multiset is identical. The posting
    // cap tracks the CALLER's df filter (which already bounds every kept
    // bucket), so a maxFpDf above the default stop-bucket cap never
    // silently re-drops keys the informative filter admitted.
    Dedup.postingPairs(kept, "fp", "doc_id",
      maxDf = math.max(Dedup.StopBucketDf.toLong, maxFpDf)
        .min(Int.MaxValue.toLong).toInt)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Character-level Shannon entropy per document — the compressibility /
    * gibberish gate (low entropy = repeated chars or boilerplate, abnormally
    * high = random noise or binary spill). H = log2(n) − (Σ c·log2 c)/n over
    * exact character counts; only the two log terms are floating point, and
    * the emit is float32 so partition-order sum drift in the Σ c·log2 c
    * aggregation can never flip an oracle hash.
    *
    * Scale: one explode + one (doc, char)-keyed count with map-side combine
    * (key cardinality ≤ |doc| × alphabet, combiner output ≤ alphabet per doc
    * per partition), then a doc-keyed agg. Shuffle rows carry 1-char keys —
    * this is a cheap pass even at corpus scale. */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "")).as("ch"))
      .filter(length(col("ch")) > 0)
    val counts = chars.groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
    // ln-based throughout (both engines' natural log agrees in practice —
    // the q145 precedent); log2 builtins differ in last-ulp between engines.
    counts.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_chars"),
        count(lit(1)).as("distinct_chars"),
        sum(col("c") * log(col("c"))).as("clog"))
      .select(col("doc_id"), col("n_chars"), col("distinct_chars"),
        ((log(col("n_chars")) - col("clog") / col("n_chars")) / lit(math.log(2.0)))
          .cast("float").as("entropy"))
      .orderBy(col("doc_id"))
  }

  /** Per-source dedup impact report: how much of each source survives exact
    * dedup and near-dup clustering — duplicate rates, token loss, and the
    * kept-fraction a mixture planner needs before weighting sources. A doc
    * is KEPT iff it is the canonical survivor of its cluster (cluster
    * representative = min doc_id; singletons survive trivially). All counts
    * are exact integers; the two rate columns are single divisions —
    * bit-stable. Inputs: `clusters(doc_id, cluster)` from any pair source
    * (exact-hash groups, MinHash-LSH, SemDeDup …), so the report composes
    * with every dedup path in [[Dedup]]. */
  def dedupImpact(docs: DataFrame, idCol: String, textCol: String,
                  srcCol: String, clusters: DataFrame): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"),
      size(filter(tokens(col(textCol)), w => length(w) > 0)).cast("long").as("n_tokens"))
    val withCluster = base.join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .withColumn("kept", col("cluster") === col("doc_id"))
    withCluster.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("n_tokens")).as("tokens_total"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("tokens_kept"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        (col("n_kept") / col("n_docs")).as("keep_rate"),
        col("tokens_total"), col("tokens_kept"),
        ((col("tokens_total") - col("tokens_kept")) / col("tokens_total"))
          .as("token_loss_rate"))
      .orderBy(col("source"))
  }
}
