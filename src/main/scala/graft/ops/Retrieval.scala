package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns._

/** The reference's retrieval-pipeline operators as declarative Spark plans:
  * ACL filtering (F1), typed metadata filters (F4), chunk→memory rollup (J2),
  * score fusion with default scores (W3), stratified per-source sampling with
  * quotas (W1/W2), time-decayed counters (A4), tier-1 ranking (A5).
  *
  * Everything is a Column/DataFrame transform — predicate pushdown, partial
  * aggregation and join strategy come from Catalyst.
  */
object Retrieval {

  /** Requesting principal for ACL checks (auth resolution is out of engine
    * scope; the engine sees the resolved principal). */
  case class Principal(
      userId: String,
      workspaces: Seq[String] = Nil,
      roles: Seq[String] = Nil,
      organizations: Seq[String] = Nil,
      namespaces: Seq[String] = Nil)

  /** F1 — OR across access arrays (the reference's Qdrant `should` clause,
    * `memory/memory_graph.py:5816-5905`): owner OR direct user grant OR
    * workspace/role overlap OR org/namespace membership. Array predicates
    * (`array_contains`/`arrays_overlap`) are codegen'd and pushable. */
  def aclPredicate(p: Principal,
                   userCol: String = "user_id",
                   userRead: String = "user_read_access",
                   wsRead: String = "workspace_read_access",
                   roleRead: String = "role_read_access",
                   orgRead: String = "organization_read_access",
                   nsRead: String = "namespace_read_access"): Column = {
    def overlap(c: String, vals: Seq[String]): Option[Column] =
      if (vals.isEmpty) None
      else Some(arrays_overlap(col(c), array(vals.map(lit): _*)))
    val clauses = Seq(
      Some(col(userCol) === lit(p.userId)),
      Some(array_contains(col(userRead), p.userId)),
      overlap(wsRead, p.workspaces),
      overlap(roleRead, p.roles),
      overlap(orgRead, p.organizations),
      overlap(nsRead, p.namespaces)).flatten
    clauses.reduce(_ || _)
  }

  /** Reciprocal-rank fusion (the modern standard for W3's multi-source
    * merge, complementing the reference's score-max/last-wins scheme):
    * rrf(doc) = Σ_spaces 1/(kConst + rank_space(doc)). Rank-based, so
    * incomparable score scales (cosine vs dot vs BM25) fuse without
    * calibration. Each input holds (idCol, score); rank = (score desc, id).
    * The per-space terms sum in FIXED space order via conditional
    * aggregation — bit-reproducible regardless of row arrival order.
    *
    * PRECONDITION: inputs are per-space top-k CANDIDATE lists (k rows, the
    * output of a KNN/BM25 limit), not full corpora — the global rank
    * window deliberately runs on one task, which is exactly right for
    * k-sized lists and exactly wrong for anything corpus-sized. */
  def rrfFuse(spaces: Seq[DataFrame], idCol: String, kConst: Int = 60): DataFrame = {
    require(spaces.nonEmpty, "rrfFuse needs at least one ranked input")
    val tagged = spaces.zipWithIndex.map { case (df, i) =>
      val w = Window.orderBy(desc("score"), col(idCol))
      df.select(col(idCol), row_number().over(w).as("rank"), lit(i).as("space"))
    }
    val perSpace = spaces.indices.map(i =>
      min(when(col("space") === i, col("rank"))).as(s"r$i"))
    val total = spaces.indices.map(i =>
      coalesce(lit(1.0) / (lit(kConst) + col(s"r$i")), lit(0.0))).reduce(_ + _)
    tagged.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(perSpace.head, perSpace.tail: _*)
      .withColumn("rrf", total)
      .select(col(idCol), col("rrf"))
  }

  /** F4 — the reference's typed customMetadata filter semantics
    * (`memory_graph.py:5966-6046`): per key, a list means ANY-overlap, a bool
    * means equality, a *bare number means a `>=` lower bound*, a range object
    * means gte/lte/gt/lt, a string means equality. Encoded once here.
    * Numeric/bool comparisons use try_cast: customMetadata is OPEN-schema, so
    * a non-numeric value under a numeric predicate must be a non-match (the
    * reference's `value_matches` behavior) — under ANSI mode a plain cast
    * would fail the whole query on the first stray string. Found by the
    * PropertySpec F4 model check. */
  sealed trait MetaPred { def toPredicate(value: Column): Column }
  final case class MetaEq(v: String) extends MetaPred {
    def toPredicate(value: Column): Column = value === lit(v)
  }
  final case class MetaBool(v: Boolean) extends MetaPred {
    def toPredicate(value: Column): Column = value.try_cast("boolean") === lit(v)
  }
  final case class MetaAtLeast(v: Double) extends MetaPred {
    def toPredicate(value: Column): Column = value.try_cast("double") >= lit(v)
  }
  final case class MetaAnyOf(vs: Seq[String]) extends MetaPred {
    def toPredicate(value: Column): Column = value.isin(vs.map(x => x: Any): _*)
  }
  final case class MetaRange(gte: Option[Double] = None, lte: Option[Double] = None,
                             gt: Option[Double] = None, lt: Option[Double] = None) extends MetaPred {
    def toPredicate(value: Column): Column = {
      val d = value.try_cast("double")
      Seq(gte.map(d >= _), lte.map(d <= _), gt.map(d > _), lt.map(d < _))
        .flatten.reduceOption(_ && _).getOrElse(lit(true))
    }
  }

  /** Apply a metadata filter against a map<string,string> column (AND over keys). */
  def metaFilter(mapCol: Column, preds: Map[String, MetaPred]): Column =
    preds.map { case (k, p) => p.toPredicate(element_at(mapCol, k)) }
      .reduceOption(_ && _).getOrElse(lit(true))

  /** Same semantics over a JSON-string metadata column. */
  def metaFilterJson(jsonCol: Column, preds: Map[String, MetaPred]): Column =
    preds.map { case (k, p) => p.toPredicate(get_json_object(jsonCol, s"$$.$k")) }
      .reduceOption(_ && _).getOrElse(lit(true))

  /** J2 — chunk hits → base memory, keeping the best chunk score
    * (`memory_graph.py:6553-6560`): map-side combinable, one shuffle. */
  def chunkRollup(chunkHits: DataFrame, chunkIdCol: String, scoreCol: String): DataFrame =
    chunkHits
      .withColumn("memory_id", baseId(col(chunkIdCol)))
      .groupBy(col("memory_id"))
      .agg(max(col(scoreCol)).as("best_score"), count(lit(1)).as("n_chunks"))

  /** W3 — fuse per-source score sets: union, fill missing scores with the
    * graph-branch default 0.7 (`memory_graph.py:6323-6327`), keep one row
    * per id via one max-by aggregation. Two merge policies:
    *  - default (`lastSourceWins = false`): best score wins, priority breaks
    *    ties — the fusion a ranking pipeline usually wants;
    *  - `lastSourceWins = true`: the LAST-listed source overwrites earlier
    *    ones regardless of score — the reference's dict-update semantics
    *    (`all_similarity_scores` merge, memory_graph.py:6346-6358). */
  def fuseScores(sources: Seq[(String, DataFrame)], idCol: String,
                 scoreCol: String, defaultScore: Double = 0.7,
                 lastSourceWins: Boolean = false): DataFrame = {
    val tagged = sources.zipWithIndex.map { case ((name, df), pri) =>
      df.select(
        col(idCol).as("id"),
        coalesce(col(scoreCol).cast("double"), lit(defaultScore)).as("score"),
        lit(name).as("source"),
        lit(pri).as("pri"))
    }
    val best =
      if (lastSourceWins) max(struct(col("pri"), col("score"), col("source")))
      else max(struct(col("score"), col("pri"), col("source")))
    tagged.reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(best.as("best"))
      .select(col("id"), col("best.score").as("score"), col("best.source").as("source"))
  }

  /** W1/W2 — stratified per-source sampling: rank within source, keep
    * `quota(source)` rows (`memory_graph.py:6289-6330`). Deterministic
    * tie-break on id. */
  def stratifiedSample(df: DataFrame, sourceCol: String, scoreCol: String,
                       idCol: String, quota: Map[String, Int], defaultQuota: Int): DataFrame = {
    val w = Window.partitionBy(col(sourceCol)).orderBy(desc(scoreCol), col(idCol))
    val quotaCol = quota.foldLeft(lit(defaultQuota)) { case (acc, (s, q)) =>
      when(col(sourceCol) === s, lit(q)).otherwise(acc)
    }
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= quotaCol)
      .drop("rn")
  }

  /** Deterministic weighted sampling without replacement, per stratum —
    * the training-mix construction step: draw k rows per group with
    * inclusion probability proportional to `weightCol` (Efraimidis–
    * Spirakis A-ES: rank by u^(1/w), here by the monotone-equivalent
    * ln(u)/w). The uniform u derives from the portable hash60 of the id
    * instead of rand(), so the draw is reproducible across engines, runs,
    * and retries — rerunning a failed stage cannot change the sample.
    * Rows with weight <= 0 or null are excluded (zero mass). One window
    * shuffle on the stratum; the per-partition work is a top-k heap. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     strataCol: String, k: Int): DataFrame = {
    // (hash60+1)/2^60 ∈ (0, 1] — 2^60 is exactly representable, so both
    // engines compute the identical double
    val u = (hash60(col(idCol).cast("string")) + lit(1L)) / lit(math.pow(2, 60))
    val key = log(u) / col(weightCol)
    val w = Window.partitionBy(col(strataCol)).orderBy(desc("__aes_key"), col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("__aes_key", key)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("__aes_key")
  }

  /** A4 — decayed counter recompute over an event log: each event contributes
    * value·0.5^(Δdays/halfLife) (`memory_management.py:3177-3190`). Batch
    * twin of the streaming EMA; map-side partial sums. */
  def decayedCounters(events: DataFrame, keyCol: String, tsCol: String,
                      valCol: String, now: Column, halfLifeDays: Double): DataFrame =
    events.groupBy(col(keyCol))
      .agg(
        round(sum(col(valCol) * timeDecay(col(tsCol), now, halfLifeDays)), 4).as("decayed_sum"),
        count(lit(1)).as("hits"))

  /** A5 — tier-1 ranking score (`memory_management.py:4044-4051`):
    * 0.5·log1p(hits) + 0.3·ema + 0.2·conf, blended 0.7·cite + 0.3·cache when
    * a citation score exists. */
  def tier1Score(hits: Column, ema: Column, conf: Column): Column =
    lit(0.5) * log1p(hits) + lit(0.3) * ema + lit(0.2) * conf

  def tier1Blend(cacheScore: Column, citeScore: Column): Column =
    when(citeScore.isNotNull, lit(0.7) * citeScore + lit(0.3) * cacheScore)
      .otherwise(cacheScore)

  /** F5 — OMO safety filter (`shared_types.py:2555+`, enforcement
    * `memory_routes_v1.py:2000-2035`): consent must not be 'none', risk is
    * an ordinal (none < sensitive < flagged) bounded by maxRisk. */
  val riskOrdinal: Map[String, Int] = Map("none" -> 0, "sensitive" -> 1, "flagged" -> 2)

  def omoPredicate(consentCol: Column, riskCol: Column, maxRisk: String): Column = {
    val ord = riskOrdinal.foldLeft(lit(99)) { case (acc, (name, o)) =>
      when(riskCol === name, lit(o)).otherwise(acc)
    }
    consentCol =!= "none" && ord <= lit(riskOrdinal(maxRisk))
  }

  /** A2 — last-wins dedup by key (`memory_graph.py:9113-9115`): keep the
    * newest row per key, deterministic tie-break. */
  def lastWins(df: DataFrame, keyCol: String, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** W2 — adaptive quota filling (`memory_graph.py:6330-6372`): take the
    * per-source quota first, then fill the remaining `totalK − quota·nSources`
    * slots from the leftovers by global score order. */
  def adaptiveFill(df: DataFrame, sourceCol: String, scoreCol: String,
                   idCol: String, quota: Int, nSources: Int, totalK: Int): DataFrame = {
    val w = Window.partitionBy(col(sourceCol)).orderBy(desc(scoreCol), col(idCol))
    val ranked = df.withColumn("rn", row_number().over(w))
    val base = ranked.filter(col("rn") <= quota)
    val fill = ranked.filter(col("rn") > quota)
      .orderBy(desc(scoreCol), col(idCol))
      .limit(math.max(totalK - quota * nSources, 0))
    base.unionByName(fill).drop("rn")
  }

  /** BM25 lexical top-k over `docs(idCol, textCol)` for a literal bag of
    * query terms — the keyword leg a hybrid retrieval stack runs next to
    * vector KNN (the reference's lexical rerank features,
    * `memory_graph.py:7001-7090`, generalized to corpus scoring).
    *
    * Shape (2 shuffles, both on doc id / none corpus-wide beyond the agg):
    * one explode+groupBy pass computes per-doc length and per-term term
    * frequencies as conditional aggregates (map-side combined); corpus
    * stats (N, avgdl, per-term document frequency) reduce to ONE broadcast
    * row; scoring is then a fixed arithmetic expression — term contributions
    * are added in declaration order, never a data-order float sum, so
    * results are bit-reproducible across engines.
    *
    * idf = ln(1 + (N − df + .5)/(df + .5)) (Lucene BM25), k1/b standard. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
      "bm25TopK needs a non-empty, duplicate-free term list")
    val tf = (t: String) => s"tf_${queryTerms.indexOf(t)}"
    // persisted: consumed by the corpus-stats reduction AND the scoring
    // pass — without the cache the corpus explode+aggregate runs twice.
    // Size is #docs × (2 + #terms) longs, tiny next to the corpus.
    val perDoc = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"),
        queryTerms.map(t =>
          sum(when(col("token") === t, 1L).otherwise(0L)).as(tf(t))): _*)
      .persist()
    val statCols = count(lit(1)).as("n_docs") +: avg(col("dl")).as("avgdl") +:
      queryTerms.map(t =>
        sum(when(col(tf(t)) > 0, 1L).otherwise(0L)).as(s"df_${tf(t)}"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val termScore = (t: String) => {
      val tfc = col(tf(t)).cast("double")
      val dfc = col(s"df_${tf(t)}").cast("double")
      val idf = log(lit(1.0) + (col("n_docs") - dfc + lit(0.5)) / (dfc + lit(0.5)))
      idf * tfc * lit(k1 + 1.0) /
        (tfc + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }
    val out = perDoc.crossJoin(broadcast(stats))
      .withColumn("score", queryTerms.map(termScore).reduce(_ + _))
      .filter(col("score") > 0)
      .select(col("doc_id"), col("score"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(k)
      .localCheckpoint(true) // materialize, then release the cache below
    perDoc.unpersist()
    out
  }
}
