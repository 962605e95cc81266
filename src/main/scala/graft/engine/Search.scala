package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ast.{GraphQuery, QueryCompiler}
import graft.functions.Fns.baseId
import graft.functions.VectorFunctions._
import graft.ops.{Rerank, Reranker, LexicalReranker, Retrieval}
import graft.ops.Retrieval.{MetaPred, Principal}

/** The flagship read path — the reference's
  * `find_related_memory_items_async` (`memory/memory_graph.py:5721-7120`,
  * traced in SURVEY §3.1) as ONE declarative Spark plan:
  *
  *   chunks → ACL filter (F1) → metadata filter (F4) → cosine KNN over the
  *   embedded query, ×3 oversampled (V1) → chunk→memory rollup keeping best
  *   score (J2) → hydration join to `memories` (J1) → exclude-id (F6) →
  *   global top-k (W4) → optional rerank (W5).
  *
  * Scale shape: the ACL/meta predicates and the column pruning reach the
  * chunk scan (chunks are partitionable by tenant); the query vector is a
  * broadcast literal; the only shuffles are the rollup groupBy (on
  * memory_id, map-side combinable) and the hydration join (broadcast when
  * the candidate set is small — it is ≤ 3k rows by construction).
  */
object Search {

  case class SearchRequest(
      queryText: String,
      principal: Principal,
      topK: Int = 20,
      metaFilters: Map[String, MetaPred] = Map.empty,
      namespaceId: Option[String] = None,
      excludeMemoryId: Option[String] = None,
      rerank: Boolean = false)

  val OversampleFactor = 3          // memory_graph.py:6105-6107
  val ScoreThreshold = 0.15         // memory_graph.py:8158
  val NeoDefaultScore = 0.7         // memory_graph.py:6600,6679
  val ChunkFactor = 3               // memory_graph.py:6587 (chunks per memory)

  /** V6 — grouped-memory expansion (memory_graph.py:6200-6222): a hit whose
    * chunk payload is flagged `isGroupedMemories` pulls its
    * `relatedMemoryIds` (chunk suffixes stripped) into the candidate set.
    * Expanded ids carry score 0.0 — the reference's
    * `all_similarity_scores.get(x, 0.0)` fallback — so direct hits always
    * outrank them and re-dedup keeps the real score. Chunk relations that
    * don't carry the grouped payload (e.g. IVF-pruned projections) expand
    * to nothing. */
  private def groupedExpansion(chunkHits: DataFrame): DataFrame = {
    val cols = chunkHits.columns.toSet
    if (!cols.contains("is_grouped") || !cols.contains("related_memory_ids"))
      chunkHits.sparkSession.emptyDataFrame
        .select(lit("").as("memory_id"), lit(0.0).as("score")).limit(0)
    else chunkHits.filter(col("is_grouped"))
      .select(explode(col("related_memory_ids")).as("rid"))
      .select(baseId(col("rid")).as("memory_id")).distinct()
      .withColumn("score", lit(0.0))
  }

  /** F1 re-checked at hydration: every search variant joins candidates to
    * the PRINCIPAL-VISIBLE slice of the memories table, never the raw
    * table. Candidate ids can enter the pipeline from sources other than
    * the ACL-filtered chunk scan (grouped expansion, the graph branch), so
    * visibility must hold at the hydration boundary independently of how
    * the id was found. */
  private def visibleMemories(memories: DataFrame, req: SearchRequest): DataFrame =
    memories.filter(Retrieval.aclPredicate(req.principal))

  /** The F1/F2/F4 filter stack, shared by every search variant. */
  private def applyFilters(chunks: DataFrame, req: SearchRequest): DataFrame = {
    val acl = chunks.filter(Retrieval.aclPredicate(req.principal))
    // F2: tenant AND-scope. Chunks denormalize the namespace GRANT list
    // (namespace_read_access), not a namespace_id column — scope on
    // whichever the input schema actually carries (memories have the id;
    // chunk payloads, like the reference's Qdrant points, have the list).
    val scoped = req.namespaceId.map { ns =>
      if (acl.columns.contains("namespace_id")) acl.filter(col("namespace_id") === ns)
      else acl.filter(array_contains(col("namespace_read_access"), ns))
    }.getOrElse(acl)
    if (req.metaFilters.isEmpty) scoped
    else scoped.filter(Retrieval.metaFilter(col("custom_metadata"), req.metaFilters))
  }

  /** The shared KNN hit list: F1/F2/F4 filters → literal-qvec cosine →
    * 0.15 gate → ×3-oversampled top cut, carrying the grouped payload when
    * the chunk relation has it (IVF-pruned projections may not). The hit
    * list feeds BOTH the rollup and the grouped expansion, so it is
    * materialized (≤ 3·topK rows) — otherwise the corpus-wide KNN scan
    * would run once per consumer.
    *
    * The query vector is attached as a LITERAL (it is driver-known — the
    * embedder runs on the request text), which is exactly the
    * `Sort(cosine(emb, literal)) + Limit` shape [[graft.plans.AnnRewrite]]
    * fires on: against a registered IVF-assigned chunks table the
    * OPTIMIZER, not the caller, swaps this scan for a cluster-pruned one
    * (`searchIndexed` remains the explicit-pruning variant). `centroid_id`
    * is carried through the projection when the relation has it so column
    * pruning can never evict the rule's prune key. */
  private def chunkHitList(spark: SparkSession, chunks: DataFrame,
                           req: SearchRequest, embedder: Embedder): DataFrame = {
    val qvec = lit(embedder.embed(req.queryText))
    val extraCols = Seq("is_grouped", "related_memory_ids", "centroid_id")
      .filter(chunks.columns.contains)
    val hits = applyFilters(chunks, req)
      .withColumn("score", cosineSim(col("embedding"), qvec))
      .filter(col("score") >= ScoreThreshold)
      .select((Seq("chunk_id", "memory_id", "score") ++ extraCols).map(col): _*)
      .orderBy(desc("score"), col("chunk_id"))
      .limit(req.topK * OversampleFactor)
    if (extraCols.isEmpty) hits else hits.localCheckpoint(true)
  }

  def search(spark: SparkSession, chunks: DataFrame, memories: DataFrame,
             req: SearchRequest,
             embedder: Embedder = new HashEmbedder(64),
             reranker: Reranker = LexicalReranker): DataFrame = {
    val chunkHits = chunkHitList(spark, chunks, req, embedder)

    // V6 applied mid-pipeline (memory_graph.py:6200-6222): grouped hits pull
    // their related memories into the candidate set at score 0.0 before the
    // rollup re-dedups — direct hits keep their real score via max()
    val rolled = chunkHits
      .groupBy(col("memory_id"))
      .agg(max(col("score")).as("score"), count(lit(1)).as("n_chunks"))
      .unionByName(groupedExpansion(chunkHits).withColumn("n_chunks", lit(0L)))
      .groupBy(col("memory_id"))
      .agg(max(col("score")).as("score"), max(col("n_chunks")).as("n_chunks"))

    // Hydration is ACL-guarded on the MEMORIES side as well: the vector
    // branch's ids derive from ACL-filtered chunks, but grouped expansion
    // (V6) injects arbitrary related ids — without this filter a grouped
    // payload could surface a memory the principal cannot read (the
    // reference hydrates through user-scoped fetches, so visibility is
    // re-checked at hydration there too).
    val hydrated = rolled
      .join(visibleMemories(memories, req), Seq("memory_id"))
      .filter(req.excludeMemoryId.map(col("memory_id") =!= _).getOrElse(lit(true)))
      .select(col("memory_id"), col("score"), col("n_chunks"), col("content"),
        col("title"), col("user_id"), col("topics"), col("created_at"))

    val topK = hydrated.orderBy(desc("score"), col("memory_id")).limit(req.topK)

    if (!req.rerank) topK
    else Rerank.rerank(topK, "content", "memory_id", req.queryText, req.topK, reranker)
  }

  /** Flagship search against a prebuilt IVF index: identical pipeline, but
    * the KNN scan touches only the query's `nProbe` nearest clusters
    * (`IvfIndex.prunedCorpus`) — the candidate-pruned path for corpora where
    * a full scan per query is too expensive. Recall < 1 like any ANN; raise
    * nProbe to trade time for recall. */
  def searchIndexed(spark: SparkSession, index: IvfIndex.Index, memories: DataFrame,
                    req: SearchRequest, nProbe: Int = 2,
                    embedder: Embedder = new HashEmbedder(64),
                    reranker: Reranker = LexicalReranker): DataFrame = {
    import spark.implicits._
    val qvec = Seq(Tuple1(embedder.embed(req.queryText))).toDF("qvec")
    val pruned = IvfIndex.prunedCorpus(index, qvec, nProbe).drop("centroid_id")
    search(spark, pruned, memories, req, embedder, reranker)
  }

  /** The COMPLETE §3.1 read path — vector branch ∪ AST graph branch fused
    * under stratified quotas (`memory_graph.py:6289-6431`), ONE entry point:
    *
    *   1. vector: filtered cosine KNN over chunks (×3 oversample, 0.15
    *      gate) → grouped-memory expansion (V6) → max-score rollup;
    *   2. graph: the compiled [[graft.ast.GraphQuery]] over (nodes, edges);
    *      graph hits carry the reference's default score 0.7
    *      (`memory_graph.py:6600,6679` — "a fair shot" for scoreless Neo4j
    *      results);
    *   3. stratified quotas for source diversity (qwen-route shape,
    *      `:6663-6676`): base = max(topK/2, 10) memories per source, ×3
    *      chunk factor for the vector source;
    *   4. adaptive fill (`:6689-6720`): if the sampled union holds fewer
    *      than topK distinct ids, top up from the quota leftovers in global
    *      (score, id) order;
    *   5. fuse by max score per id (re-dedup — a memory found by both
    *      branches keeps its best score), hydrate, exclude-id, sort.
    *
    * Like the reference, the final result is the whole fused candidate set
    * (bounded by the quotas, ≈ 4·topK + expansions), sorted best-first —
    * topK gates the QUOTAS, not a final cut.
    *
    * Scale shape: both branches are independent subplans Spark schedules
    * concurrently; the quota window partitions on the 2-value source tag
    * of a ≤ 4·topK-row relation; the one driver-side count gating the fill
    * runs over that same tiny relation (the reference counts the same list
    * in-process, `:6689`). */
  def searchFused(spark: SparkSession, chunks: DataFrame, memories: DataFrame,
                  nodes: DataFrame, edges: DataFrame, graphQuery: GraphQuery,
                  req: SearchRequest,
                  embedder: Embedder = new HashEmbedder(64)): DataFrame = {
    val chunkHits = chunkHitList(spark, chunks, req, embedder)

    val vector = chunkHits.groupBy(col("memory_id"))
      .agg(max(col("score")).as("score"))
      .withColumn("source", lit("vector"))
    // The graph branch is PRINCIPAL-SCOPED (the ACL compile overload):
    // both endpoints of every traversed edge must pass the principal's
    // read predicate, exactly like the vector branch's chunk filter — the
    // reference's Neo4j branch is user-scoped Cypher. The non-principal
    // overload here would let graph-sourced memories bypass ACL entirely.
    val graph = QueryCompiler.compile(graphQuery, nodes, edges, req.principal)
      .select(col("m_id").as("memory_id")).distinct()
      .withColumn("score", lit(NeoDefaultScore))
      .withColumn("source", lit("graph"))
    val expanded = groupedExpansion(chunkHits).withColumn("source", lit("grouped"))

    val baseQuota = math.max(req.topK / 2, 10)
    val quotaCol = when(col("source") === "vector", lit(baseQuota * ChunkFactor))
      .otherwise(lit(baseQuota))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(desc("score"), col("memory_id"))
    // materialized (NOT persist: a per-query cache pin would leak across a
    // serving loop) — ≤ oversample+|graph| rows, read by sample, count, fill
    val ranked = vector.unionByName(graph)
      .withColumn("rn", row_number().over(w))
      .localCheckpoint(true)

    val sampled = ranked.filter(col("rn") <= quotaCol).drop("rn")
    val sampledIds = sampled.select(col("memory_id")).distinct()
    val need = req.topK - sampledIds.count()
    val fill =
      if (need <= 0) sampled.limit(0)
      else ranked.filter(col("rn") > quotaCol).drop("rn")
        .join(sampledIds, Seq("memory_id"), "left_anti")
        .orderBy(desc("score"), col("memory_id"))
        .limit(need.toInt)

    val fused = sampled.unionByName(fill).unionByName(expanded)
      .groupBy(col("memory_id"))
      // lexicographic max over (score, source): best score wins; the source
      // string only breaks exact-score ties, which the fixed 0.7/0.0
      // defaults make unreachable across sources in practice
      .agg(max(struct(col("score"), col("source"))).as("best"))
      .select(col("memory_id"), col("best.score").as("score"),
        col("best.source").as("source"))

    // visibility re-checked at hydration (see visibleMemories): the graph
    // branch is already principal-scoped, but grouped expansion injects
    // raw related ids that must not hydrate into invisible memories
    fused
      .join(visibleMemories(memories, req), Seq("memory_id"))
      .filter(req.excludeMemoryId.map(col("memory_id") =!= _).getOrElse(lit(true)))
      .select(col("memory_id"), col("score"), col("source"), col("content"),
        col("title"), col("user_id"), col("created_at"))
      .orderBy(desc("score"), col("memory_id"))
  }

  /** [[searchFused]] against a prebuilt IVF index: the vector branch scans
    * only the query's `nProbe` nearest clusters — the serving shape when a
    * full chunk scan per query is too expensive. With `nProbe` = all
    * clusters the result equals the full-scan fused search exactly
    * (spec-pinned); the pruned corpus keeps the chunk payload, so grouped
    * expansion still fires — but only from hits the probe can see. */
  def searchFusedIndexed(spark: SparkSession, index: IvfIndex.Index,
                         memories: DataFrame, nodes: DataFrame, edges: DataFrame,
                         graphQuery: GraphQuery, req: SearchRequest, nProbe: Int = 2,
                         embedder: Embedder = new HashEmbedder(64)): DataFrame = {
    import spark.implicits._
    val qvec = Seq(Tuple1(embedder.embed(req.queryText))).toDF("qvec")
    val pruned = IvfIndex.prunedCorpus(index, qvec, nProbe).drop("centroid_id")
    searchFused(spark, pruned, memories, nodes, edges, graphQuery, req, embedder)
  }

  /** V2 modernized — multi-space search with reciprocal-rank fusion: run
    * the full filtered KNN independently per embedding space (the
    * reference fans out to Pinecone/BigBird/Qdrant concurrently,
    * `memory_graph.py:6085-6127`; Spark schedules the per-space stages in
    * parallel from one plan), rank per space, fuse by RRF (rank-based, so
    * heterogeneous score scales need no calibration — replacing the
    * reference's last-wins score merge), then hydrate the fused top-k.
    * `spaces` maps space name → (chunks relation, its embedding column). */
  def searchMultiSpace(spark: SparkSession, spaces: Seq[(DataFrame, String)],
                       memories: DataFrame, req: SearchRequest,
                       embedder: Embedder = new HashEmbedder(64),
                       rrfK: Int = 60): DataFrame = {
    import spark.implicits._
    val qvec = Seq(Tuple1(embedder.embed(req.queryText))).toDF("qvec")
    val perSpace = spaces.map { case (chunks, embCol) =>
      // same F1/F2/F4 stack as the single-space path — every space is
      // filtered identically before its ranking exists
      val filtered = applyFilters(chunks, req)
      filtered.crossJoin(broadcast(qvec))
        .withColumn("score", cosineSim(col(embCol), col("qvec")))
        .select(col("memory_id"), col("score"))
        .groupBy(col("memory_id")).agg(max(col("score")).as("score"))
        .orderBy(desc("score"), col("memory_id"))
        .limit(req.topK * OversampleFactor)
    }
    Retrieval.rrfFuse(perSpace, "memory_id", rrfK)
      .join(visibleMemories(memories, req), Seq("memory_id"))
      .filter(req.excludeMemoryId.map(col("memory_id") =!= _).getOrElse(lit(true)))
      .select(col("memory_id"), col("rrf"), col("content"), col("title"),
        col("user_id"), col("created_at"))
      .orderBy(desc("rrf"), col("memory_id"))
      .limit(req.topK)
  }

  /** V3 — filter-only fallback when KNN returns nothing
    * (`memory_graph.py:8327-8437`): newest matching rows, no vector. */
  def fallbackScan(chunks: DataFrame, memories: DataFrame, req: SearchRequest): DataFrame =
    chunks.filter(Retrieval.aclPredicate(req.principal))
      .select(col("memory_id")).distinct()
      .join(visibleMemories(memories, req), Seq("memory_id"))
      // F6 applies on EVERY path — the fallback must not return the very
      // memory the caller asked to exclude (primary path filters at hydrate)
      .filter(req.excludeMemoryId.map(col("memory_id") =!= _).getOrElse(lit(true)))
      .select(col("memory_id"), lit(null).cast("double").as("score"),
        lit(0L).as("n_chunks"), col("content"), col("title"), col("user_id"),
        col("topics"), col("created_at"))
      .orderBy(desc("created_at"), col("memory_id"))
      .limit(req.topK)

  /** The degradation policy around plan variants (`memory_graph.py:9137`,
    * `:8582`): run the primary plan; if empty, strip property filters; if
    * still empty, recency scan. Driver-side retry over tiny results — the
    * plans themselves stay distributed. */
  /** Generic-query canonicalization (`memory_models.py:899-927`: `"*"` and
    * friends are rewritten to "show me my most recent memories"): a
    * wildcard/empty query skips the vector branch entirely. */
  def isGenericQuery(q: String): Boolean = {
    val t = q.trim.toLowerCase
    t.isEmpty || t == "*" || t == "all" || t == "everything"
  }

  def searchWithFallback(spark: SparkSession, chunks: DataFrame, memories: DataFrame,
                         req: SearchRequest): DataFrame = {
    if (isGenericQuery(req.queryText)) return fallbackScan(chunks, memories, req)
    // persist each variant before probing emptiness: isEmpty materializes the
    // plan, and without the cache the caller's collect would re-run the full
    // corpus scan a second time. The cached result is ≤ topK rows. Abandoned
    // (empty) variants are unpersisted immediately; the RETURNED DataFrame
    // stays cached — serving loops should unpersist it once consumed.
    val primary = search(spark, chunks, memories, req).persist()
    if (!primary.isEmpty) primary
    else {
      primary.unpersist()
      val unfiltered =
        search(spark, chunks, memories, req.copy(metaFilters = Map.empty)).persist()
      if (!unfiltered.isEmpty) unfiltered
      else {
        unfiltered.unpersist()
        fallbackScan(chunks, memories, req)
      }
    }
  }
}
