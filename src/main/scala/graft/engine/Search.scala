package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  def search(spark: SparkSession, chunks: DataFrame, memories: DataFrame,
             req: SearchRequest,
             embedder: Embedder = new HashEmbedder(64),
             reranker: Reranker = LexicalReranker): DataFrame = {
    import spark.implicits._

    val qvec = Seq(Tuple1(embedder.embed(req.queryText))).toDF("qvec")

    val filtered = {
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

    val chunkHits = filtered
      .crossJoin(broadcast(qvec))
      .withColumn("score", cosineSim(col("embedding"), col("qvec")))
      .filter(col("score") >= ScoreThreshold)
      .select(col("chunk_id"), col("memory_id"), col("score"))
      .orderBy(desc("score"), col("chunk_id"))
      .limit(req.topK * OversampleFactor)

    val rolled = chunkHits
      .groupBy(col("memory_id"))
      .agg(max(col("score")).as("score"), count(lit(1)).as("n_chunks"))

    val hydrated = rolled
      .join(memories, Seq("memory_id"))
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
      val acl = chunks.filter(Retrieval.aclPredicate(req.principal))
      val scoped = req.namespaceId.map { ns =>
        if (acl.columns.contains("namespace_id")) acl.filter(col("namespace_id") === ns)
        else acl.filter(array_contains(col("namespace_read_access"), ns))
      }.getOrElse(acl)
      val filtered =
        if (req.metaFilters.isEmpty) scoped
        else scoped.filter(Retrieval.metaFilter(col("custom_metadata"), req.metaFilters))
      filtered.crossJoin(broadcast(qvec))
        .withColumn("score", cosineSim(col(embCol), col("qvec")))
        .select(col("memory_id"), col("score"))
        .groupBy(col("memory_id")).agg(max(col("score")).as("score"))
        .orderBy(desc("score"), col("memory_id"))
        .limit(req.topK * OversampleFactor)
    }
    Retrieval.rrfFuse(perSpace, "memory_id", rrfK)
      .join(memories, Seq("memory_id"))
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
      .join(memories, Seq("memory_id"))
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
