package graft

import org.apache.spark.sql.functions._
import graft.domain.Fixtures
import graft.engine.{HashEmbedder, Search}
import graft.engine.Search.SearchRequest
import graft.ops.Retrieval.{MetaAtLeast, Principal}

class SearchEngineSpec extends SparkSpec {

  private lazy val mems = Fixtures.memories(spark).collect().toSeq
  private lazy val memories = Fixtures.memories(spark).toDF()
  private lazy val chunks = Fixtures.chunks(spark, mems).toDF()

  private val owner = Principal("u0")

  test("owner sees only ACL-visible memories, ranked by score") {
    val someContent = mems.find(_.user_id == "u0").get.content
    val out = Search.search(spark, chunks, memories,
      SearchRequest(someContent, owner, topK = 5)).collect()
    assert(out.nonEmpty && out.length <= 5)
    // the memory whose own content is the query must rank first
    assert(out.head.getAs[String]("content") === someContent)
    // scores are descending
    val scores = out.map(_.getAs[Double]("score")).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("multi-space RRF search: consensus ranking, ACL holds on every space") {
    val someContent = mems.find(_.user_id == "u0").get.content
    // two AGREEING spaces: the consensus winner must be the exact-content
    // memory (rank 1 in both ⇒ maximal rrf)
    val agree = Search.searchMultiSpace(spark,
      Seq((chunks, "embedding"), (chunks, "embedding")), memories,
      Search.SearchRequest(someContent, Principal("u0"), topK = 5)).collect()
    assert(agree.nonEmpty && agree.length <= 5)
    assert(agree.head.getAs[String]("content") === someContent)

    // a DISAGREEING second space (reversed embeddings ⇒ unrelated ranking):
    // RRF may demote the top-1 — that is the point of consensus — but ACL
    // visibility and score monotonicity always hold
    val spaceB = chunks.withColumn("embedding", reverse(col("embedding")))
    val out = Search.searchMultiSpace(spark,
      Seq((chunks, "embedding"), (spaceB, "embedding")), memories,
      Search.SearchRequest(someContent, Principal("u0"), topK = 5)).collect()
    assert(out.nonEmpty && out.length <= 5)
    val visible = mems.filter(m => m.user_id == "u0" ||
      m.user_read_access.contains("u0")).map(_.memory_id).toSet
    assert(out.forall(r => visible.contains(r.getAs[String]("memory_id"))))
    val scores = out.map(_.getAs[Double]("rrf")).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("ACL isolation: a stranger principal gets no one else's memories") {
    val someContent = mems.find(_.user_id == "u0").get.content
    val stranger = Principal("nobody")
    val out = Search.search(spark, chunks, memories,
      SearchRequest(someContent, stranger, topK = 5)).collect()
    assert(out.isEmpty)
  }

  test("workspace grant opens access (F1 OR-semantics)") {
    val someContent = mems.find(_.user_id == "u1").get.content
    val viaWs = Principal("nobody", workspaces = Seq("ws0", "ws1", "ws2"))
    val out = Search.search(spark, chunks, memories,
      SearchRequest(someContent, viaWs, topK = 5)).collect()
    assert(out.nonEmpty)
  }

  test("metadata filter narrows results (F4 bare-numeric >= semantics)") {
    val q = mems.find(_.user_id == "u0").get.content
    val all = Search.search(spark, chunks, memories,
      SearchRequest(q, owner, topK = 20)).collect()
    val filtered = Search.search(spark, chunks, memories,
      SearchRequest(q, owner, topK = 20,
        metaFilters = Map("priority" -> MetaAtLeast(5)))).collect()
    assert(filtered.length < all.length)
  }

  test("excludeMemoryId drops the excluded id (F6)") {
    val m = mems.find(_.user_id == "u0").get
    val out = Search.search(spark, chunks, memories,
      SearchRequest(m.content, owner, topK = 5, excludeMemoryId = Some(m.memory_id)))
      .collect()
    assert(!out.map(_.getAs[String]("memory_id")).contains(m.memory_id))
  }

  test("rerank stage reorders by lexical overlap deterministically") {
    val q = mems.find(_.user_id == "u0").get.content
    val out = Search.search(spark, chunks, memories,
      SearchRequest(q, owner, topK = 5, rerank = true)).collect()
    assert(out.nonEmpty)
    val rr = out.map(_.getAs[Double]("rr_score")).toSeq
    assert(rr === rr.sorted.reverse)
  }

  test("fallback: impossible filter falls back, then recency scan") {
    val out = Search.searchWithFallback(spark, chunks, memories,
      SearchRequest("zzz qqq xxx totally unrelated nonsense", owner, topK = 5,
        metaFilters = Map("priority" -> MetaAtLeast(9999))))
      .collect()
    assert(out.nonEmpty) // recency fallback returns newest visible memories
  }

  test("grouped-memory expansion (V6) pulls related ids into search results") {
    // target must survive the priority>=5 metadata filter below
    val targetMem = mems.find(m => m.user_id == "u0" &&
      m.custom_metadata("priority").toInt >= 5).get
    val someContent = targetMem.content
    val target = targetMem.memory_id
    // flag the guaranteed top hit's chunks as grouped, relating ids the
    // vector branch can't return under the priority>=5 metadata filter:
    // two u0-visible ids with priority 0 (m50; m40_2 with a chunk suffix
    // to strip) plus one INVISIBLE id (m59, owner u4 with no u0 grant) —
    // expansion must surface the visible ones at the 0.0 default score and
    // drop the invisible one at the ACL-guarded hydration
    val grouped = chunks
      .withColumn("is_grouped", col("memory_id") === target)
      .withColumn("related_memory_ids",
        when(col("memory_id") === target,
          array(lit("m50"), lit("m40_2"), lit("m59")))
          .otherwise(array().cast("array<string>")))
    val req = SearchRequest(someContent, owner, topK = 50,
      metaFilters = Map("priority" -> MetaAtLeast(5)))
    val out = Search.search(spark, grouped, memories, req).collect()
    val byId = out.map(r => r.getAs[String]("memory_id") ->
      r.getAs[Double]("score")).toMap
    assert(byId.contains("m50") && byId("m50") === 0.0)   // expanded, default score
    assert(byId.contains("m40") && byId("m40") === 0.0)   // chunk suffix stripped
    assert(!byId.contains("m59"))  // ACL holds: invisible related id dropped
    assert(byId(target) > 0.5)                            // direct hit keeps real score
    // re-dedup: expansion of an id that's ALSO a direct hit keeps the real score
    val selfGrouped = chunks
      .withColumn("is_grouped", col("memory_id") === target)
      .withColumn("related_memory_ids",
        when(col("memory_id") === target, array(lit(target)))
          .otherwise(array().cast("array<string>")))
    val self = Search.search(spark, selfGrouped, memories,
      SearchRequest(someContent, owner, topK = 50)).collect()
      .map(r => r.getAs[String]("memory_id") -> r.getAs[Double]("score")).toMap
    assert(self(target) === byId(target))   // real score survives self-expansion
  }

  test("fused search: vector ∪ graph under quotas, graph hits carry 0.7") {
    import graft.ast.{CompOp, GraphQuery, Pattern, Return, Where}
    val someContent = mems.find(_.user_id == "u0").get.content
    val target = mems.find(_.content == someContent).get.memory_id
    import spark.implicits._
    // graph: every research-category memory MENTIONS topic 'research'
    val researchIds = mems.filter(_.category == "research").map(_.memory_id)
    // nodes carry ACL (mirroring each memory's own grants); the topic node
    // is granted to every user so the edge semi-join hinges on the MEMORY
    // endpoint's visibility alone
    val memNodes = mems.map(m => (m.memory_id, "Memory", m.title,
      Map("category" -> m.category), m.user_id, m.user_read_access))
      .toDF("node_id", "label", "name", "properties", "user_id", "user_read_access")
    val topicNodes = Seq(("t_research", "Topic", "research", Map.empty[String, String],
      "u0", Seq("u0", "u1", "u2", "u3", "u4")))
      .toDF("node_id", "label", "name", "properties", "user_id", "user_read_access")
    val edges = researchIds.map(id => (id, "t_research", "MENTIONS",
      Map.empty[String, String])).toDF("src", "dst", "rel_type", "properties")
    val gq = GraphQuery(Pattern("Memory", Some("MENTIONS"), Some("Topic")),
      Seq(Where("n", "name", CompOp.Eq, Some("research"))),
      Return(Seq("m" -> "id"), orderBy = None, limit = None))
    val out = Search.searchFused(spark, chunks, memories, memNodes.unionByName(topicNodes),
      edges, gq, SearchRequest(someContent, owner, topK = 10)).collect()
    val bySource = out.groupBy(_.getAs[String]("source"))
    // graph-only hits surface with the neo default score
    val graphRows = bySource.getOrElse("graph", Array.empty)
    assert(graphRows.nonEmpty)
    assert(graphRows.forall(_.getAs[Double]("score") === 0.7))
    // ACL holds on the graph branch too: every fused hit (graph-sourced
    // included) is visible to the principal — the graph compile is
    // principal-scoped and hydration re-checks visibility
    val visibleToU0 = mems.filter(m => m.user_id == "u0" ||
      m.user_read_access.contains("u0")).map(_.memory_id).toSet
    assert(out.forall(r => visibleToU0.contains(r.getAs[String]("memory_id"))))
    // the exact-content memory wins the vector branch outright (graph's
    // 0.7 default may outrank weak vector hits globally — by design)
    val vecRows = bySource.getOrElse("vector", Array.empty)
    assert(vecRows.maxBy(_.getAs[Double]("score"))
      .getAs[String]("memory_id") === target)
    // fusion re-dedups: no memory appears twice
    val ids = out.map(_.getAs[String]("memory_id"))
    assert(ids.length === ids.distinct.length)
    // output is sorted best-first
    val scores = out.map(_.getAs[Double]("score")).toSeq
    assert(scores === scores.sorted.reverse)

    // IVF-probed fused search with nProbe = ALL clusters must equal the
    // full-scan fused result exactly (the recall knob at its exact end)
    val idx = graft.engine.IvfIndex.build(chunks, "chunk_id", "embedding", nCentroids = 4)
    val probed = Search.searchFusedIndexed(spark, idx, memories,
      memNodes.unionByName(topicNodes), edges, gq,
      SearchRequest(someContent, owner, topK = 10), nProbe = 4).collect()
    assert(probed.map(r => (r.getAs[String]("memory_id"), r.getAs[Double]("score"))).toSeq ===
      out.map(r => (r.getAs[String]("memory_id"), r.getAs[Double]("score"))).toSeq)
  }
}
