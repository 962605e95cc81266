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
}
