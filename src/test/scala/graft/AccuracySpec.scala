package graft

import graft.domain.Fixtures
import graft.engine.Search
import graft.engine.Search.SearchRequest
import graft.ops.Retrieval.Principal

/** The reference's accuracy harness re-expressed
  * (`tests/calculate_query_scores.py:25+`): a fixed golden query set scored
  * by must-include hits + keyword coverage over returned content. Here the
  * golden answers are the fixture memories themselves (deterministic
  * embeddings ⇒ reproducible scores); the assertion is a floor, mirroring
  * the reference's scored-report approach rather than exact matching.
  */
class AccuracySpec extends SparkSpec {

  private lazy val memsSeq = Fixtures.memories(spark).collect().toSeq
  private lazy val memories = Fixtures.memories(spark).toDF()
  private lazy val chunks = Fixtures.chunks(spark, memsSeq).toDF()

  private def keywordCoverage(query: String, results: Seq[String]): Double = {
    val kws = query.toLowerCase.split("\\s+").distinct
    val text = results.mkString(" ").toLowerCase
    kws.count(text.contains).toDouble / kws.length
  }

  test("golden set: self-retrieval must-include and keyword coverage floors") {
    // topK=10 (the reference defaults to 20, memory_graph.py:5740); the
    // fixture vocabulary is 20 words, so inter-memory token overlap is
    // far higher than real corpora — top-5 self-retrieval is not stable.
    val goldens = memsSeq.filter(_.user_id == "u0").take(5)
    val scores = goldens.map { g =>
      val out = Search.search(spark, chunks, memories,
        SearchRequest(g.content, Principal("u0"), topK = 10)).collect()
      val contents = out.map(_.getAs[String]("content")).toSeq
      val mustInclude = if (out.map(_.getAs[String]("memory_id")).contains(g.memory_id)) 1.0 else 0.0
      val coverage = keywordCoverage(g.content, contents)
      (mustInclude, coverage)
    }
    val mustRate = scores.map(_._1).sum / scores.length
    val avgCoverage = scores.map(_._2).sum / scores.length
    // the reference reports 91% on STARK with real embeddings; with the
    // deterministic hash embedder, self-retrieval must be near-perfect.
    assert(mustRate >= 0.8, s"must-include rate $mustRate")
    assert(avgCoverage >= 0.8, s"keyword coverage $avgCoverage")
  }

  test("cross-user golden queries never leak other tenants' memories") {
    // Principal u1 with NO workspace/role/org/ns claims: a memory is visible
    // only when owned by u1 or explicitly granted via user_read_access.
    val principal = Principal("u1")
    val foreign = memsSeq
      .filter(m => m.user_id != "u1" && !m.user_read_access.contains("u1"))
      .take(5)
    foreign.foreach { g =>
      val out = Search.search(spark, chunks, memories,
        SearchRequest(g.content, principal, topK = 10)).collect()
      val ids = out.map(_.getAs[String]("memory_id"))
      assert(!ids.contains(g.memory_id), s"leaked ${g.memory_id} to u1")
    }
  }
}
