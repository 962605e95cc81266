package graft

import org.apache.spark.sql.functions._
import graft.ops.Rerank

/** MMR diversification: the greedy λ-tradeoff between relevance and
  * max-similarity-to-picked, pinned on hand-built vectors where the right
  * answers are checkable by eye. */
class RerankSpec extends SparkSpec {
  import spark.implicits._

  // A and B are near-duplicates (cos ≈ 1), C is orthogonal to both.
  private def candidates = Seq(
    ("a", Array(1.0f, 0.0f, 0.0f), 0.90),
    ("b", Array(0.999f, 0.04f, 0.0f), 0.89),
    ("c", Array(0.0f, 1.0f, 0.0f), 0.50)
  ).toDF("id", "emb", "rel")

  test("λ=1 is the pure relevance order") {
    val out = Rerank.mmr(candidates, "emb", "id", "rel", k = 3, lambda = 1.0)
      .orderBy("mmr_rank").select("id").as[String].collect()
    assert(out.toSeq === Seq("a", "b", "c"))
  }

  test("λ=0.5 suppresses the near-duplicate: the orthogonal doc jumps it") {
    val out = Rerank.mmr(candidates, "emb", "id", "rel", k = 3, lambda = 0.5)
      .orderBy("mmr_rank").select("id").as[String].collect()
    // b's marginal score after picking a ≈ .5·.89 − .5·1 < c's .5·.5 − 0
    assert(out.toSeq === Seq("a", "c", "b"))
  }

  test("k bounds the output; schema = input + mmr_rank; ranks are 1..k") {
    val out = Rerank.mmr(candidates, "emb", "id", "rel", k = 2, lambda = 0.5)
    assert(out.columns.toSeq === Seq("id", "emb", "rel", "mmr_rank"))
    val ranks = out.select("mmr_rank").as[Int].collect().sorted
    assert(ranks.toSeq === Seq(1, 2))
  }

  test("deterministic across runs (ties break by id)") {
    val tied = Seq(
      ("x", Array(1.0f, 0.0f), 0.7),
      ("y", Array(0.0f, 1.0f), 0.7)
    ).toDF("id", "emb", "rel")
    val runs = (1 to 3).map(_ =>
      Rerank.mmr(tied, "emb", "id", "rel", k = 2, lambda = 0.8)
        .orderBy("mmr_rank").select("id").as[String].collect().toSeq)
    assert(runs.distinct.size === 1)
    assert(runs.head === Seq("x", "y"))
  }

  test("null/NaN relevance ranks last and never crashes the batch") {
    val dirty = Seq(
      ("a", Array(1.0f, 0.0f, 0.0f), java.lang.Double.valueOf(0.9)),
      ("b", Array(0.0f, 1.0f, 0.0f), java.lang.Double.valueOf(Double.NaN)),
      ("c", Array(0.0f, 0.0f, 1.0f), null.asInstanceOf[java.lang.Double])
    ).toDF("id", "emb", "rel")
    val out = Rerank.mmr(dirty, "emb", "id", "rel", k = 3, lambda = 0.7)
      .orderBy("mmr_rank").select("id").as[String].collect().toSeq
    // the one real score leads; the −∞ rows follow in id order
    assert(out === Seq("a", "b", "c"))
    // all-bad candidate set: still deterministic, still no crash
    val allBad = Seq(
      ("x", Array(1.0f, 0.0f, 0.0f), null.asInstanceOf[java.lang.Double]),
      ("y", Array(0.0f, 1.0f, 0.0f), null.asInstanceOf[java.lang.Double])
    ).toDF("id", "emb", "rel")
    val out2 = Rerank.mmr(allBad, "emb", "id", "rel", k = 2, lambda = 0.7)
      .orderBy("mmr_rank").select("id").as[String].collect().toSeq
    assert(out2 === Seq("x", "y"))
  }
}
