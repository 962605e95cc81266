package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f)),
    (3L, Array(0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  private def query = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("qvec")

  test("knnCosine returns ranked hits above threshold") {
    val out = Similarity.knnCosine(corpus, query, "vec_id", "embedding", 10, 0.15)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L)) // 3 is orthogonal(0), 4 negative
    assert(out.head._2 === 1.0)
  }

  test("knnCosine respects k") {
    val out = Similarity.knnCosine(corpus, query, "vec_id", "embedding", 1, -2.0)
    assert(out.count() === 1)
  }

  test("ivfTopKMulti: nProbe = all centroids degenerates to the exact scan") {
    val emb = Tables.embeddings(spark, sfDir)
    val corpus = emb.filter(col("vec_id") > 8)
    val cents = emb.filter(col("vec_id").between(1, 8))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val exact = Similarity.knnCosine(corpus, q, "vec_id", "embedding", 10, -2.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val all = Similarity.ivfTopKMulti(corpus, cents, q, "vec_id", "embedding",
        k = 10, nProbe = 8)
      .select(col("vec_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(all === exact)
    // more probes can only add candidates (k > |corpus| so the result IS
    // the candidate set — a top-k of a larger pool needn't contain the
    // top-k of a smaller one, but the pools themselves nest)
    val big = 1000000
    val p1 = Similarity.ivfTopKMulti(corpus, cents, q, "vec_id", "embedding", big, 1)
      .select("vec_id").as[Long].collect().toSet
    val p2 = Similarity.ivfTopKMulti(corpus, cents, q, "vec_id", "embedding", big, 2)
      .select("vec_id").as[Long].collect().toSet
    assert(p1.subsetOf(p2) && p2.size >= p1.size)
  }

  test("maxSimTopK: per-facet best chunk, summed; coverage beats one good chunk") {
    // doc 10 covers BOTH query facets (one vector each); doc 20 matches
    // facet 0 twice (max dedups — still only 1.0 for that facet); doc 30
    // is orthogonal to everything
    val docs = Seq(
      (10, Array(1.0f, 0.0f, 0.0f)), (10, Array(0.0f, 1.0f, 0.0f)),
      (20, Array(1.0f, 0.0f, 0.0f)), (20, Array(0.96f, 0.28f, 0.0f)),
      (30, Array(0.0f, 0.0f, 1.0f))
    ).toDF("doc", "embedding")
    val qs = Seq(
      (0, Array(1.0f, 0.0f, 0.0f)),
      (1, Array(0.0f, 1.0f, 0.0f))
    ).toDF("qid", "qvec")
    val out = Similarity.maxSimTopK(docs, "doc", "embedding",
        qs, "qid", "qvec", qids = Seq(0, 1), k = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    assert(out.map(_._1).toSeq === Seq(10, 20, 30))
    assert(out(0)._2 === 2.0)          // both facets perfectly covered
    assert(out(1)._2 === 1.0 + 0.28)   // facet0 max=1.0, facet1 best=0.28
    assert(out(2)._2 === 0.0)
  }

  test("nearDupPairs finds close pairs once (a<b)") {
    val out = Similarity.nearDupPairs(corpus, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === Set((1L, 2L)))
  }

  test("ivfTopK probes only the query's cluster") {
    val cents = Seq(
      (10L, Array(1.0f, 0.0f)),
      (20L, Array(0.0f, 1.0f))
    ).toDF("centroid_id", "cvec")
    val out = Similarity.ivfTopK(corpus, cents, query, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // cluster of centroid 10 holds vecs 1,2 (4 is closer to 20? no: (-1,0) is
    // distance 4 from (1,0), distance 2 from (0,1) → cluster 20). 3 → 20.
    assert(out.map(_._1).toSet === Set(1L, 2L))
    assert(out.forall(_._2 == 10L))
  }

  test("hardNegatives: excludes anchor's label, caps the semi-hard band") {
    val labeled = Seq(
      (10L, Array(1.0f, 0.0f), 0),   // same label as anchor → excluded
      (11L, Array(0.999f, 0.04f), 1), // different label but ≈ identical → capped
      (12L, Array(0.8f, 0.6f), 1),
      (13L, Array(0.0f, 1.0f), 2),
      (14L, Array(-1.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val anchors = Seq((1L, Array(1.0f, 0.0f), 0))
      .toDF("q_id", "qvec", "q_label")
    val out = Similarity.hardNegatives(labeled, anchors, "vec_id", "embedding",
        "label", "q_id", "qvec", "q_label", k = 2, maxSim = 0.99)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    // 10 excluded (label), 11 excluded (cap) → hardest remaining are 12, 13
    assert(out.toSeq === Seq((12L, 1), (13L, 2)))
  }

  test("ivf assignment covers every corpus vector exactly once") {
    val cents = Seq((10L, Array(1.0f, 0.0f)), (20L, Array(0.0f, 1.0f)))
      .toDF("centroid_id", "cvec")
    val assigned = Similarity.ivfAssign(corpus, cents, "vec_id", "embedding")
    assert(assigned.count() === 4)
    assert(assigned.select("vec_id").distinct().count() === 4)
  }
}
