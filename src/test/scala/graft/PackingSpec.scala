package graft

import org.apache.spark.sql.functions._
import graft.ops.{Packing, Similarity}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("sequencePack: concat-then-chop per shard, docs assigned by first token") {
    // shard A: docs of 3,4,5 tokens with seqLen 6 → offsets 0,3,7 →
    // seqs 0,0,1; shard B independent (packing never crosses shards)
    val docs = Seq(
      ("A", 1L, "a b c"), ("A", 2L, "d e f g"), ("A", 3L, "h i j k l"),
      ("B", 9L, "x y z w v u t")
    ).toDF("source", "doc_id", "text")
    val out = Packing.sequencePack(docs, "doc_id", "text", "source", seqLen = 6)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set(
      ("A", 0L, 2L, 7L),    // docs 1+2 start in seq 0 (offsets 0, 3)
      ("A", 1L, 1L, 5L),    // doc 3 starts at offset 7 → seq 1
      ("B", 0L, 1L, 7L)))
  }

  test("knnBatch: bounded aggregator equals per-query exact top-k") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id").between(1, 3))
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") > 3)
    val batch = Similarity.knnBatch(corpus, queries,
        "vec_id", "embedding", "q_id", "qvec", k = 4)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank")) ->
        r.getAs[Long]("vec_id")).toMap
    // reference: one raw-score exact top-k per query (knnBatch ranks the
    // raw doubles; knnCosine's public variant rounds to 4 decimals first,
    // which reorders 4-decimal ties differently — not comparable here)
    import graft.functions.VectorFunctions._
    (1L to 3L).foreach { q =>
      val qv = emb.filter(col("vec_id") === q).select(col("embedding").as("qvec"))
      val exact = corpus.crossJoin(broadcast(qv))
        .withColumn("score", cosineSim(col("embedding"), col("qvec")))
        .orderBy(desc("score"), col("vec_id")).limit(4)
        .collect().map(_.getAs[Long]("vec_id"))
      exact.zipWithIndex.foreach { case (id, i) =>
        assert(batch((q, i + 1)) === id, s"query $q rank ${i + 1}")
      }
    }
  }

  test("knnBatchLoo equals knnBatch(k+1) → drop self → re-rank (q166's old shape)") {
    val emb = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id").between(1, 40))
    val q = emb.select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val loo = Similarity.knnBatchLoo(emb, q,
        "vec_id", "embedding", "q_id", "qvec", k = 5)
      .select(col("q_id"), col("vec_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // the pre-round-14 formulation, verbatim (window re-rank included)
    import org.apache.spark.sql.expressions.Window
    val old = Similarity.knnBatch(emb, q,
        "vec_id", "embedding", "q_id", "qvec", k = 6)
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("rnk2", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("rank"))))
      .filter(col("rnk2") <= 5)
      .select(col("q_id"), col("vec_id"), col("rnk2").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(loo === old)
    // and no self pair ever survives
    assert(loo.forall { case (qid, vid, _) => qid != vid })
  }
}
