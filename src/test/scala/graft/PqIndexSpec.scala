package graft

import org.apache.spark.sql.functions._
import graft.engine.PqIndex

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(16)(r.nextFloat() * 2 - 1)
  }

  private lazy val corpus = (1 to 300).map(i => (i.toLong, vec(i))).toDF("id", "v")

  test("train: codebook shape and determinism") {
    val m1 = PqIndex.train(corpus, "id", "v", m = 4, nCentroids = 8)
    val m2 = PqIndex.train(corpus, "id", "v", m = 4, nCentroids = 8)
    assert(m1.m === 4 && m1.nCentroids === 8 && m1.subDim === 4)
    assert(m1.codebook.flatten.flatten.toSeq === m2.codebook.flatten.flatten.toSeq)
  }

  test("encode: m codes per vector, all within the codebook") {
    val model = PqIndex.train(corpus, "id", "v", m = 4, nCentroids = 8)
    val enc = PqIndex.encode(corpus, "id", "v", model).collect()
    assert(enc.length === 300)
    enc.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length === 4)
      assert(codes.forall(c => c >= 0 && c < 8))
    }
  }

  test("ADC lower bound: a corpus vector's own codes minimize its query table") {
    // for query q == corpus row x, x's code in each subspace minimizes that
    // subspace's table entry, so no row can have a smaller ADC distance —
    // x must appear in any candidate set of size >= #ties
    val model = PqIndex.train(corpus, "id", "v", m = 4, nCentroids = 8)
    val enc = PqIndex.encode(corpus, "id", "v", model)
    val q = vec(42) // id 42 is in the corpus
    val table = model.adcTable(q)
    val scored = enc
      .withColumn("approx", graft.functions.PqFunctions.pqAdcDistance(col("codes"), table))
      .orderBy(col("approx"), col("id"))
      .select("id", "approx").collect()
    val own = scored.find(_.getLong(0) === 42L).get.getLong(1)
    assert(scored.head.getLong(1) === own, "another row beat the query's own codes")
  }

  test("topK with rescore surfaces the exact vector for a corpus query") {
    val model = PqIndex.train(corpus, "id", "v", m = 4, nCentroids = 8)
    val enc = PqIndex.encode(corpus, "id", "v", model)
    val out = PqIndex.topK(enc, corpus, "id", "v", model, vec(7), k = 5, candidates = 40)
      .collect()
    assert(out.length === 5)
    assert(out.head.getLong(0) === 7L, s"self-retrieval failed: ${out.toSeq}")
    assert(out.head.getDouble(1) === 1.0)
  }
}
