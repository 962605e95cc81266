package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns
import graft.functions.PqFunctions._
import graft.functions.VectorFunctions.cosineSim

/** Product-quantization index: train (sample a codebook) / encode (m codes
  * per vector) / search (integer ADC candidate scan → exact rescore).
  *
  * The reference's vector store keeps full INT8-quantized vectors RAM-
  * resident (`memory_graph.py:1036-1057`); PQ is the next compression rung
  * for corpora where even a byte per dimension doesn't fit — the candidate
  * scan reads m code-bytes per row instead of the vector. Like
  * [[IvfIndex]], the codebook here is a deterministic hash-sample of the
  * corpus rather than k-means (train offline for tighter cells; every
  * contract downstream — encode, ADC, rescore — is unchanged).
  *
  * Scale shape: train is a TakeOrdered sample collected to the driver
  * (the codebook IS a model artifact, m·k·subDim floats); encode is one
  * codegen'd map pass; search scans codes with an integer ADC sum (exact,
  * order-independent, engine-portable), takes candidates with a top-k
  * heap, and rescores only those against the full vectors.
  */
object PqIndex {

  case class Model(codebook: Array[Array[Array[Float]]]) {
    def m: Int = codebook.length
    def nCentroids: Int = codebook(0).length
    def subDim: Int = codebook(0)(0).length

    /** Per-query ADC table in micro-units: table(j)(c) = ⌊l2sq(q_j, cb_j_c)·1e6+0.5⌋. */
    def adcTable(q: Array[Float]): Array[Array[Long]] =
      Array.tabulate(m, nCentroids) { (j, c) =>
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val d = q(j * subDim + i).toDouble - codebook(j)(c)(i).toDouble
          acc += d * d
          i += 1
        }
        math.floor(acc * 1e6 + 0.5).toLong
      }
  }

  /** Codebook from the nCentroids hash-smallest corpus rows: subspace j's
    * centroids are the sampled rows' j-th subvectors. Deterministic,
    * engine-reproducible (same draw as IvfIndex seeding). */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            m: Int, nCentroids: Int): Model = {
    val rows = corpus
      .select(col(idCol), col(vecCol))
      .withColumn("h", Fns.hash60(col(idCol).cast("string")))
      .orderBy(col("h"), col(idCol))
      .limit(nCentroids)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(rows.nonEmpty, "empty corpus — nothing to train on")
    val dim = rows(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    Model(Array.tabulate(m, rows.length, subDim) { (j, c, i) =>
      rows(c)(j * subDim + i)
    })
  }

  /** (id, codes) — one codegen'd map pass, no shuffle. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    corpus.select(col(idCol), pqEncode(col(vecCol), model.codebook).as("codes"))

  /** Top-k by exact cosine among the `candidates` best ADC rows. */
  def topK(encoded: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
           model: Model, query: Array[Float], k: Int, candidates: Int): DataFrame = {
    require(candidates >= k, "candidate pool must be at least k")
    val cand = encoded
      .withColumn("approx_micro", pqAdcDistance(col("codes"), model.adcTable(query)))
      .orderBy(col("approx_micro"), col(idCol))
      .limit(candidates)
      .select(col(idCol))
    corpus.join(broadcast(cand), idCol)
      .withColumn("score", round(cosineSim(col(vecCol), lit(query)), 4))
      .select(col(idCol), col("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }
}
