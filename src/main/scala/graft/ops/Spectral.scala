package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed spectral analysis of an embedding column: Gramian
  * accumulation and power iteration for the dominant principal direction.
  * The 100 TB shape: per-row outer products collapse into ONE map-side-
  * combined aggregation over d² keys (d = vector dim, so the shuffle is
  * d²-bounded regardless of corpus size), and each matvec round is a
  * d²-row join against a broadcast d-row vector — never a corpus-sized
  * iteration, and nothing ever collects to the driver.
  *
  * Used for embedding-space QA (dominant-direction drift, anisotropy — the
  * "rogue dimension" diagnosis) over the same vectors the reference stores
  * in its vector store (`memory/memory_graph.py:1015`).
  */
object Spectral {

  /** Second-moment (uncentered Gramian) matrix G[i,j] = Σ_rows v_i·v_j as
    * (i, j, g) rows. Entries accumulate in doubles; only d² keys shuffle. */
  def gramian(vectors: DataFrame, vecCol: String): DataFrame =
    vectors
      .select(posexplode(col(vecCol)).as(Seq("i", "xi")), col(vecCol))
      .select(col("i"), col("xi"),
        posexplode(col(vecCol)).as(Seq("j", "xj")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("xi").cast("double") * col("xj").cast("double")).as("g"))

  /** Power iteration on a (i, j, g) Gramian of dimension `dim`:
    * w ← normalize(G·w), starting from the uniform unit vector, `rounds`
    * matvecs. Returns (i, loading) with float32 loadings (matvec partial
    * sums are partition-order sensitive in the last ulp; the emit cast
    * absorbs it — nothing upstream of the cast ranks on that bit).
    * Deterministic: no RNG, fixed start, fixed round count — re-runs and
    * retries converge to the identical output. */
  def powerIteration(gram: DataFrame, dim: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val g = gram.localCheckpoint(true) // every round re-reads the d² relation
    val w0 = lit(1.0 / math.sqrt(dim.toDouble))
    var w: DataFrame = g.groupBy(col("i"))
      .agg(sum(col("g") * w0).as("u"))
    for (_ <- 1 until rounds) {
      val normed = w.crossJoin(broadcast(
          w.agg(sqrt(sum(col("u") * col("u"))).as("nrm"))))
        .select(col("i").as("j"), (col("u") / col("nrm")).as("wj"))
      w = g.join(broadcast(normed), g("j") === normed("j"))
        .groupBy(g("i"))
        .agg(sum(g("g") * normed("wj")).as("u"))
    }
    w.crossJoin(broadcast(w.agg(sqrt(sum(col("u") * col("u"))).as("nrm"))))
      .select(col("i"), (col("u") / col("nrm")).cast("float").as("loading"))
  }
}
