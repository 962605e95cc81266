package graft

import graft.ops.Spectral
import org.apache.spark.sql.functions._

class SpectralSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: Seq[Array[Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")

  test("gramian: symmetric, diagonal = per-dim sum of squares") {
    val df = vecs(Seq(
      Array(1f, 2f, 0f), Array(0f, 1f, 3f), Array(2f, 0f, 1f)))
    val g = Spectral.gramian(df, "vec").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(g((0, 0)) === 1.0 + 0.0 + 4.0)
    assert(g((1, 1)) === 4.0 + 1.0 + 0.0)
    assert(g((2, 2)) === 0.0 + 9.0 + 1.0)
    for (i <- 0 until 3; j <- 0 until 3) assert(g((i, j)) === g((j, i)))
    // off-diagonal spot check: G[0,1] = 1*2 + 0*1 + 2*0
    assert(g((0, 1)) === 2.0)
  }

  test("powerIteration: recovers a planted dominant axis") {
    // 20 vectors strongly aligned with e0 plus small fixed cross terms:
    // the top principal direction must load ~entirely on dim 0.
    val rows = (0 until 20).map { i =>
      Array(10f + (i % 3), 0.1f * (i % 5), 0.05f * (i % 7), 0.02f * (i % 2))
    }
    val out = Spectral.powerIteration(
        Spectral.gramian(vecs(rows), "vec"), dim = 4, rounds = 3)
      .collect().map(r => r.getInt(0) -> r.getFloat(1)).toMap
    assert(math.abs(out(0)) > 0.99f)
    assert(out.values.map(x => x * x).sum > 0.999 && // unit norm
      out.values.map(x => x * x).sum < 1.001)
    (1 until 4).foreach(i => assert(math.abs(out(i)) < 0.1f))
  }

  test("powerIteration matches a single-threaded reference on a small case") {
    val rows = Seq(
      Array(1f, 2f, 3f), Array(4f, 5f, 6f), Array(7f, 8f, 10f))
    val d = 3
    // reference: dense Gramian + 2 matvecs from uniform start
    val g = Array.ofDim[Double](d, d)
    for (v <- rows; i <- 0 until d; j <- 0 until d)
      g(i)(j) += v(i).toDouble * v(j).toDouble
    var w = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to 2) {
      val u = (0 until d).map(i => (0 until d).map(j => g(i)(j) * w(j)).sum).toArray
      val n = math.sqrt(u.map(x => x * x).sum)
      w = u.map(_ / n)
    }
    val out = Spectral.powerIteration(
        Spectral.gramian(vecs(rows), "vec"), dim = d, rounds = 2)
      .collect().map(r => r.getInt(0) -> r.getFloat(1)).toMap
    (0 until d).foreach { i =>
      assert(math.abs(out(i) - w(i).toFloat) < 1e-6f,
        s"dim $i: got ${out(i)}, want ${w(i)}")
    }
  }
}
