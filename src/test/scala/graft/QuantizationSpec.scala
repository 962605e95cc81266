package graft

import org.apache.spark.sql.functions._

import graft.functions.QuantFunctions._
import graft.functions.VectorFunctions._
import graft.ops.Similarity

/** INT8 scalar quantization: round-trip error bound, scale-free cosine,
  * and the quantize→prune→exact-rescore KNN matching the exact top-k. */
class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("quantize: values land in [-127,127], reconstruction error <= scale/2") {
    val vecs = Seq(
      (1L, Array(0.3f, -1.7f, 0.0f, 2.4f)),
      (2L, Array(-0.001f, 0.002f, -0.003f, 0.004f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // zero vector: scale falls back to 1
      .toDF("id", "emb")
    val rows = vecs.select(col("id"), col("emb"),
        int8Quantize(col("emb")).as("q"), int8Scale(col("emb")).as("s"))
      .collect()
    rows.foreach { r =>
      val emb = r.getSeq[Float](1)
      val q = r.getAs[Array[Byte]](2)
      val s = r.getDouble(3)
      assert(q.length === emb.length)
      q.foreach(b => assert(b >= -127 && b <= 127))
      emb.zip(q).foreach { case (x, b) =>
        assert(math.abs(x.toDouble - b * s) <= s / 2 + 1e-12,
          s"|$x - $b*$s| exceeds half a quantization step")
      }
    }
    // zero vector quantizes to all zeros with scale 1
    val z = rows.find(_.getLong(0) == 3L).get
    assert(z.getAs[Array[Byte]](2).forall(_ == 0) && z.getDouble(3) === 1.0)
  }

  test("int8 cosine approximates float cosine (scales cancel)") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f, 4.0f), Array(2.0f, 1.0f, 0.5f, 3.0f)),
      (Array(0.1f, -0.2f, 0.3f, -0.4f), Array(-0.1f, 0.2f, -0.3f, 0.4f)),
      (Array(5.0f, 0.0f, 0.0f, 0.0f), Array(5.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("a", "b")
    val out = df.select(
        cosineSim(col("a"), col("b")).as("exact"),
        int8Cosine(int8Quantize(col("a")), int8Quantize(col("b"))).as("approx"))
      .collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.02,
        s"quantized cosine ${r.getDouble(1)} far from exact ${r.getDouble(0)}")
    }
    assert(out.last.getDouble(1) === 1.0) // identical vectors stay exactly 1
  }

  test("knnCosineInt8 with rescore == exact knn top-k on a clustered corpus") {
    val corpus = (0 until 300).map { i =>
      val axis = i % 3
      val base = Array.fill(8)(0.05f + (i % 7) * 0.01f)
      base(axis) = 1.0f + (i / 3) * 0.002f
      (i.toLong, base)
    }.toDF("id", "emb")
    val qv = { val a = Array.fill(8)(0.0f); a(1) = 1.0f; a }
    val query = Seq(Tuple1(qv)).toDF("qvec")

    val exactTop = corpus.crossJoin(query)
      .withColumn("score", round(cosineSim(col("emb"), col("qvec")), 4))
      .orderBy(desc("score"), col("id"))
      .limit(10).select("id").as[Long].collect().toSeq
    val quantTop = Similarity.knnCosineInt8(corpus, query, "id", "emb", k = 10)
      .select("id").as[Long].collect().toSeq
    assert(quantTop === exactTop)
  }

  test("generated code compiles (no silent interpreted fallback) and matches eval") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    import graft.functions.{Int8CosineSim, Int8Quantize, Int8Scale}

    // GenerateUnsafeProjection THROWS on a Janino error — unlike whole-stage
    // codegen, which quietly falls back to interpreted eval and would let a
    // broken doGenCode ship.
    val row = InternalRow(ArrayData.toArrayData(Array(0.3f, -1.7f, 0.0f, 2.4f)))
    val a = BoundReference(0, ArrayType(FloatType), nullable = false)
    val scaleOut = GenerateUnsafeProjection.generate(Seq(Int8Scale(a)))(row)
    assert(scaleOut.getDouble(0) === Int8Scale(a).eval(row))
    val quantOut = GenerateUnsafeProjection.generate(Seq(Int8Quantize(a)))(row)
    val interp = Int8Quantize(a).eval(row).asInstanceOf[Array[Byte]]
    assert(quantOut.getBinary(0).toSeq === interp.toSeq)

    val b = BoundReference(0, BinaryType, nullable = false)
    val c = BoundReference(1, BinaryType, nullable = false)
    val cosOut = GenerateUnsafeProjection.generate(Seq(Int8CosineSim(b, c)))(
      InternalRow(interp, interp))
    assert(cosOut.getDouble(0) === 1.0)
  }
}
