package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(1.0f, 2.0f, 2.0f), Array(2.0f, 4.0f, 4.0f)),
    (4L, Array(3.0f, 4.0f, 0.0f), Array(4.0f, 3.0f, 0.0f))
  ).toDF("id", "a", "b")

  test("cosine similarity: identical=1, orthogonal=0, parallel=1") {
    val out = df.select($"id", cosineSim($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    assert(math.abs(out(2L)) < 1e-12)
    assert(math.abs(out(3L) - 1.0) < 1e-12)
    assert(math.abs(out(4L) - 24.0 / 25.0) < 1e-12)
  }

  test("dot product") {
    val out = df.select($"id", dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === 1.0)
    assert(out(2L) === 0.0)
    assert(out(3L) === 18.0)
    assert(out(4L) === 24.0)
  }

  test("l2 squared distance") {
    val out = df.select($"id", l2sq($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === 0.0)
    assert(out(2L) === 2.0)
    assert(out(3L) === 9.0)
    assert(out(4L) === 2.0)
  }

  test("null propagates (nullIntolerant)") {
    val withNull = Seq((1L, Array(1.0f), Option.empty[Array[Float]]))
      .toDF("id", "a", "b")
    val r = withNull.select(cosineSim($"a", $"b")).collect()
    assert(r(0).isNullAt(0))
  }

  test("expression survives codegen on a real parquet scan") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val n = emb.crossJoin(broadcast(q))
      .select(cosineSim($"embedding", $"qvec").as("s"))
      .filter($"s".between(-1.0000001, 1.0000001))
      .count()
    assert(n === emb.count())
  }
}
