package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topK agg == window row_number ground truth on real data") {
    val orders = Tables.orders(spark, sfDir)
    val top5 = TopK.topK(5)
    val agg = orders.groupBy(col("o_orderpriority"))
      .agg(top5(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_orderpriority"), explode(col("top")).as("s"))
      .select(col("o_orderpriority"), col("s.score"), col("s.id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet

    val win = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expected = orders
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") <= 5)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(agg === expected)
  }

  test("ties broken by id ascending; k larger than group returns all, sorted") {
    val df = Seq((1.0, 30L), (1.0, 10L), (1.0, 20L), (2.0, 99L))
      .toDF("score", "id").repartition(3) // force merge() across partitions
    val top3 = TopK.topK(3)
    val out = df.groupBy(lit(1).as("g"))
      .agg(top3(col("score"), col("id")).as("top"))
      .select(explode(col("top")).as("s"))
      .select(col("s.score"), col("s.id"))
      .as[(Double, Long)].collect().toSeq
    assert(out === Seq((2.0, 99L), (1.0, 10L), (1.0, 20L)))

    val top9 = TopK.topK(9)
    val all = df.groupBy(lit(1).as("g"))
      .agg(top9(col("score"), col("id")).as("top"))
      .select(explode(col("top")).as("s"))
      .select(col("s.score"), col("s.id"))
      .as[(Double, Long)].collect().toSeq
    assert(all === Seq((2.0, 99L), (1.0, 10L), (1.0, 20L), (1.0, 30L)))
  }

  test("partial aggregation bounds the buffer (reduce fast-path exactness)") {
    // 10k rows, one group, k=4 — result must be the global top 4 regardless
    // of partitioning/merge order
    val df = spark.range(0, 10000).select(
      (pmod(col("id") * 2654435761L, lit(997)) * 1.0).as("score"), col("id"))
    val top4 = TopK.topK(4)
    val out = df.groupBy(lit(1).as("g"))
      .agg(top4(col("score"), col("id")).as("top"))
      .select(explode(col("top")).as("s")).select(col("s.score"), col("s.id"))
      .as[(Double, Long)].collect().toSeq
    val expected = df.select(col("score"), col("id")).as[(Double, Long)]
      .collect().sortBy { case (s, i) => (-s, i) }.take(4).toSeq
    assert(out === expected)
  }
}
