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

  test("native buffer: random streams + NaN + ties match a reference sort; " +
    "serde round-trips; merge order-independent") {
    import graft.ops.TopK.{Buffer, TopKAggregate}
    val rnd = new scala.util.Random(42)
    val ord = Ordering.by[(Double, Long), (Double, Long)] {
      case (s, i) => (-s, i)
    }(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    for (trial <- 1 to 50) {
      val k = 1 + rnd.nextInt(12)
      val n = rnd.nextInt(60)
      // heavy tie mass + NaN injections: scores drawn from 5 values
      val xs = Seq.fill(n)((
        if (rnd.nextInt(10) == 0) Double.NaN else rnd.nextInt(5).toDouble,
        rnd.nextInt(30).toLong))
      val expected = xs.sorted(ord).take(k)
      val b = new Buffer(k)
      xs.foreach { case (s, i) => b.insert(s, i) }
      def drain(x: Buffer): Seq[(Double, Long)] =
        (0 until x.n).map(j => (x.scores(j), x.ids(j)))
      assert(drain(b).map(_.toString) === expected.map(_.toString), s"trial $trial insert")
      // split-merge in both orders == sequential
      val (l, r) = xs.splitAt(rnd.nextInt(n + 1))
      val bl = new Buffer(k); l.foreach { case (s, i) => bl.insert(s, i) }
      val br = new Buffer(k); r.foreach { case (s, i) => br.insert(s, i) }
      val agg = TopKAggregate(
        org.apache.spark.sql.catalyst.expressions.Literal(0.0),
        org.apache.spark.sql.catalyst.expressions.Literal(0L), k)
      // serde round-trip on one side, then merge
      val blRt = agg.deserialize(agg.serialize(bl))
      blRt.mergeFrom(br)
      assert(drain(blRt).map(_.toString) === expected.map(_.toString), s"trial $trial merge")
    }
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
