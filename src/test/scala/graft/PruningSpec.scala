package graft

import org.apache.spark.sql.functions._
import graft.ops.Pruning

class PruningSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin == exact left-semi join (long keys, real tables)") {
    val fact = Tables.lineitem(spark, sfDir)
    val dim = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val pruned = Pruning.bloomSemiJoin(fact, "l_orderkey", dim, "o_orderkey",
        expectedItems = 10000L)
      .select(col("l_orderkey"), col("l_linenumber"))
    val exact = fact
      .join(dim.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
    assert(pruned.exceptAll(exact).isEmpty && exact.exceptAll(pruned).isEmpty)
  }

  test("bloomSemiJoin string keys + null keys dropped") {
    val fact = Seq(("a", 1), ("b", 2), ("c", 3), (null, 4)).toDF("k", "v")
    val dim = Seq("a", "c", "zz").toDF("k")
    val out = Pruning.bloomSemiJoin(fact, "k", dim, "k", expectedItems = 100L)
      .select("k", "v").as[(String, Int)].collect().toSet
    assert(out === Set(("a", 1), ("c", 3)))
  }

  test("tiny fpp-stressed bloom still exact (false positives re-checked)") {
    // deliberately undersized sketch -> high fp rate; semi join must fix it
    val fact = spark.range(0, 5000).select(col("id").as("k"))
    val dim = spark.range(0, 5000, 17).select(col("id").as("k"))
    val out = Pruning.bloomSemiJoin(fact, "k", dim, "k",
        expectedItems = 10L, fpp = 0.5)
      .as[Long].collect().toSet
    assert(out === (0L until 5000L by 17L).toSet)
  }
}
