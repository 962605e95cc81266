package graft

import graft.ops.PrefixSum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("globalRunningSum is BIT-EQUAL to the sequential cumulative " +
       "and never funnels rows through one partition") {
    val rnd = new scala.util.Random(7)
    val df = (1L to 5000L).map(i => (i, rnd.nextDouble() * 100 - 20))
      .toDF("k", "v")
    val dec = col("v").cast("decimal(30,10)")
    val out = PrefixSum.globalRunningSum(df, Seq(col("k")), dec)
    // reference: explicit single-partition sequential scan over the SAME
    // decimal images — decimal accumulation is order-independent, so the
    // two-pass result must be exactly equal, not merely close
    val seqW = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("running", sum(dec).over(seqW))
      .collect().map(r => r.getLong(0) -> r.getDecimal(2)).toMap
    val got = out.collect().map(r => r.getLong(0) -> r.getDecimal(2)).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (k, v) =>
      assert(v.compareTo(expect(k)) == 0, s"row $k: $v vs ${expect(k)}")
    }
    // the plan's window runs per-pid, not over one global partition
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "global cumsum fell back to a single-partition exchange:\n" + plan)

    // a non-decimal measure is a loud error, not silent drift
    intercept[IllegalArgumentException] {
      PrefixSum.globalRunningSum(df, Seq(col("k")), col("v"))
    }
  }

  test("globalRunningMax equals the sequential running max and never " +
       "funnels rows through one partition") {
    val rnd = new scala.util.Random(11)
    val df = (1L to 5000L).map(i => (i, rnd.nextLong() % 1000000L))
      .toDF("k", "v")
    val out = PrefixSum.globalRunningMax(df, Seq(col("k")), col("v"))
    val seqW = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("running_max", max(col("v")).over(seqW))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === expect)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      "global running max fell back to a single-partition exchange:\n" + plan)
    // a non-long measure is a loud error
    intercept[IllegalArgumentException] {
      PrefixSum.globalRunningMax(df, Seq(col("k")), col("v").cast("double"))
    }
  }

  test("globalRowNumber is BIT-EQUAL to the single-window row_number " +
       "(asc and desc, skewed keys) and never funnels through one partition") {
    val rnd = new scala.util.Random(23)
    // heavy-tailed first key (lots of range-boundary ties) + unique tie-break
    val df = (1L to 20000L).map { i =>
      (i, math.min(rnd.nextInt(40), rnd.nextInt(4)), rnd.nextDouble())
    }.toDF("id", "grp", "v")
    for (order <- Seq(Seq(col("grp"), col("id")),
                      Seq(desc("v"), col("id")),
                      Seq(col("grp"), desc("v"), col("id")))) {
      val out = PrefixSum.globalRowNumber(df, order, "rn")
      val expect = df.withColumn("rn",
          row_number().over(Window.orderBy(order: _*)).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val got = out.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got === expect, s"order $order")
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange SinglePartition"),
        "global row_number fell back to a single-partition exchange:\n" + plan)
    }
    // the with-count variant reports the exact N it already knows
    val (_, n) = PrefixSum.globalRowNumberWithCount(df, Seq(col("id")))
    assert(n === 20000L)
  }

  test("globalNtile matches single-window ntile for every (N, buckets) " +
       "shape: N<n, N=n, divisible, remainder, skew") {
    val rnd = new scala.util.Random(31)
    for ((rows, buckets) <- Seq((3, 10), (10, 10), (40, 4), (4033, 10),
                                (997, 3), (5000, 4))) {
      val df = (1L to rows.toLong).map { i =>
        (i, math.min(rnd.nextInt(1000), rnd.nextInt(30)))
      }.toDF("id", "x")
      val order = Seq(col("x"), col("id"))
      val out = PrefixSum.globalNtile(df, buckets, order, "b")
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      val expect = df.withColumn("b",
          ntile(buckets).over(Window.orderBy(order: _*)))
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(out === expect, s"rows=$rows buckets=$buckets")
    }
    // empty input: no rows, no crash
    val empty = Seq.empty[(Long, Long)].toDF("id", "x")
    assert(PrefixSum.globalNtile(empty, 7, Seq(col("x"), col("id")), "b")
      .count() === 0L)
  }

  test("concurrencyProfile: hand-checked sweep, net sums to zero") {
    // intervals [1,4), [2,3), [3,5): concurrency 1,2,2,1 at t=1..4
    val iv = Seq((1L, 4L), (2L, 3L), (3L, 5L)).toDF("s", "e")
    val out = PrefixSum.concurrencyProfile(iv, col("s"), col("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 0L, 2L),
      (4L, -1L, 1L), (5L, -1L, 0L)))
  }
}
