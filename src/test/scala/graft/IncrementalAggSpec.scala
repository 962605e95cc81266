package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.{IncrementalAgg, Sketches}

class IncrementalAggSpec extends SparkSpec {

  test("three incremental refreshes == one full recompute (real events)") {
    val ev = Tables.events(spark, sfDir)
    val dir = Files.createTempDirectory("incragg").toString + "/rollup"
    val batches = Seq(
      ev.filter(dayofmonth(col("ts")) <= 10),
      ev.filter(dayofmonth(col("ts")).between(11, 20)),
      ev.filter(dayofmonth(col("ts")) > 20))
    batches.foreach(b =>
      IncrementalAgg.refresh(spark, dir, b, Seq("event_type"), "value"))

    val got = IncrementalAgg.finalized(spark.read.parquet(dir))
      .select("event_type", "cnt", "sm", "mn", "mx", "avg")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap

    val full = IncrementalAgg.finalized(
        IncrementalAgg.partial(ev, Seq("event_type"), "value"))
      .select("event_type", "cnt", "sm", "mn", "mx", "avg")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap

    assert(got.keySet === full.keySet)
    got.foreach { case (k, (cnt, sm, mn, mx, _)) =>
      val (fcnt, fsm, fmn, fmx, _) = full(k)
      assert(cnt === fcnt, s"$k cnt")
      assert(math.abs(sm - fsm) < 1e-6, s"$k sum")   // double sum: order-dependent ulps
      assert(mn === fmn, s"$k min")
      assert(mx === fmx, s"$k max")
    }
  }

  test("refresh recovers the .swap.old crash snapshot instead of resetting state") {
    import spark.implicits._
    val dir = Files.createTempDirectory("incrcrash").toString + "/rollup"
    val b1 = Seq(("a", 1.0), ("a", 3.0)).toDF("k", "v")
    val b2 = Seq(("a", 5.0)).toDF("k", "v")
    IncrementalAgg.refresh(spark, dir, b1, Seq("k"), "v")
    // simulate a crash inside a later swapWrite: state retired to .swap.old,
    // promotion never happened
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".swap.old")))
    IncrementalAgg.refresh(spark, dir, b2, Seq("k"), "v")
    val r = spark.read.parquet(dir).filter(col("k") === "a").head()
    assert(r.getLong(r.fieldIndex("cnt")) === 3L, "crash snapshot was not merged")
    assert(r.getDouble(r.fieldIndex("sm")) === 9.0)
  }

  test("refreshPartialPartitioned == refreshPartial result; untouched day " +
    "partitions byte-identical") {
    import spark.implicits._
    val flat = Files.createTempDirectory("incrpflat").toString + "/rollup"
    val part = Files.createTempDirectory("incrppart").toString + "/rollup"
    val keys = Seq("day", "k")
    val b1 = Seq(("d1", "a", 1.0), ("d1", "a", 3.0), ("d2", "b", 2.0),
      ("d3", "c", 7.0)).toDF("day", "k", "v")
    val b2 = Seq(("d3", "c", 5.0), ("d3", "d", 1.0)).toDF("day", "k", "v") // d3 only
    def state(b: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.partial(b, keys, "v")
    IncrementalAgg.refreshPartial(spark, flat, state(b1), keys)
    IncrementalAgg.refreshPartialPartitioned(spark, part, state(b1), keys, Seq("day"))
    def files(rel: String) = new java.io.File(part, rel).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSet
    val d1Before = files("day=d1")
    val d2Before = files("day=d2")
    IncrementalAgg.refreshPartial(spark, flat, state(b2), keys)
    val touched = IncrementalAgg.refreshPartialPartitioned(
      spark, part, state(b2), keys, Seq("day"))
    assert(touched === Seq("day=d3"), s"only day=d3 may be rewritten, got $touched")
    assert(files("day=d1") === d1Before, "day=d1 was rewritten")
    assert(files("day=d2") === d2Before, "day=d2 was rewritten")
    def snap(p: String) = spark.read.parquet(p)
      .select(col("day").cast("string"), col("k"), col("cnt"), col("sm"),
        col("mn"), col("mx"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(snap(part) === snap(flat),
      "partition-scoped refresh diverged from the full refresh")
  }

  test("refresh batches in any order — state is a commutative monoid") {
    import spark.implicits._
    val d1 = Seq(("a", 1.0), ("a", 5.0), ("b", 2.0)).toDF("k", "v")
    val d2 = Seq(("a", 3.0), ("c", 7.0)).toDF("k", "v")
    val p12 = IncrementalAgg.merge(
      IncrementalAgg.partial(d1, Seq("k"), "v"),
      IncrementalAgg.partial(d2, Seq("k"), "v"), Seq("k"))
    val p21 = IncrementalAgg.merge(
      IncrementalAgg.partial(d2, Seq("k"), "v"),
      IncrementalAgg.partial(d1, Seq("k"), "v"), Seq("k"))
    val as = p12.orderBy("k").collect().toSeq
    val bs = p21.orderBy("k").collect().toSeq
    assert(as === bs)
    val a = p12.filter(col("k") === "a").head()
    assert(a.getLong(a.fieldIndex("cnt")) === 3L)
    assert(a.getDouble(a.fieldIndex("sm")) === 9.0)
    assert(a.getDouble(a.fieldIndex("mn")) === 1.0)
    assert(a.getDouble(a.fieldIndex("mx")) === 5.0)
  }

  test("HLL sketches: merged daily partials == whole-data sketch, ~exact at this scale") {
    val ev = Tables.events(spark, sfDir)
    val daily = ev.withColumn("day", dayofmonth(col("ts")))
      .groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val merged = Sketches.estimate(
        Sketches.mergeSketches(daily, Seq("event_type")))
      .select(col("event_type"), col("approx_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val whole = Sketches.estimate(
        Sketches.distinctSketch(ev, Seq("event_type"), "user_id"))
      .select(col("event_type"), col("approx_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === whole) // sketch union is lossless vs one-shot build

    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    merged.foreach { case (k, est) =>
      val err = math.abs(est.toDouble - exact(k)) / exact(k).toDouble
      assert(err < 0.05, s"$k: est=$est exact=${exact(k)} err=$err")
    }
  }

  test("KLL quantile sketches: daily partials merge losslessly, exact median " +
    "lands at rank 0.5 within the bound, any-quantile estimates hold") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"), dayofmonth(col("ts")).as("day"))
    val daily = Sketches.quantileSketch(ev, Seq("event_type", "day"), "value")
    val merged = Sketches.mergeQuantileSketches(daily.drop("day"), Seq("event_type"))

    // exact per-type percentiles, driver-side comparables
    val exact = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

    val got = merged
      .select(col("event_type"),
        Sketches.quantileOf(col("qsk"), 0.5).as("q50"),
        Sketches.quantileOf(col("qsk"), 0.9).as("q90"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got.keySet === exact.keySet)

    // the sketch's rank of the true median must sit at 0.5 ± the KLL bound
    val ranks = merged
      .join(ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("p50")), "event_type")
      .select(col("event_type"), Sketches.rankOf(col("qsk"), col("p50")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ranks.foreach { case (k, r) =>
      assert(math.abs(r - 0.5) <= 0.05, s"$k: rank(exact median)=$r")
    }
    // and the estimated quantile VALUES must bracket the exact ones within
    // the value spread (rank error translates to value error via density;
    // generated values are well-spread, so 10% of the p90 scale is lax)
    got.foreach { case (k, (q50, q90)) =>
      val (e50, e90) = exact(k)
      assert(math.abs(q50 - e50) <= math.abs(e90) * 0.1 + 1e-6,
        s"$k: q50=$q50 exact=$e50")
      assert(q90 >= q50, s"$k: quantiles not monotone")
    }
  }

  test("theta sketches: partials union losslessly; intersection/union/diff " +
    "estimates match exact set algebra at exact-mode cardinalities") {
    val du = Tables.events(spark, sfDir)
      .filter(dayofmonth(col("ts")) <= 4)
      .select(dayofmonth(col("ts")).as("d"), col("user_id"), col("event_type"))

    // two-level fold equals a direct one-level sketch
    val partials = Sketches.thetaSketch(du, Seq("d", "event_type"), "user_id")
    val daily = Sketches.mergeThetaSketches(partials.drop("event_type"), Seq("d"))
    val direct = Sketches.thetaSketch(du, Seq("d"), "user_id")
    val folded = daily.select(col("d"), Sketches.thetaEstimate(col("tsk")).as("e"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val one = direct.select(col("d"), Sketches.thetaEstimate(col("tsk")).as("e"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(folded === one, "two-level fold drifted from direct sketch")

    // estimates == exact distinct counts (exact mode below 2^lgK)
    val exactCnt = du.select("d", "user_id").distinct()
      .groupBy("d").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    folded.foreach { case (d, e) =>
      assert(math.rint(e).toLong == exactCnt(d), s"day $d: est=$e exact=${exactCnt(d)}")
    }

    // pairwise set algebra vs exact joins
    val dist = du.select("d", "user_id").distinct()
    val exactOv = dist.as("a").join(dist.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.d") < col("b.d"))
      .groupBy(col("a.d").as("da"), col("b.d").as("db"))
      .agg(count(lit(1)).as("ov"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val sk = daily.collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]]("tsk")).toMap
    val pairsDf = daily.select(col("d").as("da"), col("tsk").as("ska"))
      .crossJoin(daily.select(col("d").as("db"), col("tsk").as("skb")))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"),
        Sketches.thetaEstimate(Sketches.thetaIntersect(col("ska"), col("skb"))).as("i"),
        Sketches.thetaEstimate(Sketches.thetaUnion(col("ska"), col("skb"))).as("u"),
        Sketches.thetaEstimate(Sketches.thetaANotB(col("ska"), col("skb"))).as("x"))
      .collect()
    assert(sk.size >= 3 && pairsDf.nonEmpty)
    pairsDf.foreach { r =>
      val (da, db) = (r.getInt(0), r.getInt(1))
      val ov = exactOv((da, db))
      val (ca, cb) = (exactCnt(da), exactCnt(db))
      assert(math.rint(r.getDouble(2)).toLong == ov, s"($da,$db) intersect")
      assert(math.rint(r.getDouble(3)).toLong == ca + cb - ov, s"($da,$db) union")
      assert(math.rint(r.getDouble(4)).toLong == ca - ov, s"($da,$db) aNotB")
    }
  }

  test("joinDelta: old join + delta == full join, for any disjoint split") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val a = (1 to 400).map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(1000)))
      .toDF("k", "av")
    val b = (1 to 300).map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(1000)))
      .toDF("k", "bv")
    for (m <- Seq(2, 7)) {
      val (aOld, aD) = (a.filter(col("av") % m =!= 0), a.filter(col("av") % m === 0))
      val (bOld, bD) = (b.filter(col("bv") % m =!= 0), b.filter(col("bv") % m === 0))
      def bag(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val full = bag(a.join(b, "k"))
      val old = bag(aOld.join(bOld, "k"))
      val delta = bag(IncrementalAgg.joinDelta(aOld, aD, bOld, bD, Seq("k")))
      // bag union of old + delta must equal the full join exactly
      val merged = (old.keySet ++ delta.keySet).map(r =>
        r -> (old.getOrElse(r, 0) + delta.getOrElse(r, 0))).toMap
      assert(merged === full, s"split mod $m")
      // and the delta never re-emits an old row
      assert(delta.keySet.forall(r => old.getOrElse(r, 0) + delta(r) == full(r)))
    }
  }
}
