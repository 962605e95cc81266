package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{BoundedCollect, Dedup}
import graft.functions.Fns._

/** Same-JVM, same-box INTERLEAVED A/B of the exact-Jaccard substrate
  * shapes (r13 verdict #2: "prove or retract the substrate win on one
  * box"). Reps alternate old/new within one JVM so box drift cancels;
  * medians per shape are printed at the end. Three experiments:
  *
  *  1. `lsh`  — q20's pipeline: r12 shape (plain substrate, separate
  *     sizes agg + two joins in the verifier) vs the production sized
  *     shape (sizes carried map-side, zero size joins).
  *  2. `ejp`  — the exactJaccardPairs consumer family's core: the r13
  *     shape (substrate + df/bounded-list posting BOTH persisted, gate
  *     reads the cached posting) vs the r14 production shape (count-only
  *     hashed gate pass + one fused unpersisted posting→pairs pass).
  *  3. `spread` — the substrate's repartition(par) input spread measured
  *     alone: explode+distinct+noop with the production spread vs the
  *     same expression with NO repartition (single input split).
  *
  * Usage: sbt "runMain graft.ProfileSubstrate [sfDir] [repsPerShape]". */
object ProfileSubstrate {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    docs.count() // warm reader

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      spark.sharedState.cacheManager.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    // ---- r12 shapes, reconstructed verbatim from 9a2bf27 ----
    def jaccardVerifyOld(pairs: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = pairs
        .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
        .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
        .filter(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }
    def minhashLshOld(): Long = {
      val cand = Dedup.candidatePairs(
        Dedup.bands(Dedup.minhashSignaturesHashed(
          Dedup.shingleHashRaw(docs, "doc_id", "text", 3), 16), 16, 4)).persist()
      val candDocs = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val candTexts = docs.join(broadcast(candDocs),
        docs("doc_id") === candDocs("doc_id"), "left_semi")
      val sh = Dedup.shingleSets(candTexts, "doc_id", "text", 3).persist()
      val out = jaccardVerifyOld(cand, sh, 0.5).localCheckpoint(true)
      cand.unpersist(); sh.unpersist()
      out.count()
    }
    def minhashLshNew(): Long =
      Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5).count()

    // r13 exactJaccardPairs cheap path: substrate + posting both persisted,
    // the gate reads the cached posting's df column
    def ejpR13(): Long = {
      val sh = Dedup.shingleSetsSized(docs, "doc_id", "text", 3).persist()
      val posting = sh.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df"),
          BoundedCollect.boundedCollectList(struct(col("doc_id"), col("n")),
            Dedup.StopBucketDf).as("ds"))
        .persist()
      val st = posting.agg(
          sum(col("df")).as("rows"),
          sum(col("df").cast("double") * col("df")).as("sq"),
          max(col("df")).as("maxdf"))
        .head()
      require(!st.isNullAt(0) &&
        st.getDouble(1) <= 64.0 * st.getLong(0) &&
        st.getLong(2) <= Dedup.StopBucketDf, "fixture must take the cheap path")
      val out = posting
        .filter(col("ds").isNotNull && size(col("ds")) >= 2)
        .select(col("ds"), posexplode(col("ds")).as(Seq("i", "a")))
        .select(col("a"),
          explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("b"))
        .select(least(col("a"), col("b")).as("doc_a"),
          greatest(col("a"), col("b")).as("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
        .withColumn("jaccard",
          col("inter") / (col("doc_a.n") + col("doc_b.n") - col("inter")))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a.doc_id").as("doc_a"),
          col("doc_b.doc_id").as("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
        .localCheckpoint(true)
      posting.unpersist(); sh.unpersist()
      out.count()
    }
    // production entry point: the size gate routes small inputs to the
    // cached single-aggregation shape (ejpR13 minus the wasted substrate
    // cache), large inputs to the unpersisted two-pass streaming shape —
    // force the latter via the conf knob to measure it at fixture scale
    def ejpR14Cached(): Long =
      Dedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    def ejpR14Streaming(): Long = {
      spark.conf.set("spark.graft.dedup.postingCacheMaxInputBytes", "0")
      try Dedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
      finally spark.conf
        .unset("spark.graft.dedup.postingCacheMaxInputBytes")
    }

    // spread experiment: the same sized-substrate expression with and
    // without the production repartition(par) input spread
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def substrateSpread(): Unit =
      noop(Dedup.shingleSetsSized(docs, "doc_id", "text", 3))
    def substrateNoSpread(): Unit =
      noop(docs
        .select(col("doc_id"),
          array_distinct(shingles(tokens(col("text")), 3)).as("arr"))
        .select(col("doc_id"), size(col("arr")).cast("long").as("n"),
          explode(col("arr")).as("shingle")))

    def ab(label: String, shapes: Seq[(String, () => Unit)]): Unit = {
      val times = shapes.map(_._1 -> scala.collection.mutable.ArrayBuffer[Double]()).toMap
      // one unrecorded warmup of each shape, then interleaved reps
      shapes.foreach { case (_, f) => f(); spark.sharedState.cacheManager.clearCache() }
      (1 to reps).foreach { r =>
        shapes.foreach { case (name, f) =>
          val t = timed(f())
          times(name) += t
          println(f"[prof-sub] $label/$name rep $r: $t%.3f s")
        }
      }
      shapes.foreach { case (name, _) =>
        println(f"[prof-sub] $label/$name MEDIAN: ${Bench.median(times(name).toSeq)}%.3f s")
      }
    }

    ab("lsh", Seq(
      "r12_sizes_joins" -> (() => { minhashLshOld(); () }),
      "r13_sized" -> (() => { minhashLshNew(); () })))
    ab("ejp", Seq(
      "r13_persist_gate" -> (() => { ejpR13(); () }),
      "r14_cached" -> (() => { ejpR14Cached(); () }),
      "r14_streaming" -> (() => { ejpR14Streaming(); () })))
    ab("spread", Seq(
      "with_spread" -> (() => substrateSpread()),
      "no_spread" -> (() => substrateNoSpread())))
    spark.stop()
  }
}
