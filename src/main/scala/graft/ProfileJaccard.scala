package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{BoundedCollect, Dedup}

/** Stage-by-stage timing of the exact-Jaccard substrate (the heavy-tail
  * family's shared core), profiling the shapes `Dedup.exactJaccardPairs`
  * ACTUALLY runs since round 14: an unpersisted count-only gate pass over
  * the hashed distinct substrate, then one fused unpersisted
  * posting→pairs→intersection pass over the sized substrate. Stages 5–6
  * additionally time the HISTORICAL round-8 shape (separate sizes agg +
  * two joins) for comparison against the sized tail — the r13 A/B's
  * contrast, kept runnable.
  * Usage: sbt "runMain graft.ProfileJaccard [sfDir] [iters]". */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof-jac] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = Tables.documents(spark, dir)
    docs.count() // warm reader

    (1 to iters).foreach { i =>
      println(s"[prof-jac] --- iter $i ---")
      // 1. sized shingle substrate alone (explode + array_distinct + n)
      val sh = Dedup.shingleSetsSized(docs, "doc_id", "text", 3)
      t("shingleSetsSized noop (explode only)")(noop(sh))
      // 2. the round-14 GATE pass: count-only agg over hashed sets
      t("gate pass (hashed count agg + stats head)")(
        Dedup.shingleHashSets(docs, "doc_id", "text", 3)
          .groupBy(col("sh_h")).agg(count(lit(1)).as("df"))
          .agg(sum(col("df")), sum(col("df").cast("double") * col("df")),
            max(col("df"))).head())
      // 3. the fused pair pass: sized posting agg → pair emit → inter agg
      //    → jaccard tail, all unpersisted (the production cheap branch)
      val posting = sh.groupBy(col("shingle"))
        .agg(BoundedCollect.boundedCollectList(struct(col("doc_id"), col("n")),
          Dedup.StopBucketDf).as("ds"))
      t("fused sized posting→pairs noop")(noop(
        posting
          .filter(col("ds").isNotNull && size(col("ds")) >= 2)
          .select(col("ds"), posexplode(col("ds")).as(Seq("i", "a")))
          .select(col("a"),
            explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("b"))
          .select(least(col("a"), col("b")).as("doc_a"),
            greatest(col("a"), col("b")).as("doc_b"))
          .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
          .withColumn("jaccard",
            col("inter") / (col("doc_a.n") + col("doc_b.n") - col("inter")))
          .filter(col("jaccard") >= 0.5)))
      // 4. the production entry point end-to-end, cold
      spark.sharedState.cacheManager.clearCache()
      t("exactJaccardPairs END-TO-END (count)")(
        Dedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
      // 5-6. HISTORICAL round-8 tail for contrast: separate sizes agg over
      // the plain substrate + two joins (what the sized substrate removed)
      val shOld = Dedup.shingleSets(docs, "doc_id", "text", 3).persist()
      shOld.count()
      val interOld = shOld.groupBy(col("shingle"))
        .agg(BoundedCollect.boundedCollectList(col("doc_id"),
          Dedup.StopBucketDf).as("ds"))
        .filter(col("ds").isNotNull && size(col("ds")) >= 2)
        .select(col("ds"), posexplode(col("ds")).as(Seq("i", "a")))
        .select(col("a"),
          explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("b"))
        .select(least(col("a"), col("b")).as("doc_a"),
          greatest(col("a"), col("b")).as("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      val sizesOld = shOld.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      t("historical r8 tail (sizes agg + 2 joins) noop")(noop(
        interOld
          .join(sizesOld.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("n", "na"), "doc_a")
          .join(sizesOld.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("n", "nb"), "doc_b")
          .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
          .filter(col("jaccard") >= 0.5)))
      shOld.unpersist()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
