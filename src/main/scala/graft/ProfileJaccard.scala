package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{BoundedCollect, Dedup}

/** Stage-by-stage timing of the exact-Jaccard substrate (the heavy-tail
  * family's shared core: shingle → posting agg → pair emit → inter agg →
  * sizes + joins), so an optimization round attacks the step that actually
  * costs instead of the one that looks structural. Mirrors
  * `Dedup.exactJaccardPairs`' cheap (inverted-index) branch exactly.
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
      // 1. shingle substrate alone (explode + array_distinct), no shuffle
      val sh = Dedup.shingleSets(docs, "doc_id", "text", 3)
      t("shingleSets noop (explode only)")(noop(sh))
      val shP = sh.persist()
      t("shingleSets persist+count")(shP.count())
      // 2. the shared posting aggregation (df + bounded list)
      val posting = shP.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df"),
          BoundedCollect.boundedCollectList(col("doc_id"), Dedup.StopBucketDf).as("ds"))
        .persist()
      t("posting agg (df + bounded lists) persist")(noop(posting))
      // 3. the gate's single-row stats read
      t("gate stats head()")(posting.agg(
        sum(col("df")).as("rows"),
        sum(col("df").cast("double") * col("df")).as("sq"),
        max(col("df")).as("maxdf")).head())
      // 4. pair emit + inter agg from the postings
      val pairs = posting.select(col("ds"))
        .filter(col("ds").isNotNull && size(col("ds")) >= 2)
        .select(col("ds"), posexplode(col("ds")).as(Seq("i", "a")))
        .select(col("a"),
          explode(slice(col("ds"), col("i") + lit(2), size(col("ds")))).as("b"))
        .select(least(col("a"), col("b")).as("doc_a"),
          greatest(col("a"), col("b")).as("doc_b"))
      val inter = pairs.groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
      t("pair emit + inter agg noop")(noop(inter))
      // 5. sizes agg alone
      val sizes = shP.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      t("sizes agg noop")(noop(sizes))
      // 6. the full tail: inter ⋈ sizes ⋈ sizes + filter + sort
      val full = inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
      t("full tail (joins+filter+sort) noop")(noop(full))
      // 7. the production entry point end-to-end, cold
      posting.unpersist(); shP.unpersist()
      spark.sharedState.cacheManager.clearCache()
      t("exactJaccardPairs END-TO-END (count)")(
        Dedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
