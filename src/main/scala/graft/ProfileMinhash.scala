package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Stage-by-stage timing of the minhash-LSH pipeline at sf0.1, mirroring
  * `Dedup.minhashLsh`'s exact structure (raw persist → signatures → bands →
  * candidates → candidate-restricted shingle sets → verify). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.EngineConf.tuned(SparkSession.builder()).master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    docs.count() // warm reader

    val cand = Dedup.candidatePairs(
      Dedup.bands(Dedup.minhashSignatures(
        Dedup.shingleRaw(docs, "doc_id", "text", 3), 16), 16, 4)).persist()
    t("explode→sig→bands→candidates (one streamed chain)")(cand.count())
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    t("candDocs")(candDocs.count())
    val candTexts = docs.join(broadcast(candDocs),
      docs("doc_id") === candDocs("doc_id"), "left_semi")
    val sh = Dedup.shingleSets(candTexts, "doc_id", "text", 3).persist()
    t("candidate shingle sets+persist")(sh.count())
    t("verify")(Dedup.jaccardVerify(cand, sh, 0.5).count())
    cand.unpersist(); sh.unpersist()
    spark.sharedState.cacheManager.clearCache()
    t("full pipeline fresh (uncached)")(
      Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5).count())
    spark.sharedState.cacheManager.clearCache()
    t("full pipeline again (cache cleared)")(
      Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5).count())
    spark.stop()
  }
}
