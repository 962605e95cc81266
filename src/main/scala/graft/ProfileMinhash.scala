package graft

import org.apache.spark.sql.SparkSession
import graft.ops.Dedup

/** Stage-by-stage timing of the minhash pipeline at sf0.1. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    // warm
    docs.count()
    val sh = Dedup.shingleSets(docs, "doc_id", "text", 3).persist()
    t("shingleSets+persist")(sh.count())
    val sig = Dedup.minhashSignatures(sh, 16)
    t("signatures")(sig.count())
    val bands = Dedup.bands(sig, 16, 4)
    t("bands")(bands.count())
    val cand = Dedup.candidatePairs(bands)
    t("candidates")(cand.count())
    t("verify")(Dedup.jaccardVerify(cand, sh, 0.5).count())
    t("full-again")(Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5).count())
    spark.stop()
  }
}
