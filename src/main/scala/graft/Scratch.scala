package graft

// TEMPORARY profiling main — not committed.
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.ops.Dedup
    val spark = graft.util.EngineConf.tuned(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n) }
      println(f"$label%-30s median=${ts.map(_._1).sorted.apply(1)}%7.3f rows=${ts.head._2}")
    }
    time("exactJaccardPairs") {
      Dedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.5).count() }
    time("simhash sigs") {
      Dedup.simhash(docs, "doc_id", "text", 16).count() }
    time("simhashPairs full") {
      Dedup.simhashPairs(docs, "doc_id", "text", bits = 16, maxDist = 3).count() }
    spark.stop()
  }
}
