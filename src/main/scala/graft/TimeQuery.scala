package graft

import org.apache.spark.sql.SparkSession

/** Time declared queries N times:
  * sbt "runMain graft.TimeQuery q20_minhash_lsh[,q21_...] 3 [sfDir]". */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val iters = if (args.length > 1) args(1).toInt else 3
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true") // match Bench's session
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Logs.quietKBoundedWindowWarnings()
    names.foreach { name =>
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        println(f"[time] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
