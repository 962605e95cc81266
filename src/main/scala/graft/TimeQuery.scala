package graft

import org.apache.spark.sql.SparkSession

/** Time declared queries N times:
  * sbt "runMain graft.TimeQuery q20_minhash_lsh[,q21_...] 3 [sfDir]".
  * Each iteration also reports how many Spark jobs/stages/tasks the query
  * ran — the fixed-overhead signature (#jobs × scheduling floor) that the
  * r13 scaling block showed dominating 32-core runs at bench SF. */
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        stages.addAndGet(j.stageInfos.size)
        tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
      }
    })
    names.foreach { name =>
      (1 to iters).foreach { i =>
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events are async — settle before reading the counters
        Thread.sleep(50)
        println(f"[time] $name iter $i: $sec%.2f s ($n rows, " +
          s"jobs=${jobs.get()} stages=${stages.get()} tasks=${tasks.get()})")
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
