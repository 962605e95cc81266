package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm up JIT/codegen/parquet-reader paths so measured queries aren't
    // paying one-time JVM cost (a cluster is long-warm). Cold cost is
    // dominated by Janino compilation + JIT of each query's generated code,
    // which is data-size-independent — so run EVERY query once at sf0.001:
    // tiny inputs buy the same warm code the sf0.1 pass then reuses.
    val warmDir = new java.io.File(new java.io.File(sfDir).getParent, "sf0.001")
    val warmPath = if (warmDir.isDirectory) warmDir.getPath else sfDir
    if (warmPath == sfDir)
      System.err.println(s"[bench] WARNING: no sf0.001 sibling dir — warming at " +
        s"full measurement scale $sfDir (bench wall time roughly doubles)")
    SparkEntry.queries.keys.foreach { q =>
      try SparkEntry.queries(q)(spark, warmPath).count()
      catch { case _: Throwable => }
    }
    spark.sharedState.cacheManager.clearCache()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // Drop this query's persisted intermediates before the next one runs:
      // 69 queries' caches would otherwise accumulate in storage memory and
      // the late queries pay the GC bill for the early ones.
      spark.sharedState.cacheManager.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
