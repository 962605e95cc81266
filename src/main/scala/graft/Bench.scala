package graft

import org.apache.spark.sql.SparkSession

object Bench {

  /** True median: average the two middle elements for even n (a two-run
    * sample's "median" must not report the slower run). */
  def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) 0.0
    else {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Logs.quietKBoundedWindowWarnings()

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

    // Median-of-`reps` per query: single-shot timings on a shared box are
    // contaminated by GC pauses, page-cache state and sibling-process
    // contention (round-2's phantom 59 s q47 was exactly this) — the
    // per-query median is stable run-to-run within ~10%. Repetitions are
    // INTERLEAVED (full pass 1, then pass 2, ...) so a transient system
    // stall contaminates one pass, not all reps of one query.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val samples = scala.collection.mutable.Map
      .empty[String, List[Double]].withDefaultValue(Nil)

    def r3(x: Double) = math.rint(x * 1000) / 1000
    // Keep the stdout JSON line SMALL (the driver tails stdout): summary
    // stats over ALL queries plus per-query medians for a headline subset
    // only — the production-path flagships (IVF/LSH, search, dedup).
    val headline = Seq(
      "q01_pruned_scan", "q03_join_multiway", "q06_topk_orders",
      "q15_knn_cosine", "q20_minhash_lsh", "q47_domain_search",
      "q61_ann_rule", "q62_bm25", "q64_near_dup_lsh", "q66_skew_join",
      "q81_bfs_distances", "q93_maxsim", "q98_ivf_multiprobe",
      "q115_fused_search")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", ".")
    def writeFile(name: String, content: String): Unit = {
      val p = java.nio.file.Paths.get(outDir, name)
      java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    }
    def summaryLine(repsDone: Int): String = {
      val results = names.map(n => n -> median(samples(n)))
      val byName = results.toMap
      val qs = headline.flatMap(q => byName.get(q).map(v => s"\"$q\":${r3(v)}"))
        .mkString("{", ",", "}")
      val medians = results.map(_._2)
      s"""{"metric":"total","value":${r3(medians.sum)},"unit":"sec","n":${medians.length},"reps":$repsDone,"median":${r3(median(medians))},"queries":$qs,"sf":"$sfDir"}"""
    }
    // The durable artifact: the SAME line goes to BENCH.json in the repo
    // root (plus a full per-query breakdown in BENCH_FULL.json) so the
    // driver never depends on stdout-tail parsing — rounds 1 and 2 both
    // lost their bench signal to sbt's trailing "[success]" lines. Written
    // AFTER EVERY COMPLETED PASS, not once at the end: a run killed by a
    // wall-clock cap still leaves a real artifact from its finished passes.
    def writeArtifacts(repsDone: Int): Unit =
      try {
        writeFile("BENCH.json", summaryLine(repsDone) + "\n")
        val full = names.map(n => s"""  "$n": ${r3(median(samples(n)))}""")
          .mkString("{\n", ",\n", "\n}\n")
        writeFile("BENCH_FULL.json", full)
      } catch {
        case e: Throwable => System.err.println(s"[bench] file write failed: $e")
      }

    for (rep <- 1 to reps) {
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // Drop this query's persisted intermediates before the next one
        // runs: accumulated caches would otherwise make late queries pay
        // the GC bill for the early ones.
        spark.sharedState.cacheManager.clearCache()
        samples(name) = dt :: samples(name)
      }
      writeArtifacts(rep)
    }

    println(summaryLine(reps))
    System.out.flush()
    spark.stop()
  }
}
