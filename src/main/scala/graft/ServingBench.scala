package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{IvfIndex, Serving}
import graft.ops.Dedup
import graft.sources.Readers

/** Per-request serving-latency benchmark (the warm-path story VERDICT r11
  * #2 asks BENCH_NOTES to carry): cold per-request plan derivation vs the
  * compiled-plan session's two tiers, over ROTATING request payloads so the
  * literal rebinding is real, at the bench scale factor.
  *
  *  - cold: what each request cost before round 12 — a fresh standing
  *    handle (file listing), a freshly built probe plan (analyzer +
  *    optimizer + physical + codegen), then the scan.
  *  - warm_df: `Serving.*Session` Dataset re-entry (plan construction and
  *    listing amortized; analyzer+optimizer re-run on the rebound plan).
  *  - warm_rows: the straight-to-physical tier (`PlanBridge.
  *    collectFromOptimized`) — per-request work is literal rebinding,
  *    codegen-cache lookup and the pushed scan itself.
  *
  * Writes BENCH_SERVING.json (medians in milliseconds). Run:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ServingBench"`. */
object ServingBench {

  private def median(xs: Seq[Double]): Double = Bench.median(xs)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reqs = sys.env.getOrElse("SPARK_GRAFT_SERVING_REQS", "20").toInt
    val spark = graft.util.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_SERVING_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Logs.quietKBoundedWindowWarnings()

    def ms(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }

    // ---- fixtures: the maintained state a serving tier would hold ----
    val tmp = java.nio.file.Files.createTempDirectory("graft-serving-bench")
      .toString
    val docs = Tables.documents(spark, sfDir)
    graft.streaming.Sinks.lshIndexAppendPartitioned(tmp + "/bands",
      "doc_id", "text", shingleK = 3, numHashes = 16, numBands = 4,
      partitionCols = Seq("source"))(docs, 0L)
    // the maintained verified lineage (bands + candidate feed + verified
    // table), built the way the streaming sinks keep it — q343/q344's state
    Seq(0, 1).foreach { i =>
      val delta = graft.streaming.Sinks.lshIndexAppendPartitioned(
        tmp + "/vbands", "doc_id", "text",
        shingleK = 3, numHashes = 16, numBands = 4,
        partitionCols = Seq("source"), pairsPath = Some(tmp + "/vpairs"))(
        docs.filter(pmod(col("doc_id"), lit(2)) === i), i.toLong)
      graft.streaming.Sinks.verifiedPairsUpsert(tmp + "/verified", docs,
        "doc_id", "text", shingleK = 3, threshold = 0.5)(delta, i.toLong)
    }
    val emb = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") > 0)
      .select(col("vec_id"), col("embedding"),
        (pmod(col("vec_id"), lit(2))).as("label"))
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nCentroids = 8)
    graft.sources.Writers.swapWrite(idx.centroids, tmp + "/centroids")
    graft.streaming.Sinks.indexAppendPartitioned(tmp + "/assigned",
      idx.centroids, "vec_id", "embedding", Seq("label"))(emb, 0L)

    // ---- rotating request payloads (driver-side, as a live tier holds) --
    val idType = docs.schema("doc_id").dataType
    val lshPool: Seq[Seq[(Any, String)]] = docs
      .filter(col("doc_id").between(1, 200))
      .select(col("doc_id"), col("text").cast("string"))
      .collect().toSeq.filter(!_.isNullAt(1))
      .map(r => Seq((r.get(0), r.getString(1)))).take(reqs)
    val qPool: Seq[Array[Float]] = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id").between(0, reqs.toLong))
      .select(col("embedding")).collect().toSeq
      .map(_.getSeq[Float](0).toArray)
    require(lshPool.nonEmpty && qPool.nonEmpty, "empty request pools")

    // ---- sessions (compiled once; construction timed separately) ----
    var lshSession: Serving.LshProbeSession = null
    val lshCompileMs = ms {
      lshSession = new Serving.LshProbeSession(
        Readers.table(spark, tmp + "/bands"), idType,
        shingleK = 3, numHashes = 16, numBands = 4,
        // warm latencies INCLUDE the per-request generation poll —
        // the shape a deployed serving tier actually runs
        standingPath = Some(tmp + "/bands"))
    }
    import graft.functions.VectorFunctions.cosineSim
    var ivfSession: Serving.IvfServeSession = null
    val ivfCompileMs = ms {
      ivfSession = new Serving.IvfServeSession(
        Readers.table(spark, tmp + "/assigned"),
        Readers.table(spark, tmp + "/centroids"),
        (pruned, qRel) => pruned.crossJoin(broadcast(qRel))
          .withColumn("score",
            round(cosineSim(col("embedding"), col("qvec")), 4))
          .select(col("vec_id"), col("centroid_id"), col("score"))
          .orderBy(desc("score"), col("vec_id"))
          .limit(10),
        statePaths = Some((tmp + "/assigned", tmp + "/centroids")))
    }
    var vSession: Serving.VerifiedProbeSession = null
    val vCompileMs = ms {
      vSession = new Serving.VerifiedProbeSession(
        Readers.table(spark, tmp + "/verified"),
        Readers.table(spark, tmp + "/vbands"), docs,
        "doc_id", "text", idType,
        shingleK = 3, numHashes = 16, numBands = 4, threshold = 0.5,
        verifiedPath = Some(tmp + "/verified"))
    }
    // the round-13 feed-served LSH probe (q341's serving shape): ingested
    // probes answer from the maintained candidate feed by one pushed
    // endpoint-IN scan; novel texts fall back to the compiled band probe
    var servedSession: Serving.LshServedProbeSession = null
    val servedCompileMs = ms {
      servedSession = new Serving.LshServedProbeSession(
        Readers.table(spark, tmp + "/vpairs"),
        Readers.table(spark, tmp + "/vbands"), docs,
        "doc_id", "text", idType,
        shingleK = 3, numHashes = 16, numBands = 4,
        feedPath = Some(tmp + "/vpairs"), bandsPath = Some(tmp + "/vbands"))
    }

    // ---- per-request paths ----
    def lshCold(req: Seq[(Any, String)]): Unit =
      Dedup.probeNearDupsLocal(Readers.table(spark, tmp + "/bands"), req,
        idType, shingleK = 3, numHashes = 16, numBands = 4).collect()
    def ivfCold(q: Array[Float]): Unit = {
      val assigned = Readers.table(spark, tmp + "/assigned")
      val centroids = Readers.table(spark, tmp + "/centroids")
      val qDf = org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark,
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation.fromExternalRows(
          Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
            "qvec", org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType))()),
          Seq(org.apache.spark.sql.Row(q.toSeq))))
      IvfIndex.probePoint(assigned, centroids, qDf, nProbe = 2)
        .crossJoin(broadcast(qDf))
        .withColumn("score", round(cosineSim(col("embedding"), col("qvec")), 4))
        .select(col("vec_id"), col("centroid_id"), col("score"))
        .orderBy(desc("score"), col("vec_id"))
        .limit(10).collect()
    }
    // the pre-session q344 shape: fresh handles + fresh served-branch plans
    // per request (ingested-ness scan + verified fetch)
    def vCold(req: Seq[(Any, String)]): Unit =
      Dedup.probeNearDupsVerifiedServed(
        Readers.table(spark, tmp + "/verified"),
        Readers.table(spark, tmp + "/vbands"), docs,
        docs.filter(col("doc_id").isin(req.map(_._1): _*)),
        "doc_id", "text", shingleK = 3, numHashes = 16, numBands = 4,
        threshold = 0.5).collect()

    // warm everything once (JIT/codegen/readers), then measure
    lshCold(lshPool.head); lshSession.probeDf(lshPool.head).collect()
    lshSession.probeRows(lshPool.head)
    ivfCold(qPool.head); ivfSession.serveDf(qPool.head, 2).collect()
    ivfSession.serveRows(qPool.head, 2)
    vCold(lshPool.head); vSession.serveDf(lshPool.head).collect()
    vSession.serveRows(lshPool.head)
    servedSession.serveDf(lshPool.head).collect()
    servedSession.serveRows(lshPool.head)

    def run(label: String, pool: Int => Unit): Double = {
      val times = (0 until reqs).map(i => ms(pool(i)))
      System.err.println(f"[serving-bench] $label%-14s median ${median(times)}%8.1f ms")
      median(times)
    }
    val results = Seq(
      "lsh_cold" -> run("lsh_cold", i => lshCold(lshPool(i % lshPool.size))),
      "lsh_warm_df" -> run("lsh_warm_df",
        i => lshSession.probeDf(lshPool(i % lshPool.size)).collect()),
      "lsh_warm_rows" -> run("lsh_warm_rows",
        i => lshSession.probeRows(lshPool(i % lshPool.size))),
      "lsh_served_warm_rows" -> run("lsh_served_warm_rows",
        i => servedSession.serveRows(lshPool(i % lshPool.size))),
      "ivf_cold" -> run("ivf_cold", i => ivfCold(qPool(i % qPool.size))),
      "ivf_warm_df" -> run("ivf_warm_df",
        i => ivfSession.serveDf(qPool(i % qPool.size), 2).collect()),
      "ivf_warm_rows" -> run("ivf_warm_rows",
        i => ivfSession.serveRows(qPool(i % qPool.size), 2)),
      "verified_cold" -> run("verified_cold",
        i => vCold(lshPool(i % lshPool.size))),
      "verified_warm_df" -> run("verified_warm_df",
        i => vSession.serveDf(lshPool(i % lshPool.size)).collect()),
      "verified_warm_rows" -> run("verified_warm_rows",
        i => vSession.serveRows(lshPool(i % lshPool.size))))

    // ---- concurrency tier (r12 verdict #7): p50/p95 per request at 4
    // and 16 in-flight requests per session — the reference's serving
    // table is measured under load. Each worker issues its own rotating
    // payloads; latencies are per request, wall-clock inclusive of any
    // contention inside the session (plan rebind is per-call, the
    // recompile lock is uncontended on a quiet table).
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      s(math.min(s.length - 1, math.ceil(p * s.length).toInt - 1))
    }
    def concurrent(label: String, conc: Int, f: Int => Unit): Seq[(String, Double)] = {
      val perWorker = math.max(4, reqs / 2)
      val times = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Double]()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(conc)
      try {
        val futures = (0 until conc).map { w =>
          pool.submit(new Runnable {
            override def run(): Unit =
              (0 until perWorker).foreach { j =>
                times.add(ms(f(w * perWorker + j)))
              }
          })
        }
        futures.foreach(_.get())
      } finally pool.shutdown()
      import scala.jdk.CollectionConverters._
      val xs = times.asScala.map(_.doubleValue).toSeq
      val (p50, p95) = (pct(xs, 0.50), pct(xs, 0.95))
      System.err.println(
        f"[serving-bench] $label%-22s c$conc%-3d p50 ${p50}%7.1f ms  p95 ${p95}%7.1f ms")
      Seq(s"${label}_c${conc}_p50" -> p50, s"${label}_c${conc}_p95" -> p95)
    }
    val concResults = Seq(4, 16).flatMap { c =>
      concurrent("lsh_warm_rows", c,
        i => lshSession.probeRows(lshPool(i % lshPool.size))) ++
      concurrent("lsh_served_warm_rows", c,
        i => servedSession.serveRows(lshPool(i % lshPool.size))) ++
      concurrent("ivf_warm_rows", c,
        i => ivfSession.serveRows(qPool(i % qPool.size), 2)) ++
      concurrent("verified_warm_rows", c,
        i => vSession.serveRows(lshPool(i % lshPool.size)))
    }

    def r1(x: Double) = math.rint(x * 10) / 10
    val body = ((results ++ concResults)
      .map { case (k, v) => s"""  "$k": ${r1(v)}""" } ++ Seq(
      s"""  "lsh_session_compile_ms": ${r1(lshCompileMs)}""",
      s"""  "ivf_session_compile_ms": ${r1(ivfCompileMs)}""",
      s"""  "verified_session_compile_ms": ${r1(vCompileMs)}""",
      s"""  "served_session_compile_ms": ${r1(servedCompileMs)}""",
      s"""  "requests": $reqs""",
      s"""  "sf": "$sfDir""""))
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_SERVING.json"), body.getBytes("UTF-8"))
    println(body)
    spark.stop()
  }
}
