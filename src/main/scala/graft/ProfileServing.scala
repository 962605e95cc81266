package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Serving
import graft.sources.{Readers, Writers}

/** Phase-by-phase timing of the q347/q342 per-request serving paths
  * (round-14 item #1: where does the per-request time actually go).
  * Builds q347's fixture (own band table, live session, GDPR cascade
  * under it) and then times, per request:
  *
  *  - poll: the generation-marker read the session's freshen() pays
  *  - retired: the `.upsert.retired` existence probe a settled rebuild pays
  *  - probeDf: session.probeDf(docs) — rebind + Dataset construction
  *  - optPlan: forcing optimizedPlan + its toString (the entry's plan pin)
  *  - count: executing the job
  *
  * Run: `sbt "runMain graft.ProfileServing [sfDir] [reps]"`. */
object ProfileServing {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.EngineConf.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.Logs.quietKBoundedWindowWarnings()

    def ms(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }

    // ---- q347's exact fixture ----
    val base = java.nio.file.Files.createTempDirectory("graft-prof-live").toString
    val docs = Tables.documents(spark, dir)
    graft.streaming.Sinks.lshIndexAppendPartitioned(base + "/bands",
      "doc_id", "text", shingleK = 3, numHashes = 16, numBands = 4,
      partitionCols = Seq("source"))(docs, 0L)
    val rows = docs.filter(col("doc_id").isin(45, 72))
      .select(col("doc_id"), col("text").cast("string")).collect()
    val probeDocs = rows.toSeq.map(r =>
      (r.get(0), if (r.isNullAt(1)) null else r.getString(1)))
    val sess = new Serving.LshProbeSession(
      Readers.table(spark, base + "/bands"),
      docs.schema("doc_id").dataType,
      shingleK = 3, numHashes = 16, numBands = 4,
      build = _.orderBy(col("doc_a"), col("doc_b")),
      standingPath = Some(base + "/bands"))
    require(sess.probeRows(probeDocs).nonEmpty)
    graft.streaming.Sinks.lshIndexDelete(base + "/bands",
      docs.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select(col("doc_id"), col("source")),
      partitionCols = Seq("source"))

    // warm once (triggers the post-delete recompile)
    sess.probeDf(probeDocs).count()

    (1 to reps).foreach { i =>
      var df: org.apache.spark.sql.DataFrame = null
      var plan: String = null
      val tPoll = ms { Writers.Generation.read(spark, base + "/bands") }
      val tRetired = ms { Writers.retiredPartitionsPresent(spark, base + "/bands") }
      val tProbe = ms { df = sess.probeDf(probeDocs) }
      val tOpt = ms { plan = df.queryExecution.optimizedPlan.toString.toLowerCase }
      val tCount = ms { df.count() }
      println(f"[prof-serving] q347 rep $i%2d: poll $tPoll%7.2f  retired $tRetired%7.2f  " +
        f"probeDf $tProbe%7.2f  optPlan $tOpt%7.2f  count $tCount%7.2f ms")
    }

    // ---- q342's phases: freshen (2 marker reads) + serveDf + pins + count
    val vbase = java.nio.file.Files.createTempDirectory("graft-prof-ivf").toString
    val emb = Tables.embeddings(spark, dir)
      .filter(col("vec_id") > 0)
      .select(col("vec_id"), col("embedding"),
        pmod(col("vec_id"), lit(2)).as("label"))
    val idx = graft.engine.IvfIndex.build(emb, "vec_id", "embedding", nCentroids = 8)
    Writers.swapWrite(idx.centroids, vbase + "/centroids")
    graft.streaming.Sinks.indexAppendPartitioned(vbase + "/assigned",
      idx.centroids, "vec_id", "embedding", Seq("label"))(emb, 0L)
    import graft.functions.VectorFunctions.cosineSim
    val qv = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val ivf = new Serving.IvfServeSession(
      Readers.table(spark, vbase + "/assigned"),
      Readers.table(spark, vbase + "/centroids"),
      (pruned, qRel) => pruned.crossJoin(broadcast(qRel))
        .withColumn("score", round(cosineSim(col("embedding"), col("qvec")), 4))
        .select(col("vec_id"), col("centroid_id"), col("score"))
        .orderBy(desc("score"), col("vec_id"))
        .limit(10),
      statePaths = Some((vbase + "/assigned", vbase + "/centroids")))
    ivf.serveDf(qv, 2).count()

    (1 to reps).foreach { i =>
      var df: org.apache.spark.sql.DataFrame = null
      val tPoll = ms {
        Writers.Generation.read(spark, vbase + "/assigned")
        Writers.Generation.read(spark, vbase + "/centroids")
      }
      val tServe = ms { df = ivf.serveDf(qv, 2) }
      val tOpt = ms { df.queryExecution.optimizedPlan.toString.toLowerCase }
      val tPhys = ms { df.queryExecution.executedPlan.toString }
      val tCount = ms { df.count() }
      println(f"[prof-serving] q342 rep $i%2d: poll $tPoll%7.2f  serveDf $tServe%7.2f  " +
        f"optPlan $tOpt%7.2f  physPlan $tPhys%7.2f  count $tCount%7.2f ms")
    }
    spark.stop()
  }
}
