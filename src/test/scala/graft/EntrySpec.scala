package graft

import java.nio.file.{Files, Paths}

/** Smoke coverage of the driver contract: entry() returns rows; every
  * declared query runs at sf0.001; every oracleSql key has a query. */
class EntrySpec extends SparkSpec {

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("every declared query executes at sf0.001; every unpartitioned window " +
    "stays k-bounded") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.util.QueryExecutionListener

    // Every engine site that runs a WindowExec with no partition spec is
    // documented k-bounded (IVF seed pick after a limit, RRF over top-k
    // lists, per-bucket profiling) — correct, but invisible: a NEW
    // corpus-sized unpartitioned window would serialize the whole relation
    // through one task and nothing would fail. This DYNAMIC guard watches
    // every execution during the full-suite run and asserts each
    // unpartitioned window actually processed a bounded row count.
    val MaxUnpartitionedRows = 500L
    val current = new java.util.concurrent.atomic.AtomicReference[String]("")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val events = new java.util.concurrent.atomic.AtomicInteger(0)
    def unpartitioned(p: SparkPlan): Seq[WindowExec] = {
      val self = p match {
        case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
        case _ => Nil
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self ++ kids.flatMap(unpartitioned)
    }
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        try unpartitioned(qe.executedPlan).foreach { w =>
          val rows = w.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
          seen.add((current.get(), rows))
        } catch { case _: Throwable => () }
        events.incrementAndGet()
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = {
        events.incrementAndGet()
      }
    }
    spark.listenerManager.register(listener)
    try {
      // Drive the REAL Verify dump path (not a bare count) so the spec also
      // pins the round-3 failure mode: a query that throws must surface as
      // a failures entry AND the dumped-dir count must equal the declared
      // query count — absence can never masquerade as omission again.
      val outDir = Files.createTempDirectory("graft-verify-gate").toString
      val failures =
        try Verify.run(spark, sfDir, outDir, onEach = current.set)
        finally ()
      assert(failures.isEmpty,
        failures.map { case (n, e) => s"$n: ${e.take(160)}" }.mkString("\n"))
      val dumped = new java.io.File(outDir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("q")).map(_.getName).toSet
      assert(dumped == SparkEntry.queries.keySet,
        s"dump/declare mismatch — missing: ${SparkEntry.queries.keySet.diff(dumped)}, " +
          s"extra: ${dumped.diff(SparkEntry.queries.keySet)}")
      assert(Files.readString(Paths.get(s"$outDir/failures.json")) == "{}")
      // clean up the dumped parquet (sf0.001 — small, but keep /tmp tidy)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(outDir))
      // the execution-listener bus is asynchronous: wait until the event
      // count stops moving before reading the collected windows
      var last = -1; var stable = 0
      while (stable < 5) {
        val e = events.get()
        if (e == last) stable += 1 else { stable = 0; last = e }
        Thread.sleep(100)
      }
      val offenders = seen.asScala.filter(_._2 > MaxUnpartitionedRows).toSeq
      assert(offenders.isEmpty,
        s"corpus-sized unpartitioned WindowExec (query, rows): $offenders")
      // the guard must actually be watching: the suite is known to contain
      // k-bounded unpartitioned windows (IVF seed picks, RRF)
      assert(!seen.isEmpty, "listener saw no unpartitioned windows — guard is blind")
    } finally spark.listenerManager.unregister(listener)
  }
}
