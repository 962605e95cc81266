package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, In, Literal, Or}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Dedup

/** Serving-session compiled-plan reuse for the point-probe family.
  *
  * The point probes (`Dedup.probeNearDups*`, `IvfIndex.probePoint`) build
  * an IDENTICAL plan per request, varying only literals — the probe band
  * keys / centroid ids pushed into the standing scan, and the probe rows
  * themselves. Re-deriving that plan per request costs 0.3–0.5 s of
  * analyzer + optimizer + physical planning + file re-listing before the
  * first byte is read, which is why the per-request floor sat at
  * 0.35–1.3 s against the reference's warm 240–340 ms resident-index band
  * (`docs/SEARCH_LATENCY_ANALYSIS.md`; VERDICT r11 #2). A session here
  * compiles the probe shape ONCE — through the normal DataFrame path, so
  * every optimization (filter pushdown, broadcast selection, codegen)
  * applies — and each request then only REBINDS the literals inside the
  * cached optimized plan:
  *
  *  - the pushed predicate on the standing scan (`Filter` over the
  *    relation) is rebuilt from the request's keys/ids,
  *  - the probe-side `LocalRelation` gets the request's rows,
  *
  * and nothing else changes — answer parity with the fresh path is
  * spec-pinned (ServingSpec). Execution tiers per request:
  * [[LshProbeSession.probeDf]] re-enters through a fresh Dataset
  * (analyzer+optimizer re-run on the already-optimized plan — idempotent
  * and cheap; keeps plan-pin `require()`s inspectable), while
  * [[LshProbeSession.probeRows]] hands the rebound plan straight to
  * physical planning (`PlanBridge.collectFromOptimized`) — the true warm
  * path, where per-request cost is codegen-cache lookup + the pushed scan
  * itself. The standing DataFrame handle is held by the session, so the
  * relation's file listing happens once per session, not once per request
  * (at 100 TB the listing alone is a job).
  *
  * Lifetime: a session pins the standing table's file listing at
  * construction — rebuild/compaction maintenance that REPLACES files
  * requires a new session (same contract as any cached DataFrame handle).
  */
object Serving {

  /** Driver-side twin of Spark's `round(x, 6)` on doubles (HALF_UP on the
    * shortest-decimal BigDecimal) — parity spec-pinned against the
    * cluster-side Round. */
  private[graft] def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Driver-side twin of [[graft.functions]] `l2sq` (sequential double
    * fold over float elements — same order, same widening). */
  private[graft] def l2sqLocal(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length,
      s"l2sq on mismatched dims: ${a.length} vs ${b.length}")
    var acc = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      acc += d * d; i += 1
    }
    acc
  }

  /** Template sanity shared by both sessions: exactly one probe-side
    * LocalRelation and one Filter directly over the standing relation —
    * the two nodes a request rebinds. */
  private def validate(template: LogicalPlan, who: String): Unit = {
    val locals = template.collect { case lr: LocalRelation => lr }
    val scans = template.collect {
      case f @ Filter(_, _: LogicalRelation) => f }
    require(locals.size == 1 && scans.size == 1,
      s"$who: the probe template must contain exactly one probe-side " +
        s"LocalRelation and one pushed Filter over the standing scan " +
        s"(found ${locals.size}/${scans.size}) — pass a BARE standing " +
        s"table handle (Readers.table), not a derived plan")
  }

  /** Compiled-plan session for the MinHash-LSH point probe
    * ([[graft.ops.Dedup.probeNearDupsLocal]]'s shape). `build` appends the
    * request's downstream (ordering, projection) INTO the template so the
    * whole answer is compiled once; it must be literal-free. */
  final class LshProbeSession(standing: DataFrame, idType: DataType,
                              shingleK: Int, numHashes: Int, numBands: Int,
                              maxDf: Int = Dedup.StopBucketDf,
                              build: DataFrame => DataFrame = identity) {
    private val spark = standing.sparkSession

    /** Compiled once: a synthetic single-doc probe (≥ shingleK tokens, so
      * every band carries a key and the pushed predicate spans all bands).
      * The placeholder id must be NON-null — a null id constant-folds the
      * pair emitter's `x ≠ y` to null and the optimizer collapses the
      * whole template to an empty relation. Every request replaces the
      * rows and the scan predicate wholesale before anything executes. */
    private val template: LogicalPlan = {
      val placeholderText =
        (0 to shingleK).map(i => s"graftservingplaceholder$i").mkString(" ")
      val placeholderId = CatalystTypeConverters
        .createToScalaConverter(idType)(Literal.default(idType).value)
      val df = build(Dedup.probeNearDupsLocal(standing,
        Seq((placeholderId, placeholderText)), idType, shingleK, numHashes,
        numBands, maxDf))
      val plan = df.queryExecution.optimizedPlan
      validate(plan, "LshProbeSession")
      plan
    }

    private val idConv = CatalystTypeConverters.createToCatalystConverter(idType)

    /** The rebound plan for a request, or None when the request has no
      * band keys at all (no doc with ≥ shingleK tokens) — the fresh path
      * folds that to an empty relation, a different plan SHAPE the
      * template cannot represent; callers fall back. */
    private def rebound(docs: Seq[(Any, String)]): Option[LogicalPlan] = {
      require(docs.length <= Dedup.PointProbeMaxDocs,
        s"LshProbeSession is the POINT-probe path (${docs.length} probe docs)")
      val bandRows = docs.flatMap { case (id, t) =>
        Dedup.localBandKeys(t, shingleK, numHashes, numBands)
          .map { case (b, k) => (id, b, k) }
      }
      if (bandRows.isEmpty) return None
      require(bandRows.map(_._3).distinct.length <= Dedup.PointProbeMaxKeys,
        s"point probe produced more than ${Dedup.PointProbeMaxKeys} band keys")
      val byBand = bandRows.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (b, rs) => b -> rs.map(_._3).distinct }
      Some(template.transformUp {
        case lr: LocalRelation =>
          val rows = bandRows.map { case (id, b, k) =>
            InternalRow.fromSeq(lr.output.map(_.name match {
              case "band_idx" => b
              case "band_key" => UTF8String.fromString(k)
              case _          => idConv(id)
            }))
          }
          LocalRelation(lr.output, rows, lr.isStreaming)
        case Filter(_, rel: LogicalRelation) =>
          val bi = rel.output.find(_.name == "band_idx").get
          val bk = rel.output.find(_.name == "band_key").get
          Filter(byBand.map { case (b, ks) =>
            And(EqualTo(bi, Literal(b)),
              In(bk, ks.map(Literal.create(_, StringType))))
          }.reduce[Expression](Or(_, _)), rel)
      })
    }

    /** Per-request probe as a DataFrame (re-enters through a Dataset —
      * plan pins stay inspectable; analyzer/optimizer re-run, file listing
      * and plan construction don't). */
    def probeDf(docs: Seq[(Any, String)]): DataFrame = rebound(docs) match {
      case Some(p) => PlanBridge.ofRows(spark, p)
      case None => build(Dedup.probeNearDupsLocal(standing, docs, idType,
        shingleK, numHashes, numBands, maxDf))
    }

    /** The warm serving call: rebound plan straight to physical planning
      * and execute-collect — no analyzer, no optimizer, no Dataset. */
    def probeRows(docs: Seq[(Any, String)]): Array[Row] = rebound(docs) match {
      case Some(p) => PlanBridge.collectFromOptimized(spark, p)
      case None    => probeDf(docs).collect()
    }
  }

  /** Compiled-plan session for the IVF point probe
    * ([[graft.engine.IvfIndex.probePoint]]'s shape, with the request's
    * whole scoring/top-k downstream compiled into the template via
    * `build(prunedAssigned, queryRelation)`). The centroid table is
    * collected ONCE per session (it changes only at rebuild, which
    * replaces the session) and the per-request nProbe selection runs in
    * plain JVM arithmetic — bit-identical to the cluster path's round-6 +
    * centroid_id tie-break (spec-pinned), so a request costs ZERO jobs
    * beyond the pushed scan of the probed clusters. */
  final class IvfServeSession(assigned: DataFrame, centroids: DataFrame,
                              build: (DataFrame, DataFrame) => DataFrame) {
    private val spark = assigned.sparkSession

    private val cents: Array[(Int, Array[Float])] = centroids
      .select(col("centroid_id").cast("int"), col("cvec"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    require(cents.nonEmpty, "IvfServeSession: empty centroid table")

    private val qSchema = StructType(Seq(
      StructField("qvec", ArrayType(FloatType), nullable = false)))

    private val template: LogicalPlan = {
      val qRel = spark.createDataFrame(
        java.util.List.of(Row(cents.head._2.toSeq)), qSchema)
      // centroid ids are 1-based (row_number); the placeholders are
      // unreachable and replaced before anything executes
      val df = build(assigned.filter(col("centroid_id").isin(-1, -2)), qRel)
      val plan = df.queryExecution.optimizedPlan
      validate(plan, "IvfServeSession")
      plan
    }

    private val vecConv =
      CatalystTypeConverters.createToCatalystConverter(ArrayType(FloatType))

    /** Driver-side twin of [[IvfIndex.probePoint]]'s probe selection:
      * round-6 L2² with centroid_id tie-break. */
    def selectCentroids(qvec: Array[Float], nProbe: Int): Seq[Int] =
      cents.map { case (id, v) => (round6(l2sqLocal(v, qvec)), id) }
        .sortBy(identity).take(nProbe).map(_._2).toSeq

    private def rebound(qvec: Array[Float], nProbe: Int): LogicalPlan = {
      val ids = selectCentroids(qvec, nProbe)
      template.transformUp {
        case lr: LocalRelation =>
          LocalRelation(lr.output,
            Seq(InternalRow(vecConv(qvec.toSeq))), lr.isStreaming)
        case Filter(_, rel: LogicalRelation) =>
          val cid = rel.output.find(_.name == "centroid_id").get
          Filter(In(cid, ids.map(i => Literal(i))), rel)
      }
    }

    /** Per-request answer as a DataFrame (plan pins inspectable). */
    def serveDf(qvec: Array[Float], nProbe: Int): DataFrame =
      PlanBridge.ofRows(spark, rebound(qvec, nProbe))

    /** The warm serving call — straight to physical planning. */
    def serveRows(qvec: Array[Float], nProbe: Int): Array[Row] =
      PlanBridge.collectFromOptimized(spark, rebound(qvec, nProbe))
  }
}
