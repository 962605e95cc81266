package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built into
  * Spark 4) — the incremental/distributed answer to "distinct users per
  * key over 100 TB": exact `count(DISTINCT)` must shuffle every distinct
  * value every time; a stored per-partition sketch is ~KBs, merges
  * associatively (so daily sketches roll up to monthly without touching
  * raw data), and estimates within ~1.6% at lgK=12.
  *
  * Pairs with [[IncrementalAgg]]: cnt/sum/min/max fold exactly, distincts
  * fold via sketches — together they cover the standard rollup table.
  */
object Sketches {

  /** Per-group HLL sketch of `valueCol` (binary column `sk`). */
  def distinctSketch(df: DataFrame, keys: Seq[String], valueCol: String,
                     lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sk"))

  /** Merge sketch tables (e.g. daily partials) into one per-group sketch —
    * the union is over sketches only, raw data is never re-read. */
  def mergeSketches(parts: DataFrame, keys: Seq[String]): DataFrame =
    parts.groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("sk")).as("sk"))

  /** Point estimates from stored sketches. */
  def estimate(sketches: DataFrame): DataFrame =
    sketches.withColumn("approx_distinct", hll_sketch_estimate(col("sk")))

  // ---- Mergeable QUANTILE sketches (DataSketches KLL doubles) — the
  // percentile member of the rollup family: exact percentiles need the
  // full sorted value set every time; a stored KLL sketch is ~KBs, merges
  // associatively (daily partials → monthly without re-reading raw data)
  // and answers any quantile within a normalized rank error of ~1.65% at
  // k=200. Same posture as the HLL distinct sketches above: IncrementalAgg
  // folds cnt/sum/min/max exactly, HLL folds distincts, KLL folds
  // percentiles — together the full standard rollup table.

  /** Serialization shim: a heap KLL sketch round-trips Java serialization
    * as its compact byte image. The Aggregator BUFFER holds the live
    * sketch (per-row update is a plain heap op — no per-row serialization;
    * Spark only serializes buffers at shuffle/spill boundaries, where the
    * byte image is exactly what should travel). */
  final class KllHolder(@transient var sk: org.apache.datasketches.kll.KllDoublesSketch)
      extends java.io.Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val bytes = sk.toByteArray
      out.writeInt(bytes.length); out.write(bytes)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(b))
    }
  }

  /** Build aggregator: values → compact sketch bytes. */
  class KllAgg(k: Int) extends Aggregator[Double, KllHolder, Array[Byte]] {
    override def zero: KllHolder = new KllHolder(
      org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k))
    override def reduce(h: KllHolder, v: Double): KllHolder = { h.sk.update(v); h }
    override def merge(a: KllHolder, b: KllHolder): KllHolder = { a.sk.merge(b.sk); a }
    override def finish(h: KllHolder): Array[Byte] = h.sk.toByteArray
    override def bufferEncoder = Encoders.javaSerialization[KllHolder]
    override def outputEncoder = Encoders.BINARY
  }

  /** Merge aggregator: stored sketch bytes → one merged sketch. Per-input
    * deserialization is fine here — inputs are partials (few per group),
    * never raw rows. */
  class KllMergeAgg(k: Int) extends Aggregator[Array[Byte], KllHolder, Array[Byte]] {
    override def zero: KllHolder = new KllHolder(
      org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(k))
    override def reduce(h: KllHolder, bytes: Array[Byte]): KllHolder = {
      h.sk.merge(org.apache.datasketches.kll.KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(bytes)))
      h
    }
    override def merge(a: KllHolder, b: KllHolder): KllHolder = { a.sk.merge(b.sk); a }
    override def finish(h: KllHolder): Array[Byte] = h.sk.toByteArray
    override def bufferEncoder = Encoders.javaSerialization[KllHolder]
    override def outputEncoder = Encoders.BINARY
  }

  /** Per-group KLL quantile sketch of `valueCol` (binary column `qsk`). */
  def quantileSketch(df: DataFrame, keys: Seq[String], valueCol: String,
                     k: Int = 200): DataFrame = {
    val agg = udaf(new KllAgg(k), Encoders.scalaDouble)
    df.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(agg(col(valueCol).cast("double")).as("qsk"))
  }

  /** Merge quantile-sketch tables (e.g. daily partials) per group — raw
    * data is never re-read. */
  def mergeQuantileSketches(parts: DataFrame, keys: Seq[String],
                            k: Int = 200): DataFrame = {
    val agg = udaf(new KllMergeAgg(k), Encoders.BINARY)
    parts.groupBy(keys.map(col): _*).agg(agg(col("qsk")).as("qsk"))
  }

  /** Quantile estimate at rank q ∈ [0,1] from stored sketch bytes. */
  def quantileOf(skCol: Column, q: Double): Column = {
    val f = udf((bytes: Array[Byte]) => {
      val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(bytes))
      if (sk.isEmpty) Double.NaN else sk.getQuantile(q)
    })
    f(skCol)
  }

  /** Normalized rank of `value` under the stored sketch (the error-bound
    * check: rank(exact-p50) must sit within ~0.5 ± eps). */
  def rankOf(skCol: Column, value: Column): Column = {
    val f = udf((bytes: Array[Byte], v: Double) => {
      val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(bytes))
      if (sk.isEmpty) Double.NaN else sk.getRank(v)
    })
    f(skCol, value)
  }

  // ---- Mergeable SET-ALGEBRA sketches (DataSketches Theta) — the member
  // HLL cannot be: an HLL register array answers |A| only, but stored
  // per-segment Theta sketches additionally support INTERSECTION and
  // A-NOT-B over the retained hash samples. That is the segment-overlap /
  // retention / cross-cohort shape at 100 TB: distinct users per (day,
  // cohort) fold up exactly like the HLL rollups above (daily partials
  // union associatively, raw ids never re-shuffled), and then any pair of
  // stored ~KB sketches answers |A∩B| / |A∪B| / |A\B| driver-free. Below
  // 2^lgK uniques a theta sketch retains every hash → estimates are EXACT;
  // above, relative error ≈ 1/sqrt(2^lgK) for unions (intersections
  // degrade with disjointness — always bound-check, as [[thetaOk]] does).

  import org.apache.datasketches.theta.{SetOperation, Sketches => DsT}
  import org.apache.datasketches.memory.Memory

  private def newUnion(lgK: Int) =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  /** Serialization shim, same pattern as [[KllHolder]]: the live buffer is
    * a heap theta Union (per-row update = one hash + table insert); only
    * shuffle/spill boundaries pay the compact-byte-image round-trip. */
  final class ThetaHolder(@transient var u: org.apache.datasketches.theta.Union,
                          lgK: Int) extends java.io.Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val bytes = u.getResult.toByteArray
      out.writeInt(lgK); out.writeInt(bytes.length); out.write(bytes)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val k = in.readInt()
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      u = newUnion(k)
      u.union(Memory.wrap(b))
    }
  }

  /** Build aggregator: string keys → compact theta sketch bytes. */
  class ThetaAgg(lgK: Int) extends Aggregator[String, ThetaHolder, Array[Byte]] {
    override def zero: ThetaHolder = new ThetaHolder(newUnion(lgK), lgK)
    override def reduce(h: ThetaHolder, v: String): ThetaHolder = { h.u.update(v); h }
    override def merge(a: ThetaHolder, b: ThetaHolder): ThetaHolder = {
      a.u.union(b.u.getResult); a
    }
    override def finish(h: ThetaHolder): Array[Byte] = h.u.getResult.toByteArray
    override def bufferEncoder = Encoders.javaSerialization[ThetaHolder]
    override def outputEncoder = Encoders.BINARY
  }

  /** Merge aggregator: stored sketch bytes → one unioned sketch. */
  class ThetaMergeAgg(lgK: Int) extends Aggregator[Array[Byte], ThetaHolder, Array[Byte]] {
    override def zero: ThetaHolder = new ThetaHolder(newUnion(lgK), lgK)
    override def reduce(h: ThetaHolder, bytes: Array[Byte]): ThetaHolder = {
      h.u.union(Memory.wrap(bytes)); h
    }
    override def merge(a: ThetaHolder, b: ThetaHolder): ThetaHolder = {
      a.u.union(b.u.getResult); a
    }
    override def finish(h: ThetaHolder): Array[Byte] = h.u.getResult.toByteArray
    override def bufferEncoder = Encoders.javaSerialization[ThetaHolder]
    override def outputEncoder = Encoders.BINARY
  }

  /** Per-group theta sketch of `valueCol` (binary column `tsk`). */
  def thetaSketch(df: DataFrame, keys: Seq[String], valueCol: String,
                  lgK: Int = 12): DataFrame = {
    val agg = udaf(new ThetaAgg(lgK), Encoders.STRING)
    df.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(agg(col(valueCol).cast("string")).as("tsk"))
  }

  /** Union theta-sketch tables (e.g. daily partials) per group. */
  def mergeThetaSketches(parts: DataFrame, keys: Seq[String],
                         lgK: Int = 12): DataFrame = {
    val agg = udaf(new ThetaMergeAgg(lgK), Encoders.BINARY)
    parts.groupBy(keys.map(col): _*).agg(agg(col("tsk")).as("tsk"))
  }

  /** Distinct-count estimate from stored theta sketch bytes. */
  def thetaEstimate(sk: Column): Column = {
    val f = udf((b: Array[Byte]) => DsT.heapifySketch(Memory.wrap(b)).getEstimate)
    f(sk)
  }

  /** |A ∩ B| sketch from two stored sketches (bytes → bytes). */
  def thetaIntersect(a: Column, b: Column): Column = {
    val f = udf((x: Array[Byte], y: Array[Byte]) => {
      val inter = SetOperation.builder().buildIntersection()
      inter.intersect(DsT.heapifySketch(Memory.wrap(x)))
      inter.intersect(DsT.heapifySketch(Memory.wrap(y)))
      inter.getResult.toByteArray
    })
    f(a, b)
  }

  /** |A ∪ B| sketch from two stored sketches (bytes → bytes). */
  def thetaUnion(a: Column, b: Column, lgK: Int = 12): Column = {
    val f = udf((x: Array[Byte], y: Array[Byte]) => {
      val u = newUnion(lgK)
      u.union(Memory.wrap(x)); u.union(Memory.wrap(y))
      u.getResult.toByteArray
    })
    f(a, b)
  }

  /** |A \ B| sketch from two stored sketches (bytes → bytes). */
  def thetaANotB(a: Column, b: Column): Column = {
    val f = udf((x: Array[Byte], y: Array[Byte]) => {
      val op = SetOperation.builder().buildANotB()
      op.setA(DsT.heapifySketch(Memory.wrap(x)))
      op.notB(DsT.heapifySketch(Memory.wrap(y)))
      op.getResult(true).toByteArray
    })
    f(a, b)
  }

  /** Error-bound gate: |estimate − exact| ≤ tol·exact + 1 (the +1 absorbs
    * exact-mode rounding; below 2^lgK uniques estimates are exactly
    * integral so this is equality in practice). */
  def thetaOk(est: Column, exact: Column, tol: Double = 0.02): Column =
    abs(est - exact) <= lit(tol) * exact + lit(1.0)
}
