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
}
