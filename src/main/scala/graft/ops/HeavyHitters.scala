package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries / SpaceSaving heavy hitters as a mergeable typed
  * `Aggregator` — "what are the frequent tokens/URLs/user-agents in 100 TB"
  * answered in ONE pass with a k-bounded summary per partition, instead of
  * a full-vocabulary groupBy whose shuffle is corpus-sized.
  *
  * Guarantees (the classic ones, spec-asserted):
  *  - every item with true frequency > n/k survives in the summary;
  *  - each reported estimate e satisfies true ≤ e' bounds: the UNDERcount
  *    of the stored counter is at most n/k (so reported count + n/k ≥ true
  *    ≥ reported count... reported counts here are LOWER bounds).
  * Merging two summaries (map-side partial → final) preserves both bounds
  * with the error terms adding — exactly Spark's partial-aggregation
  * algebra, so the shuffle carries ≤ k (item, count) pairs per partition.
  *
  * The summary CONTENTS are deterministic for a fixed partition layout but
  * counts are lower bounds, not exact — callers wanting exact counts for
  * the survivors re-aggregate the (tiny) candidate set in a second pass,
  * the standard two-phase pattern (`exactTop` below).
  */
object HeavyHitters {

  /** Decremented-counters fold: k-1 counters max (Misra–Gries). */
  private[ops] def mgReduce(m: Map[String, Long], item: String, k: Int): Map[String, Long] =
    if (m.contains(item)) m.updated(item, m(item) + 1L)
    else if (m.size < k - 1) m.updated(item, 1L)
    else {
      // decrement all; drop zeros (the amortized "cancel k distinct items")
      m.flatMap { case (it, c) => if (c > 1) Some(it -> (c - 1)) else None }
    }

  private[ops] def mgMerge(a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (it, c)) =>
      acc.updated(it, acc.getOrElse(it, 0L) + c)
    }
    if (sum.size < k) sum
    else {
      // keep the k-1 largest counters, subtracting the k-th value — the
      // standard merge that preserves the n/k undercount bound
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)
        .drop(k - 1).headOption.getOrElse(0L)
      sum.flatMap { case (it, c) => if (c > cut) Some(it -> (c - cut)) else None }
    }
  }

  class MgAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 2, s"k must be >= 2, got $k")
    override def zero: Map[String, Long] = Map.empty
    override def reduce(m: Map[String, Long], item: String): Map[String, Long] =
      mgReduce(m, item, k)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mgMerge(a, b, k)
    override def finish(m: Map[String, Long]): Map[String, Long] = m
    override def bufferEncoder = ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder = ExpressionEncoder[Map[String, Long]]()
  }

  /** One-pass candidate summary of `itemCol`: (item, lower-bound count),
    * at most k-1 rows. Any item with true frequency > n/k is guaranteed
    * present. */
  def summary(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val agg = udaf(new MgAgg(k), Encoders.STRING)
    df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .agg(agg(col("item")).as("summary"))
      .select(explode(col("summary")).as(Seq("item", "lower_bound")))
  }

  /** The standard two-phase exact top-N: pass 1 = Misra–Gries candidates
    * (guaranteed to contain every true heavy hitter), pass 2 = exact counts
    * for the candidate set only — a semi join + groupBy over ≤ k-1 keys,
    * never the full vocabulary. */
  def exactTop(df: DataFrame, itemCol: String, k: Int, topN: Int): DataFrame = {
    val cands = summary(df, itemCol, k).select(col("item"))
    df.select(col(itemCol).cast("string").as("item"))
      .join(broadcast(cands), Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("item"))
      .limit(topN)
  }
}
