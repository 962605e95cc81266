package graft.ops

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k per group as a typed `Aggregator` — the scale-correct
  * alternative to `row_number().over(partitionBy(g).orderBy(score desc))`
  * for W1-style per-source quotas when groups are huge.
  *
  * The window form shuffles EVERY row to its group's partition and sorts
  * the whole group just to keep k of them. This aggregator keeps a k-bounded
  * buffer, so Spark's partial aggregation (`ObjectHashAggregate` partial →
  * final) reduces each map partition to ≤ k rows per group BEFORE the
  * shuffle: bytes on the wire drop from O(rows) to O(partitions × k ×
  * groups) — at 100 TB with k=20 that is the difference between shuffling
  * the corpus and shuffling kilobytes. Determinism: ties broken by id
  * ascending, so results are replay-stable and oracle-comparable.
  *
  * Buffer ops are O(k log k) sorted-insert on a small Seq — fine for the
  * k≤100 regime this targets; beyond that a window sort wins back.
  */
object TopK {

  case class Scored(score: Double, id: Long)

  class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private val ord: Ordering[Scored] = Ordering.by(s => (-s.score, s.id))
    override def zero: Seq[Scored] = Seq.empty
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      if (b.length >= k && ord.lteq(b.last, a)) b // below the current cut
      else (b :+ a).sorted(ord).take(k)
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      (a ++ b).sorted(ord).take(k)
    override def finish(r: Seq[Scored]): Seq[Scored] = r.sorted(ord)
    override def bufferEncoder = ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder = ExpressionEncoder[Seq[Scored]]()
  }

  /** Column function: `topK(3)(scoreCol, idCol)` inside `.agg(...)` yields
    * an array<struct<score,id>> of the group's top k. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k), Encoders.product[Scored])
    (score, id) => fn(score, id)
  }
}
