package graft.ops

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k per group — the scale-correct alternative to
  * `row_number().over(partitionBy(g).orderBy(score desc))` for W1-style
  * per-source quotas when groups are huge.
  *
  * The window form shuffles EVERY row to its group's partition and sorts
  * the whole group just to keep k of them. This aggregate keeps a k-bounded
  * buffer, so Spark's partial aggregation (`ObjectHashAggregate` partial →
  * final) reduces each map partition to ≤ k rows per group BEFORE the
  * shuffle: bytes on the wire drop from O(rows) to O(partitions × k ×
  * groups) — at 100 TB with k=20 that is the difference between shuffling
  * the corpus and shuffling kilobytes. Determinism: total order
  * (score desc, id asc) — same comparisons as `java.lang.Double.compare`
  * on the negated score (NaN ranks worst, −0.0/0.0 ordered), so results
  * are replay-stable and oracle-comparable.
  *
  * Implemented as a native [[TypedImperativeAggregate]] over primitive
  * sorted arrays: the per-row update is an `InternalRow` field read, one
  * cut-line comparison (O(1) reject once the buffer is full — the common
  * case on a big scan), and at worst an O(k) shift. The previous
  * encoder-based `Aggregator` paid a case-class allocation plus a
  * Seq sort-and-copy on EVERY accepted row — on a corpus×queries scoring
  * scan the aggregation, not the arithmetic, was the hot loop.
  */
object TopK {

  private val elemType = StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType)))

  /** k-bounded buffer, kept sorted by (score desc, id asc). */
  final class Buffer(val k: Int) {
    var n: Int = 0
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)

    /** < 0 iff (s1,i1) ranks strictly before (s2,i2). */
    @inline def cmp(s1: Double, i1: Long, s2: Double, i2: Long): Int = {
      val c = java.lang.Double.compare(-s1, -s2)
      if (c != 0) c else java.lang.Long.compare(i1, i2)
    }

    def insert(s: Double, i: Long): Unit = {
      if (n == k && cmp(s, i, scores(n - 1), ids(n - 1)) >= 0) return
      var pos = n
      while (pos > 0 && cmp(s, i, scores(pos - 1), ids(pos - 1)) < 0) pos -= 1
      val last = math.min(n, k - 1) // drop the current worst if full
      var j = last
      while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
      scores(pos) = s; ids(pos) = i
      if (n < k) n += 1
    }

    def mergeFrom(o: Buffer): Unit = {
      var j = 0
      while (j < o.n) { insert(o.scores(j), o.ids(j)); j += 1 }
    }
  }

  case class TopKAggregate(
      score: Expression, id: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buffer] with BinaryLike[Expression] {
    require(k >= 1, s"topK needs k >= 1, got $k")

    override def left: Expression = score
    override def right: Expression = id
    override def prettyName: String = "top_k"
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(elemType, containsNull = false)

    override def createAggregationBuffer(): Buffer = new Buffer(k)

    // The optimizer inlines the scoring projection into the aggregate
    // (CollapseProject merges Project under Aggregate), and an imperative
    // aggregate evaluates its input expressions INTERPRETED — which would
    // take the similarity kernel out of generated code exactly on the
    // corpus×queries hot loop. A lazily compiled MutableProjection keeps
    // the bound input expressions codegen'd inside update(); the codegen
    // cache amortizes compilation across tasks.
    @transient private lazy val inputProj =
      org.apache.spark.sql.catalyst.expressions.MutableProjection.create(Seq(score, id))

    override def update(b: Buffer, input: InternalRow): Buffer = {
      val r = inputProj(input)
      if (!r.isNullAt(0) && !r.isNullAt(1))
        b.insert(r.getDouble(0), r.getLong(1))
      b
    }

    override def merge(b: Buffer, o: Buffer): Buffer = { b.mergeFrom(o); b }

    override def eval(b: Buffer): Any = {
      val out = new Array[Any](b.n)
      var j = 0
      while (j < b.n) {
        out(j) = new GenericInternalRow(Array[Any](b.scores(j), b.ids(j)))
        j += 1
      }
      new GenericArrayData(out)
    }

    override def serialize(b: Buffer): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + 16 * b.n)
      bb.putInt(b.k).putInt(b.n)
      var j = 0
      while (j < b.n) { bb.putDouble(b.scores(j)).putLong(b.ids(j)); j += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val b = new Buffer(bb.getInt())
      val n = bb.getInt()
      var j = 0
      while (j < n) {
        val s = bb.getDouble(); val i = bb.getLong()
        b.scores(j) = s; b.ids(j) = i; j += 1
      }
      b.n = n
      b
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKAggregate =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKAggregate =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKAggregate =
      copy(score = l, id = r)
  }

  /** Column function: `topK(3)(scoreCol, idCol)` inside `.agg(...)` yields
    * an array<struct<score,id>> of the group's top k. */
  def topK(k: Int): (Column, Column) => Column =
    (score, id) => ColumnBridge.column(
      TopKAggregate(
        ColumnBridge.expression(score.cast("double")),
        ColumnBridge.expression(id.cast("long")), k).toAggregateExpression())
}
