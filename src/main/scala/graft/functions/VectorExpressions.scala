package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd vector kernels over `array<float>` columns.
  *
  * The reference scores memory chunks with cosine similarity inside Qdrant's
  * HNSW search (`memory/memory_graph.py:8047-8102`; scipy cosine at
  * `memory_graph.py:1626-1628`). Here the kernel is a native Catalyst
  * `Expression` with `doGenCode`, so a brute-force KNN scan stays inside
  * WholeStageCodegen — no UDF serialization, no boxing per element. Products
  * are accumulated in double precision in index order, which keeps results
  * bit-stable across engines (the DuckDB oracle computes the same sequence).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** Shared runtime dimension guard for the vector kernels: silently scoring
  * the common prefix of mismatched vectors (e.g. a corpus mixing 768- and
  * 2560-dim embeddings after a model migration) returns plausible-looking
  * garbage — the data bug would be undetectable from output. Static so the
  * generated code can call it. */
object VecChecks {
  def dims(na: Int, nb: Int, name: String): Int = {
    if (na != nb) throw new IllegalArgumentException(
      s"$name: vector dimension mismatch ($na vs $nb)")
    na
  }
}

/** dot(a, b) — inner product in double precision. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = VecChecks.dims(x.numElements(), y.numElements(), prettyName)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = graft.functions.VecChecks.dims($a.numElements(), $b.numElements(), "$prettyName");
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (|a|·|b|); NaN on a zero vector (matches scipy). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = VecChecks.dims(x.numElements(), y.numElements(), prettyName)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = graft.functions.VecChecks.dims($a.numElements(), $b.numElements(), "$prettyName");
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** squared L2 distance |a-b|² — used by the IVF centroid assignment. */
case class L2Squared(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = VecChecks.dims(x.numElements(), y.numElements(), prettyName)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = graft.functions.VecChecks.dims($a.numElements(), $b.numElements(), "$prettyName");
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH signature as a single codegen'd expression:
  * bit j = sign(v · h_j), hyperplane components derived from a mixed integer
  * hash of (seed, j, i) — no stored model, identical on any executor. The
  * loop is nBits × dim multiply-adds inside WholeStageCodegen, so it scales
  * to production dims (2560) where an expression-tree expansion would not.
  */
case class RhpSignature(child: Expression, nBits: Int, seed: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nBits > 0 && nBits <= 63, "nBits must be in 1..63")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_rhp_signature"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  @inline private def hyperplane(j: Int, i: Int): Double =
    RhpSignature.component(seed, j, i)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sig = 0L
    var j = 0
    while (j < nBits) {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += arr.getFloat(i).toDouble * hyperplane(j, i); i += 1 }
      if (acc >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val cls = classOf[RhpSignature].getName
      s"""
         |int $n = $a.numElements();
         |long $sig = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * $cls.component($seed, $j, $i);
         |  }
         |  if ($acc >= 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RhpSignature {
  /** Deterministic hyperplane component in [-1, 1] — shared by interpreted
    * eval and generated code (must stay a static pure function). */
  def component(seed: Int, j: Int, i: Int): Double =
    // seed multiplier must NOT be a multiple of the modulus 1000003 — the
    // original seed*1000003L vanished under % 1000003, making every seed
    // produce identical hyperplanes (multi-table LSH amplification became
    // four copies of one table). 999983 is a distinct prime.
    (((seed * 999983L + j * 131L + i * 31L) * 2654435761L % 1000003L).toDouble / 500001.5) - 1.0
}

object VectorFunctions {
  private def col2(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    ColumnBridge.column(f(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** cosine similarity of two array<float> columns (codegen'd). */
  def cosineSim(a: Column, b: Column): Column = col2(CosineSimilarity.apply)(a, b)

  /** dot product of two array<float> columns (codegen'd). */
  def dot(a: Column, b: Column): Column = col2(DotProduct.apply)(a, b)

  /** squared euclidean distance of two array<float> columns (codegen'd). */
  def l2sq(a: Column, b: Column): Column = col2(L2Squared.apply)(a, b)

  /** random-hyperplane LSH signature of an array<float> column (codegen'd). */
  def rhpSignature(v: Column, nBits: Int, seed: Int = 7): Column =
    ColumnBridge.column(RhpSignature(ColumnBridge.expression(v), nBits, seed))
}
