package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** INT8 scalar quantization of embedding vectors — the reference configures
  * exactly this inside its vector store (Qdrant `ScalarQuantization` INT8,
  * `memory/memory_graph.py:1036-1057`) to keep the index RAM-resident. Here
  * it is a storage/scan optimization the engine owns: a 2560-dim float
  * embedding is 10 KiB; its INT8 twin is 2.5 KiB + one double scale. At
  * 100 TB of embeddings that is a 4× cut in scan bytes for candidate
  * scoring, with the full-precision column kept for the final re-rank of a
  * few hundred candidates (quantize → prune → rescore exact, the standard
  * two-phase design).
  *
  * Scheme: symmetric per-vector scaling. `scale = max(|x_i|)/127` (1.0 for
  * an all-zero vector), `q_i = floor(x_i/scale + 0.5)` ∈ [-127, 127], packed
  * into a `binary` column. `floor(x + 0.5)` rather than `round` because its
  * half-up behavior is identical in Java and DuckDB — keeps quantized
  * scoring oracle-checkable. Cosine over quantized vectors needs NO scale:
  * per-vector scales cancel in dot/(|a||b|).
  */
object QuantExpressions {

  @inline private[functions] def scaleOf(arr: ArrayData): Double = {
    val n = arr.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getFloat(i).toDouble)
      if (a > mx) mx = a
      i += 1
    }
    if (mx == 0.0) 1.0 else mx / 127.0
  }
}

abstract class QuantUnaryExpression extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
}

/** The per-vector dequantization factor: max(|x|)/127, 1.0 for a zero
  * vector. Stored alongside the packed bytes; needed to reconstruct values
  * or compute dot products (not cosine, where scales cancel). */
case class Int8Scale(child: Expression) extends QuantUnaryExpression {
  override def prettyName: String = "vec_int8_scale"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any): Any =
    QuantExpressions.scaleOf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = QuantExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.scaleOf($a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** array<float> → packed signed INT8 bytes (binary), q = floor(x/scale+0.5). */
case class Int8Quantize(child: Expression) extends QuantUnaryExpression {
  override def prettyName: String = "vec_int8_quantize"
  override def dataType: DataType = BinaryType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val scale = QuantExpressions.scaleOf(arr)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(arr.getFloat(i).toDouble / scale + 0.5).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = QuantExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val scale = ctx.freshName("scale"); val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $scale = $cls.scaleOf($a);
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (byte) java.lang.Math.floor((double) $a.getFloat($i) / $scale + 0.5);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Cosine over two packed-INT8 vectors. Scale-free: cos(s_a·qa, s_b·qb) =
  * cos(qa, qb). Accumulates int products in double, index order — the same
  * sequence the DuckDB oracle computes over integer lists. */
case class Int8CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_int8_cosine"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = graft.functions.VecChecks.dims(x.length, y.length, prettyName)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x(i).toDouble; val yv = y(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = graft.functions.VecChecks.dims($a.length, $b.length, "$prettyName");
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a[$i];
         |  double $yv = (double) $b[$i];
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object QuantFunctions {
  /** per-vector INT8 dequantization scale of an array<float> column. */
  def int8Scale(v: Column): Column =
    ColumnBridge.column(Int8Scale(ColumnBridge.expression(v)))

  /** array<float> column → packed signed INT8 binary column. */
  def int8Quantize(v: Column): Column =
    ColumnBridge.column(Int8Quantize(ColumnBridge.expression(v)))

  /** cosine similarity of two packed-INT8 binary columns (scale-free). */
  def int8Cosine(a: Column, b: Column): Column =
    ColumnBridge.column(Int8CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
