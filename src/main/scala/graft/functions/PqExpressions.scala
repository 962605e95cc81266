package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Product quantization kernels — the memory-compression ANN path the
  * reference's vector store family uses beyond scalar INT8 (HNSW+PQ is the
  * standard big-corpus configuration; our INT8 path is
  * `Int8Quantize`/`Int8CosineSim`). A vector is cut into `m` subvectors;
  * each is replaced by the id of its nearest codebook centroid → `m` small
  * ints per vector instead of `dim` floats (here 8 codes for 64 floats =
  * 32× fewer bytes scanned by the candidate pass at equal row count).
  *
  * All distances are INTEGER MICRO-UNITS: `floor(l2sq·1e6 + 0.5)` as a
  * long. Integer distances make the asymmetric-distance sum exactly
  * order-independent and bit-identical in any engine — the DuckDB oracle
  * reproduces every code and every ADC score with no float-summation or
  * rounding-boundary caveats. Ties break on the lower centroid id.
  */
object PqOps {
  /** Runtime guards shared by interpreted eval and generated code: vectors
    * encoded with the wrong codebook (or codes from an older codebook) must
    * fail with a clear message, not read past buffers (unchecked Platform
    * reads on UnsafeArrayData return garbage, not exceptions). */
  def checkLen(n: Int, expected: Int, name: String): Unit =
    if (n != expected) throw new IllegalArgumentException(
      s"$name: input length $n does not match codebook layout ($expected)")
  def checkCode(code: Int, nCentroids: Int, name: String): Int = {
    if (code < 0 || code >= nCentroids) throw new IllegalArgumentException(
      s"$name: code $code out of range [0, $nCentroids)")
    code
  }

  /** l2sq of subvector j against one centroid, in micro-units. Fixed
    * index-order double accumulation, shared by eval and codegen. */
  def subDistMicro(v: ArrayData, centroid: Array[Float], offset: Int): Long = {
    var acc = 0.0
    var i = 0
    while (i < centroid.length) {
      val d = v.getFloat(offset + i).toDouble - centroid(i).toDouble
      acc += d * d
      i += 1
    }
    math.floor(acc * 1e6 + 0.5).toLong
  }
}

/** Encode an array<float> vector into m codebook codes (array<int>).
  * `codebook(j)(c)` = centroid c of subspace j; all subspaces must share
  * one centroid count and one subvector width. */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Float]]])
    extends UnaryExpression {
  require(codebook.nonEmpty && codebook.forall(_.length == codebook(0).length),
    "codebook must be non-empty with a uniform centroid count")
  require(codebook(0).nonEmpty, "codebook subspaces must have at least one centroid")
  require(codebook.forall(_.forall(_.length == codebook(0)(0).length)),
    "codebook must have a uniform subvector width across all subspaces/centroids")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  @transient private lazy val subDim = codebook(0)(0).length

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = codebook.length
    PqOps.checkLen(arr.numElements(), m * subDim, prettyName)
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < codebook(j).length) {
        val d = PqOps.subDistMicro(arr, codebook(j)(c), j * subDim)
        if (d < bestD) { bestD = d; best = c } // strict < → lowest id wins ties
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "float[][][]")
    val ops = PqOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val d = ctx.freshName("d"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val codes = ctx.freshName("codes")
      s"""
         |$ops.checkLen($a.numElements(), $cb.length * ${subDim}, "$prettyName");
         |int[] $codes = new int[$cb.length];
         |for (int $j = 0; $j < $cb.length; $j++) {
         |  int $best = 0; long $bestD = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $cb[$j].length; $c++) {
         |    long $d = $ops.subDistMicro($a, $cb[$j][$c], $j * ${subDim});
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Asymmetric-distance score: Σ_j table(j)(codes(j)), a long. `table` is
  * the per-query distance table (micro-units), built once on the driver. */
case class PqAdcDistance(child: Expression, table: Array[Array[Long]])
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_distance"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> codes, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val codes = v.asInstanceOf[ArrayData]
    PqOps.checkLen(codes.numElements(), table.length, prettyName)
    var acc = 0L
    var j = 0
    while (j < table.length) {
      acc += table(j)(PqOps.checkCode(codes.getInt(j), table(j).length, prettyName))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("pqAdcTable", table, "long[][]")
    val ops = PqOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      s"""
         |$ops.checkLen($a.numElements(), $tbl.length, "$prettyName");
         |long $acc = 0L;
         |for (int $j = 0; $j < $tbl.length; $j++) {
         |  $acc += $tbl[$j][$ops.checkCode($a.getInt($j), $tbl[$j].length, "$prettyName")];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqFunctions {
  def pqEncode(v: Column, codebook: Array[Array[Array[Float]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), codebook))
  def pqAdcDistance(codes: Column, table: Array[Array[Long]]): Column =
    ColumnBridge.column(PqAdcDistance(ColumnBridge.expression(codes), table))
}
