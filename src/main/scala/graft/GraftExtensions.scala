package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, DotProduct, Hash60, Int8CosineSim, Int8Quantize, Int8Scale, L2Squared, ShingleHash60, ShingleStrings, Simhash, SpaceTokens}

/** SQL registration of the engine's Catalyst expressions, so
  * `spark.sql("SELECT vec_cosine(a, b) ...")` works next to the Column API.
  *
  * Two entry points sharing one function table:
  *  - `.config("spark.sql.extensions", "graft.GraftExtensions")` /
  *    `.withExtensions(new GraftExtensions)` at session build;
  *  - `GraftExtensions.register(spark)` on an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(e.injectFunction)
    // ANN rewrite (SURVEY §7.3): inert until an index is registered via
    // AnnRewrite.register — which also arms live sessions through
    // spark.experimental.extraOptimizations, so either path works. The rule
    // instance is bound to the session it's injected into.
    e.injectOptimizerRule(session => new graft.plans.AnnRewriteRule(session))
    // Bounded fuzzy matching: levenshtein(a,b) <= k → length guard +
    // banded threshold DP. Pure predicate rewrite, no session state.
    e.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    // the non-deprecated ctor wants the full metadata set; everything past
    // `usage` is presentation-only
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two array<float> vectors"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<float> vectors"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("vec_l2sq"),
      info("vec_l2sq", "vec_l2sq(a, b) - squared L2 distance of two array<float> vectors"),
      (args: Seq[Expression]) => L2Squared(args(0), args(1))),
    (FunctionIdentifier("vec_int8_quantize"),
      info("vec_int8_quantize", "vec_int8_quantize(v) - pack an array<float> vector into signed INT8 bytes"),
      (args: Seq[Expression]) => Int8Quantize(args(0))),
    (FunctionIdentifier("vec_int8_scale"),
      info("vec_int8_scale", "vec_int8_scale(v) - INT8 dequantization scale (max(|x|)/127) of an array<float> vector"),
      (args: Seq[Expression]) => Int8Scale(args(0))),
    (FunctionIdentifier("vec_int8_cosine"),
      info("vec_int8_cosine", "vec_int8_cosine(a, b) - cosine similarity of two packed-INT8 binary vectors"),
      (args: Seq[Expression]) => Int8CosineSim(args(0), args(1))),
    (FunctionIdentifier("hash60"),
      info("hash60", "hash60(s) - engine-portable 60-bit md5-prefix hash of a string"),
      (args: Seq[Expression]) => Hash60(args(0))),
    (FunctionIdentifier("space_tokens"),
      info("space_tokens", "space_tokens(s) - split(lower(s), ' ') as one native pass"),
      (args: Seq[Expression]) => SpaceTokens(args(0))),
    (FunctionIdentifier("shingle_strings"),
      info("shingle_strings", "shingle_strings(toks, k) - the k-token shingles of a token array"),
      (args: Seq[Expression]) => ShingleStrings(args(0), intLit(args, 1, "shingle_strings"))),
    (FunctionIdentifier("shingle_hash60"),
      info("shingle_hash60", "shingle_hash60(toks, k) - hash60 of every k-token shingle, no string materialization"),
      (args: Seq[Expression]) => ShingleHash60(args(0), intLit(args, 1, "shingle_hash60"))),
    (FunctionIdentifier("simhash"),
      info("simhash", "simhash(toks, bits) - per-document SimHash signature over hash60(token) votes"),
      (args: Seq[Expression]) => Simhash(args(0), intLit(args, 1, "simhash"))),
    (FunctionIdentifier("bounded_collect_list"),
      info("bounded_collect_list", "bounded_collect_list(x, cap) - collect_list with a hard per-group " +
        "buffer bound: groups over cap evaluate to NULL (stop-bucket drop)"),
      // bare AggregateFunction: the analyzer wraps it in AggregateExpression,
      // as with Spark's own collect_list registration
      (args: Seq[Expression]) => graft.ops.BoundedCollect.BoundedCollectList(
        args(0), intLit(args, 1, "bounded_collect_list"))))

  /** The width/bits arguments parameterize generated code, so they must be
    * literals at registration-build time. */
  private def intLit(args: Seq[Expression], i: Int, fn: String): Int = {
    require(args.length > i && args(i).foldable,
      s"$fn: argument ${i + 1} must be a literal integer")
    args(i).eval() match {
      case n: java.lang.Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a literal integer, got $other")
    }
  }

  /** Register on a live session (FunctionRegistry is private[sql] — goes
    * through the bridge). */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftbridge.ColumnBridge.registerFunctions(spark, functions)

  /** Arm the stateless optimizer rules on a live session (idempotent).
    * AnnRewrite is NOT armed here — it carries index state and has its own
    * register/deregister lifecycle. */
  def armOptimizations(spark: SparkSession): Unit = {
    val have = spark.experimental.extraOptimizations
    if (!have.contains(graft.plans.LevenshteinPrefilter))
      spark.experimental.extraOptimizations =
        have :+ graft.plans.LevenshteinPrefilter
  }
}
