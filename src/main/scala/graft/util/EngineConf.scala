package graft.util

import org.apache.spark.sql.SparkSession

/** Session defaults the engine's operators are tuned for — applied by every
  * entry point that executes declared queries (Bench, Verify, PlanBudget,
  * the test harness), so library users get the same behavior by calling
  * [[tuned]] on their own builder. */
object EngineConf {

  /** Spark's ObjectHashAggregate abandons hash aggregation after only 128
    * distinct keys per task (`sortBased.fallbackThreshold`) and SORTS the
    * remaining input — sized for unbounded object buffers (percentile
    * digests over memory-heavy groups), not for this engine's object aggs,
    * which are k-bounded (TopK: k×16 bytes) or df-bounded (posting lists
    * whose heavy-skew corpora the Σdf² cost gate routes away first).
    * Measured at sf0.1: the 128-key default forced a full sort of the
    * corpus×queries scoring relation (batch KNN −41% with the raise) and
    * of the exploded shingle relation (exact-Jaccard core −24%). 2²⁰ keys
    * per task keeps hash aggregation through vocab-scale key counts while
    * preserving the spill-safe sort fallback for genuinely pathological
    * cardinalities. */
  val ObjectAggFallbackKeys: Int = 1 << 20

  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      ObjectAggFallbackKeys.toString)
}
