package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view refresh
  * pattern that keeps 100 TB analytics affordable: the rollup table stores
  * MERGEABLE partial states (count, sum, min, max — avg is derived, never
  * stored), so folding a new batch in costs O(batch + |rollup|), never a
  * rescan of history. This is the batch twin of the reference's running
  * counters (`memory_management.py:3192-3368` maintains per-memory
  * cumulative hit/EMA fields event-by-event; here whole partitions fold in
  * one merge), and the same algebra Spark's own partial aggregation uses
  * map-side.
  *
  * Invariant (spec-enforced): refresh(b1); refresh(b2); … ≡ aggregate(b1 ∪
  * b2 ∪ …) for any batch split, because (cnt,sm,mn,mx) forms a commutative
  * monoid under (sum,sum,min,max).
  */
object IncrementalAgg {

  private val stateCols = Seq("cnt", "sm", "mn", "mx")

  /** Partial (mergeable) state of one batch, grouped by `keys`. */
  def partial(events: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    events.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(col(valueCol).cast("double")).as("sm"),
      min(col(valueCol).cast("double")).as("mn"),
      max(col(valueCol).cast("double")).as("mx"))

  /** Merge two partial-state tables (same key columns). */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.select((keys ++ stateCols).map(col): _*)
      .unionByName(b.select((keys ++ stateCols).map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("sm")).as("sm"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  /** Derive the user-facing view (adds avg) from stored state. */
  def finalized(state: DataFrame): DataFrame =
    state.withColumn("avg", col("sm") / col("cnt"))

  /** Incremental JOIN maintenance (the IVM delta rule): given snapshots
    * A = Aold ∪ Ad and B = Bold ∪ Bd (disjoint deltas), the new join rows
    * are exactly
    *
    *   Δ(A ⋈ B) = (Ad ⋈ Bold) ∪ (Aold ⋈ Bd) ∪ (Ad ⋈ Bd)
    *
    * so refreshing a materialized join costs O(|Δ| ⋈ |snapshot|), never a
    * full A ⋈ B rescan — the join twin of the partial-aggregate refresh.
    * The three terms are disjoint (each pairs a distinct old/new origin
    * combination), so the union is exact, not a bag approximation.
    * Output columns: join keys, then A's, then B's remaining columns. */
  def joinDelta(aOld: DataFrame, aDelta: DataFrame,
                bOld: DataFrame, bDelta: DataFrame,
                keys: Seq[String]): DataFrame =
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))

  /** Fold a new event batch into the rollup at `aggPath` (created on first
    * call), atomically via the snapshot swap — readers never see a partial
    * refresh. Only the NEW batch is scanned. */
  def refresh(spark: SparkSession, aggPath: String, newEvents: DataFrame,
              keys: Seq[String], valueCol: String): Unit =
    refreshPartial(spark, aggPath, partial(newEvents, keys, valueCol), keys)

  /** Fold an ALREADY-PARTIAL state batch in — the streaming twin's entry
    * point: an append-mode watermarked window aggregation emits each closed
    * window's (cnt,sm,mn,mx) exactly once, and those rows merge into the
    * rollup by the same monoid (see [[graft.streaming.Sinks.rollupRefresh]]). */
  def refreshPartial(spark: SparkSession, aggPath: String, newState: DataFrame,
                     keys: Seq[String]): Unit = {
    // readSnapshot, not a bare exists-check: after a crash inside a prior
    // swapWrite the only complete rollup can live at `aggPath.swap.old` —
    // ignoring it would silently reset accumulated state to this batch.
    val next = graft.sources.Writers
      .readSnapshot(spark, aggPath, newState.schema)
      .map(existing => merge(existing, newState, keys))
      .getOrElse(newState)
    graft.sources.Writers.swapWrite(next, aggPath)
  }

  /** [[refreshPartial]] for a Hive-partitioned rollup: when the rollup is
    * partitioned by a key subset with bounded churn (the natural layout —
    * day or tenant×day — since a watermarked stream only emits windows
    * near the watermark), each refresh reads, merges and swaps ONLY the
    * partitions the batch touches. `refreshPartial`'s full-snapshot swap
    * costs O(|rollup|) per batch; at a year of hourly×user state that is
    * thousands of days rewritten to fold in today's rows. Scoping,
    * per-directory atomicity and crash healing are
    * [[graft.sources.Writers.mergePartitioned]]'s (shared with the
    * upsert/delete sinks); the same refresh-split invariant holds because
    * the merge monoid is applied per partition and partitions are disjoint
    * by construction. `partitionCols` must be a prefix-independent subset
    * of `keys` (every state row carries them). */
  def refreshPartialPartitioned(spark: SparkSession, aggPath: String,
                                newState: DataFrame, keys: Seq[String],
                                partitionCols: Seq[String]): Seq[String] = {
    require(partitionCols.forall(keys.contains),
      s"partition columns $partitionCols must be grouping keys ($keys)")
    graft.sources.Writers.mergePartitioned(
      spark, aggPath, newState, partitionCols, newState.schema) { scoped =>
      merge(scoped, newState, keys)
    }
  }
}
