package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-defeating equi-joins. The reference never joins at corpus scale
  * (its joins are per-request id lookups), but a 100 TB training-data
  * pipeline joins on power-law keys constantly — user_id, document host,
  * entity id — where one hot key lands an entire shuffle partition on a
  * single task and the stage runs at the speed of its slowest straggler.
  *
  * Two composable remedies, both producing results identical to a plain
  * equi-join (oracle-checkable — salting affects row ROUTING only):
  *
  *  - [[saltedJoin]]: shard every left key into `saltFactor` deterministic
  *    sub-keys and replicate the right side once per shard — a hot key's
  *    rows spread over `saltFactor` tasks at the cost of a ×saltFactor
  *    right-side blow-up. Use when the right side is modest (dim tables).
  *  - [[skewJoin]]: detect the heavy-hitter keys first, salt ONLY their
  *    rows, and run the long tail as a plain shuffle join — the production
  *    shape, since replicating the right side for already-balanced keys is
  *    pure waste.
  *
  * Relationship to AQE (`spark.sql.adaptive.skewJoin.enabled`): AQE splits
  * oversized sort-merge partitions at runtime and is the first thing to
  * reach for; these operators are the static twin for when AQE can't see
  * the skew (skew introduced mid-stage by an explode, non-sort-merge
  * plans, or an agg/window downstream of the join keeping the partitioning).
  */
object Skew {

  private val LSalt = "__graft_lsalt"
  private val RSalt = "__graft_rsalt"

  /** Deterministic per-row salt: hash of (input partition id, row content)
    * modulo `saltFactor`. Any value in [0, saltFactor) is CORRECT (the
    * right side carries every salt), so the only job here is SPREAD.
    * Content alone is not enough — exact-duplicate rows of a hot key
    * (replayed events, a key-only projection) would all hash to one shard
    * and re-create the straggler; mixing in `spark_partition_id()` spreads
    * duplicates across as many shards as they have input partitions.
    * Still retry-idempotent: partition id + content are stable for a given
    * input layout, unlike rand() (which Spark also forbids in join keys). */
  private[graft] def rowSalt(df: DataFrame, saltFactor: Int): Column = {
    // hash() rejects MapType (anywhere in the tree) at analysis — salting a
    // wide production row with a metadata map column must not crash, so
    // only hashable columns contribute spread; partition id alone is the
    // floor (still spreads duplicates across input partitions)
    val cols = graft.functions.Fns.hashableCols(df).map(col).toIndexedSeq
    pmod(hash((spark_partition_id() +: cols): _*), lit(saltFactor)).cast("int")
  }

  /** Equi-join with every left row salted and the right side replicated
    * `saltFactor` times. Supports "inner" and "left" (an unmatched left key
    * has no right rows under ANY salt, so left-outer rows emit exactly
    * once). Result == `left.join(right, leftKey === rightKey, joinType)`. */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(Set("inner", "left", "left_outer")(joinType),
      s"salting preserves semantics for inner/left joins only, got $joinType")
    val l = left.withColumn(LSalt, rowSalt(left, saltFactor))
    val r = right.withColumn(RSalt, explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, l(LSalt) === r(RSalt) && l(leftKey) === r(rightKey), joinType)
      .drop(LSalt, RSalt)
  }

  /** Selective skew join: exact heavy-hitter detection (left keys with
    * > `heavyThreshold` rows), salted join for those keys, plain shuffle
    * join for the tail, union. The heavy-key set is assumed tiny (it's the
    * DEFINITION of skew — few keys, many rows) and is broadcast to split
    * both sides without a shuffle.
    *
    * At 100 TB swap the exact count for a sampled sketch
    * (`left.sample(0.001).groupBy(key).count()` scaled) — heavy hitters at
    * 1000× threshold survive any sample; correctness is unaffected either
    * way because BOTH branches compute the same join, only routing differs.
    */
  def skewJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               saltFactor: Int, heavyThreshold: Long,
               joinType: String = "inner"): DataFrame = {
    val heavy = left.groupBy(col(leftKey)).count()
      .filter(col("count") > heavyThreshold)
      .select(col(leftKey).as("__graft_hk"))
    val hk = broadcast(heavy)
    val lHeavy = left.join(hk, col(leftKey) === col("__graft_hk"), "left_semi")
    val lTail = left.join(hk, col(leftKey) === col("__graft_hk"), "left_anti")
    val rHeavy = right.join(hk, col(rightKey) === col("__graft_hk"), "left_semi")
    val rTail = right.join(hk, col(rightKey) === col("__graft_hk"), "left_anti")
    // positional union: both branches emit (left columns ++ right columns)
    // in identical order, and a plain join's output may legally carry
    // duplicate column names (shared non-key names) that a by-name union
    // would reject even though the equivalent plain join succeeds
    saltedJoin(lHeavy, rHeavy, leftKey, rightKey, saltFactor, joinType)
      .union(lTail.join(rTail, lTail(leftKey) === rTail(rightKey), joinType))
  }
}
