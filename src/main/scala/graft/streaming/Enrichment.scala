package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream enrichment joins. The reference processes events one at a
  * time against stored state (feedback events looked up against memories,
  * `services/memory_management.py:3192-3404`); the streaming-native shape
  * is a watermarked interval join: each left event matched to right events
  * with the same key inside a bounded time window.
  *
  * The window bound is what makes this run forever on a cluster: Spark
  * keeps right-side rows in join state only until
  * `watermark + lookback` passes them, so state size is
  * O(rate × (lookback + lateness)) — independent of stream age. An
  * unbounded-condition stream-stream join would grow state without limit
  * and is rejected here by construction (the interval predicate is always
  * emitted).
  */
object Enrichment {

  /** For each left-stream row: all right-stream rows with the same `keyCol`
    * whose `tsCol` falls in `[left.ts - lookback, left.ts]`. Right columns
    * (except the key) come back `r_`-prefixed. Both inputs must be
    * streaming DataFrames; `allowedLateness` sets both watermarks and
    * therefore both the dropped-late-data bound and the state horizon.
    * `lookback`/`allowedLateness` are SQL interval strings ("10 minutes").
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, lookback: String,
                   allowedLateness: String): DataFrame = {
    val clashes = (left.columns ++ right.columns.filter(_ != keyCol).map("r_" + _))
      .groupBy(identity).collect { case (c, hits) if hits.length > 1 => c }
    require(clashes.isEmpty,
      s"r_-prefixed right columns would collide with ${clashes.mkString(", ")} " +
        "— rename before joining")
    val l = left.withWatermark(tsCol, allowedLateness)
    // one projection, not a withColumnRenamed chain (a Project per column)
    val renamed = right.select(right.columns.map(c =>
      if (c == keyCol) col(c) else col(c).as(s"r_$c")).toIndexedSeq: _*)
    val r = renamed.withWatermark(s"r_$tsCol", allowedLateness)
    l.join(r,
      l(keyCol) === r(keyCol) &&
        col(s"r_$tsCol") >= col(tsCol) - expr(s"INTERVAL $lookback") &&
        col(s"r_$tsCol") <= col(tsCol))
      .drop(r(keyCol))
  }

  /** Left-OUTER interval join: like [[intervalJoin]], but left rows with
    * NO in-window right match are still emitted (right columns null) once
    * the watermark proves no match can arrive — the "every purchase gets a
    * row, attributed or not" shape. The emission is deliberately LATE by
    * one watermark horizon for unmatched rows: correctness requires
    * waiting out `lookback + allowedLateness` before declaring a miss,
    * which is exactly the state bound, so memory stays
    * O(rate × (lookback + lateness)) here too. */
  def intervalJoinOuter(left: DataFrame, right: DataFrame, keyCol: String,
                        tsCol: String, lookback: String,
                        allowedLateness: String): DataFrame = {
    val l = left.withWatermark(tsCol, allowedLateness)
    val renamed = right.select(right.columns.map(c =>
      if (c == keyCol) col(c).as(s"r_$keyCol") else col(c).as(s"r_$c"))
      .toIndexedSeq: _*)
    val r = renamed.withWatermark(s"r_$tsCol", allowedLateness)
    l.join(r,
      l(keyCol) === col(s"r_$keyCol") &&
        col(s"r_$tsCol") >= col(tsCol) - expr(s"INTERVAL $lookback") &&
        col(s"r_$tsCol") <= col(tsCol),
      "leftOuter")
      .drop(s"r_$keyCol")
  }

  /** Stream-static enrichment: left-join rows against the parquet
    * dimension at `dimPath`; dimension columns (except the key) come back
    * `dim_`-prefixed, and the dimension is broadcast so the stream side
    * never shuffles.
    *
    * WHERE you call this decides the freshness semantics, because a static
    * join side's FILE LISTING is resolved when the plan is built, not per
    * micro-batch:
    *  - in the streaming plan (`staticEnrich(stream, ...)`) the dimension
    *    is frozen at stream start — and a `swapWrite` under a running
    *    stream makes the pinned file paths vanish (FAILED_READ_FILE);
    *  - inside `foreachBatch { (batch, _) => staticEnrich(batch, ...) }`
    *    each micro-batch builds a fresh plan, so an atomically swapped
    *    dimension is re-listed and picked up without restarting the
    *    stream. That is the pattern for `swapWrite`/`keyedUpsert`-
    *    maintained dimensions (spec-pinned). */
  def staticEnrich(stream: DataFrame, dimPath: String, keyCol: String): DataFrame = {
    val spark = stream.sparkSession
    val dim = spark.read.parquet(dimPath)
    val renamed = dim.select(dim.columns.map(c =>
      if (c == keyCol) col(c) else col(c).as(s"dim_$c")).toIndexedSeq: _*)
    stream.join(broadcast(renamed), Seq(keyCol), "left")
  }
}
