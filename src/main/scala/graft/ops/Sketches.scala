package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built into
  * Spark 4) — the incremental/distributed answer to "distinct users per
  * key over 100 TB": exact `count(DISTINCT)` must shuffle every distinct
  * value every time; a stored per-partition sketch is ~KBs, merges
  * associatively (so daily sketches roll up to monthly without touching
  * raw data), and estimates within ~1.6% at lgK=12.
  *
  * Pairs with [[IncrementalAgg]]: cnt/sum/min/max fold exactly, distincts
  * fold via sketches — together they cover the standard rollup table.
  */
object Sketches {

  /** Per-group HLL sketch of `valueCol` (binary column `sk`). */
  def distinctSketch(df: DataFrame, keys: Seq[String], valueCol: String,
                     lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sk"))

  /** Merge sketch tables (e.g. daily partials) into one per-group sketch —
    * the union is over sketches only, raw data is never re-read. */
  def mergeSketches(parts: DataFrame, keys: Seq[String]): DataFrame =
    parts.groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("sk")).as("sk"))

  /** Point estimates from stored sketches. */
  def estimate(sketches: DataFrame): DataFrame =
    sketches.withColumn("approx_distinct", hll_sketch_estimate(col("sk")))
}
