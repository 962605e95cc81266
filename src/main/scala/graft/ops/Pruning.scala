package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime-filter pruning — the engine-level analog of the reference's
  * "push the filter into the index" discipline (its Qdrant filters ride the
  * HNSW scan, `memory_graph.py:8152-8158`), re-expressed for a shuffle
  * world: before a big fact⋈dim semi join, build a Bloom filter of the dim
  * keys and apply it to the fact scan, so the shuffle (or even the scan,
  * once the predicate reaches parquet row-group stats) carries only rows
  * that can possibly match.
  *
  * Why this matters at 100 TB: a left-semi hash join must first shuffle the
  * ENTIRE fact table on the join key. When the dim side selects 0.1% of
  * fact rows, a ~1 MiB Bloom image kills ~99.9% of that shuffle at map
  * side. The filter is built with `DataFrameStatFunctions.bloomFilter` — a
  * distributed `treeAggregate` over the dim partitions; only the final
  * fused bit array (sized from `expectedItems`/`fpp`, ~1.2 MiB per million
  * keys at 1% fpp) lands on the driver and is broadcast, never the keys
  * themselves. This is exactly what Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` injection does; having it as
  * an explicit operator lets the engine apply it where the optimizer's
  * size heuristics won't fire (e.g. a dim produced by a complex subplan
  * whose stats are unknown).
  */
object Pruning {

  /** Bloom-prefiltered left-semi join: result is EXACTLY
    * `fact semi⋈ dim` — Bloom false positives survive the prefilter but
    * are removed by the exact semi join that follows; false negatives are
    * impossible. Join keys must be integral or string (the sketch hashes
    * both natively).
    */
  def bloomSemiJoin(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    // materialize the dim KEYS once: the bloom build is an eager action and
    // the exact semi join is a second consumer — without this the whole dim
    // subplan (the expensive case the scaladoc motivates) runs twice. The
    // distinct also shrinks both the sketch build and the join build side.
    // Keys are WIDENED to the probe's hash domain (string or long — the
    // same domain the mightContain dispatch below uses for the fact side):
    // mismatched integral widths would otherwise insert with one hash
    // width and probe with another (every probe misses — false negatives);
    // casting dim DOWN to a narrower fact type would overflow-wrap and
    // manufacture matches. try_cast keeps cross-family garbage a non-match
    // instead of an ANSI error. The semi join then upcasts both sides
    // itself, so results equal the plain semi join.
    val probeType = fact.schema(factKey).dataType match {
      case org.apache.spark.sql.types.StringType => "string"
      case _ => "bigint"
    }
    val dimKeys = dim
      .select(col(dimKey).try_cast(probeType).as(factKey))
      .filter(col(factKey).isNotNull)
      .distinct()
      .localCheckpoint(true)
    val filter = dimKeys.stat.bloomFilter(factKey, expectedItems, fpp)
    // broadcast (not closure-captured) so the bloom image ships once per
    // executor, not once per task; Spark's ContextCleaner reclaims it when
    // this reference is collected.
    val bc = fact.sparkSession.sparkContext.broadcast(filter)
    val mightContain: Column = fact.schema(factKey).dataType match {
      case org.apache.spark.sql.types.StringType =>
        udf((k: String) => k != null && bc.value.mightContainString(k))
          .apply(col(factKey))
      case _ =>
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
          .apply(col(factKey).cast("long"))
    }
    fact.filter(mightContain)
      .join(dimKeys, Seq(factKey), "left_semi")
  }
}
