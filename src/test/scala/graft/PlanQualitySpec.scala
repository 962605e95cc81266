package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan regression guards: the performance story rests on specific
  * plan shapes (filters reaching the parquet scan, narrow read schemas,
  * broadcast joins for dimension-sized sides, TakeOrderedAndProject instead
  * of global sorts). A code change that silently loses one of these still
  * returns correct rows — only the plan shows the regression, so pin it. */
class PlanQualitySpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q01: predicates are pushed into the parquet scan and the read schema is pruned") {
    val p = planOf("q01_pruned_scan")
    assert(p.contains("PushedFilters: [IsNotNull"), s"no pushdown in:\n$p")
    // (the rendered PushedFilters list truncates, so assert the first entries)
    assert(p.contains("LessThan(l_shipdate"), s"shipdate filter not pushed:\n$p")
    // projection pruning: 16-column lineitem must not be read wholesale
    assert(!p.contains("l_comment"), s"read schema not pruned:\n$p")
  }

  test("q15 KNN: top-k via TakeOrderedAndProject, query vector broadcast, no sort-merge join") {
    val p = planOf("q15_knn_cosine")
    assert(p.contains("TakeOrderedAndProject"), s"global sort instead of top-k heap:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("Broadcast"),
      s"query row not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"KNN shuffled a sort-merge join:\n$p")
  }

  test("q03 multiway join: dimension tables broadcast, no cartesian product") {
    val p = planOf("q03_join_multiway")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast hash join in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product in:\n$p")
  }

  test("q02 aggregation: partial (map-side) aggregation before the exchange") {
    val p = planOf("q02_agg_pushdown")
    // two HashAggregates (partial + final) around one shuffle
    assert("HashAggregate".r.findAllIn(p).length >= 2, s"no partial agg in:\n$p")
  }

  test("q06 top-k orders: limit+sort fuses to TakeOrderedAndProject") {
    val p = planOf("q06_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), s"global sort instead of top-k heap:\n$p")
  }

  test("q70 range join: equi-join machinery, never a nested loop") {
    val p = planOf("q70_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"range join nested-looped:\n$p")
    assert(!p.contains("CartesianProduct"), s"range join went cartesian:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"no equi-join machinery:\n$p")
  }

  test("q82 bloom semi join: prefilter evaluated scan-side, then a real semi join") {
    val p = planOf("q82_bloom_semi")
    // the bloom probe must run BEFORE the join (a Filter under the join),
    // and the exactness pass must still be a semi join
    assert(p.contains("LeftSemi"), s"no semi join in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bloom semi join degenerated:\n$p")
  }

  test("q87 top-k per group: partial ObjectHashAggregate, no Window operator") {
    val p = planOf("q87_topk_group")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"no partial/final aggregator pair in:\n$p")
    assert(!p.contains("Window"), s"fell back to a window sort:\n$p")
  }

  test("q80 triangles: all equi-joins, no cartesian/nested-loop anywhere") {
    val p = planOf("q80_triangle_counts")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"triangle counting degenerated to a product:\n$p")
  }

  test("q88 funnel: the three stacked windows share ONE user_id exchange") {
    val p = planOf("q88_funnel")
    assert("\\bWindow\\b".r.findAllIn(p).length >= 3, s"expected 3 Window ops in:\n$p")
    // only 3 exchanges total: one for the windows' user_id partition, one
    // for the per-user groupBy (same key, AQE-reused or planned), one for
    // the stage-count groupBy + final order. The regression guarded against
    // is per-window exchanges (5+).
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 4, s"window stack re-shuffles ($exchanges exchanges):\n$p")
  }

  test("bucketed tables co-locate: the join runs with no shuffle and no sort") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val chunks = (0L until 2000L).map(i => (i % 400, i, s"chunk_$i"))
      .toDF("memory_id", "chunk_id", "text")
    val memories = (0L until 400L).map(i => (i, s"memory_$i")).toDF("mem_id", "title")
    // one writer task → one file per bucket; Spark only trusts the sortBy
    // order (and skips the per-task sort) for single-file buckets
    graft.sources.Writers.bucketedWrite(chunks.repartition(1), "bq_chunks",
      "memory_id", 8, sortCols = Seq("memory_id"))
    graft.sources.Writers.bucketedWrite(memories.repartition(1), "bq_memories",
      "mem_id", 8, sortCols = Seq("mem_id"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the merge path
    // since 3.0 Spark ignores the buckets' sortBy order unless told to trust
    // it (it requires the one-file-per-bucket layout we wrote above)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val joined = spark.table("bq_chunks")
        .join(spark.table("bq_memories"),
          col("memory_id") === col("mem_id"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles — co-location lost:\n$p")
      // sortBy'd single-file buckets arrive pre-sorted: no per-task sort either
      assert(!p.contains("Sort ["), s"bucketed-sorted data re-sorted:\n$p")
      assert(joined.count() === 2000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS bq_chunks")
      spark.sql("DROP TABLE IF EXISTS bq_memories")
    }
  }

  test("q115 fused search: query vector broadcast, no cartesian/nested-loop, " +
    "top-k heaps instead of global sorts, hydration broadcast") {
    val p = planOf("q115_fused_search")
    // the ≤3k-row candidate set must broadcast into the memories hydration
    // join, and the qvec literal into the KNN scan
    assert(p.contains("BroadcastHashJoin"), s"hydration not broadcast:\n$p")
    // the only nested-loop joins allowed are the 1-row broadcast-qvec
    // attaches (one per KNN leg); a cartesian product is never acceptable
    assert(!p.contains("CartesianProduct"), s"fused search went cartesian:\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 2,
      s"unexpected nested-loop join beyond the qvec attach:\n$p")
    assert(!p.contains("SortMergeJoin"), s"candidate-set join shuffled a sort-merge:\n$p")
    // (the oversampled chunk top-k heap sits inside the materialized hit
    // list; the final Sort runs over the ≤ 4·topK fused candidate set)
    // F1 ACL predicate reaches the scan side: the read-access grant arrays
    // appear ONLY in the ACL filter (the hydration projection never selects
    // them), so their presence pins the filter itself
    assert(p.contains("user_read_access"),
      s"ACL filter missing from the physical plan:\n$p")
    // shuffle budget for the post-materialization segment (the oversampled
    // hit list and quota window are checkpointed upstream): exactly the
    // fused max-score groupBy + the final (score, id) sort — 2 shuffling
    // exchanges, with hydration arriving as a broadcast, never a shuffle.
    // A third shuffle here means fusion or hydration silently regressed.
    val shuffles = "Exchange (hash|range)partitioning".r.findAllIn(p).length
    assert(shuffles <= 2, s"fused-search segment grew a shuffle ($shuffles):\n$p")
    assert("BroadcastExchange".r.findAllIn(p).length >= 1,
      s"hydration lost its broadcast exchange:\n$p")
  }

  test("q121 sequence packing: one window per shard, no extra exchange") {
    val p = planOf("q121_sequence_packing")
    // exactly one Window (the cumsum); the groupBy reuses its partitioning
    assert("Window".r.findAllIn(p).length >= 1, s"no window cumsum in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"packing grew a join:\n$p")
  }

  test("q122 batch KNN: bounded ObjectHashAggregate pair, no window sort") {
    val p = planOf("q122_batch_knn")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"no partial/final bounded top-k pair in:\n$p")
    assert(!p.contains("Window"), s"fell back to a window sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"query set not broadcast:\n$p")
  }

  test("dynamic partition pruning: a selective dim filter prunes fact partitions at runtime") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the 100 TB fact⋈dim posture: the fact table is laid out partitioned
    // (Writers.clusteredWrite's date/tenant layout); a filter that lives on
    // the DIM side must still prune fact PARTITIONS — statically invisible,
    // so Spark must inject a runtime (dynamicpruning) subquery into the
    // fact scan. If this plan feature is lost, every dim-filtered join
    // degrades to a full fact scan.
    val dir = java.nio.file.Files.createTempDirectory("dpp_fact").toString
    val fact = (0 until 10000).map(i => (i.toLong, i % 20, i * 1.0)).toDF("id", "day", "v")
    graft.sources.Writers.clusteredWrite(fact, dir, Seq("day"), Seq("id"))
    val dimDir = java.nio.file.Files.createTempDirectory("dpp_dim").toString
    (0 until 20).map(i => (i, if (i < 2) "keep" else "drop")).toDF("d_day", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val joined = spark.read.parquet(dir)
      .join(spark.read.parquet(dimDir).filter(col("tag") === "keep"),
        col("day") === col("d_day"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no runtime partition-pruning subquery on the fact scan:\n$p")
    assert(joined.count() === 1000L)
  }

  test("q134 hard negatives: filters precede the bounded top-k pair, scan is pruned") {
    val p = planOf("q134_hard_negatives")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"no partial/final bounded top-k pair in:\n$p")
    assert(!p.contains("Window"), s"fell back to a window sort:\n$p")
    // anchors broadcast; label/cap filters must run before aggregation so
    // ≤ k rows per anchor leave each partition
    assert(p.contains("BroadcastExchange"), s"anchor batch not broadcast:\n$p")
    assert(p.contains("GreaterThan(vec_id,5"), s"corpus filter not pushed:\n$p")
  }

  test("q133 mixture sample: one domain window, quota joined by broadcast") {
    val p = planOf("q133_mixture_sample")
    assert(p.contains("BroadcastHashJoin"), s"quota table not broadcast:\n$p")
    assert("Window".r.findAllIn(p).length >= 1, s"no rank window:\n$p")
    assert(!p.contains("SortMergeJoin"), s"quota join shuffled:\n$p")
    // only (doc_id, source) may be read — never the text payload
    assert(!p.contains("text"), s"read schema not pruned to id+domain:\n$p")
  }

  test("q135 matryoshka rescore: prefix prune is a top-k heap, never a global sort") {
    val p = planOf("q135_matryoshka_rescore")
    assert(p.contains("TakeOrderedAndProject"), s"global sort instead of top-k heap:\n$p")
    assert(!p.contains("SortMergeJoin"), s"query row join shuffled:\n$p")
  }

  test("q47 flagship search plan: one rollup exchange, broadcast hydration, no product") {
    val p = planOf("q47_domain_search")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"hydration not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"flagship search went cartesian:\n$p")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1,
      s"unexpected nested-loop join beyond the qvec attach:\n$p")
    assert(!p.contains("SortMergeJoin"), s"hydration shuffled a sort-merge join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"global sort instead of top-k heap:\n$p")
  }

  test("q148 containment / q150 sparse cosine: inverted-index equi-joins, " +
    "never a cartesian or nested loop") {
    Seq("q148_containment", "q150_sparse_cosine_join").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q nested-loop joined:\n$p")
    }
  }

  test("q151 record linkage: block-keyed equi self-join, score is a " +
    "projection (no aggregation, no window)") {
    val p = planOf("q151_fellegi_sunter")
    assert(!p.contains("CartesianProduct"), s"blocking lost — cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"blocking lost — nested loop:\n$p")
    assert(!p.contains("WindowExec") && !p.contains("Window "),
      s"score should be a pure projection:\n$p")
  }

  test("q189 prefix join / q193 pHash / q198 interval overlap: " +
    "candidate generation is equi-join keyed, never a product") {
    Seq("q189_prefix_filter_join", "q193_phash_neardup",
        "q198_interval_overlap").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q nested-loop joined:\n$p")
    }
  }

  test("q196 global cumsum: the running total never funnels through " +
    "a single-partition exchange") {
    val p = planOf("q196_global_cumsum")
    assert(!p.contains("Exchange SinglePartition"),
      s"two-pass prefix sum degraded to a serial window:\n$p")
  }

  test("q230 margin bitext: both KNN legs broadcast the query side into " +
    "bounded top-k aggregations, no sort-merge join") {
    val p = planOf("q230_margin_bitext")
    assert(p.contains("ObjectHashAggregate"),
      s"bounded TopK aggregator missing:\n$p")
    assert(p.contains("BroadcastExchange"), s"query side not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"bitext scoring shuffled a sort-merge join:\n$p")
  }

  test("q235 agg IVM: signed delta folds via partial (map-side) aggregation, " +
    "no window operator") {
    val p = planOf("q235_agg_ivm")
    assert(p.contains("partial_sum") || p.contains("partial sum") ||
      p.contains("HashAggregate"), s"no partial aggregation:\n$p")
    assert(!p.contains("Window"), s"IVM fold planned a window:\n$p")
  }

  test("q238 lateness audit: the running watermark max never funnels " +
    "through a single-partition exchange") {
    val p = planOf("q238_lateness_audit")
    assert(!p.contains("Exchange SinglePartition"),
      s"running max degraded to a serial window:\n$p")
  }

  test("q247 hubness: all-pairs KNN runs as a bounded top-k aggregation " +
    "with the query batch broadcast, no sort-merge join") {
    val p = planOf("q247_hubness")
    assert(p.contains("ObjectHashAggregate"),
      s"bounded TopK aggregator missing:\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("Broadcast"),
      s"query batch not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"hubness scoring shuffled a sort-merge join:\n$p")
  }

  test("q239 k-center: a selection round scans the corpus against " +
    "BROADCAST centers — no shuffle join, no cartesian against a " +
    "non-broadcast side (the query's own rounds are checkpointed, so pin " +
    "the round shape directly)") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.cosineSim
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val centers = emb.orderBy(col("vec_id")).limit(2)
    val round = emb
      .crossJoin(broadcast(centers.select(col("embedding").as("cvec"))))
      .withColumn("dist", lit(1.0) - cosineSim(col("embedding"), col("cvec")))
      .groupBy(col("vec_id"))
      .agg(min(col("dist")).as("mindist"), first(col("embedding")).as("embedding"))
      .orderBy(desc("mindist"), col("vec_id")).limit(1)
    val p = round.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"), s"centers not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"k-center round shuffled the corpus:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"argmax planned a global sort:\n$p")
  }

  test("q241 GDPR cascade: the delete list propagates as broadcast " +
    "semi/anti joins, never a shuffle join") {
    val p = planOf("q241_gdpr_cascade")
    assert(p.contains("BroadcastHashJoin"),
      s"delete list not broadcast:\n$p")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      s"cascade lost its semi/anti joins:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"delete propagation shuffled a sort-merge join:\n$p")
  }
}
