package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sums — the scale-correct form of
  * `Window.orderBy(...)` running totals, which Catalyst executes as ONE
  * partition (the classic 100 TB antipattern: every row funnels through a
  * single task). The two-pass scheme is the BSP prefix-sum primitive:
  *
  *   1. range-repartition by the global order;
  *   2. per-partition partial sums (parallel) → collect (≤ #partitions
  *      scalars) → exclusive-prefix offsets, broadcast back;
  *   3. per-partition running sum (parallel, partitionBy(pid) window) +
  *      the partition's offset.
  *
  * The only serial state is one double per partition. Addition order
  * differs from a sequential scan, so cumulative outputs are float32 at
  * the emit boundary (the repo-wide transcendental/sum-order discipline).
  */
object PrefixSum {

  /** Global running sum of `valueCol` over the total order `orderCols`
    * (must be a unique key for a deterministic profile). Appends
    * `running` to the input rows.
    *
    * The cumulative is carried in DECIMAL: a float/double carry would make
    * `running` depend on the partial-vs-sequential ADDITION ORDER, and at
    * cumulative magnitudes the drift exceeds even a float32 ulp (observed
    * at sf0.1: 263/100k rows one ulp off a sequential oracle). Decimal
    * addition is exact and order-independent, so the output is
    * bit-reproducible under ANY partitioning — the property a 1000-executor
    * run needs anyway. Callers pass a decimal `valueCol`
    * (e.g. `col("v").cast("decimal(30,10)")`). */
  def globalRunningSum(df: DataFrame, orderCols: Seq[Column],
                       valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nParts = spark.sessionState.conf.numShufflePartitions
    // dtype check BEFORE the repartition+checkpoint: analysis is free, and
    // an invalid call must not pay a full materialization first.
    require(df.withColumn("_v", valueCol).schema("_v").dataType
        .isInstanceOf[org.apache.spark.sql.types.DecimalType],
      "globalRunningSum needs a DECIMAL value column (exact, order-independent " +
        "accumulation) — cast the measure, e.g. col(\"v\").cast(\"decimal(30,10)\")")
    val ranged = df.repartitionByRange(nParts, orderCols: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_v", valueCol)
      .localCheckpoint(true) // pin the partitioning: offsets must describe THIS layout
    val partials = ranged.groupBy(col("_pid"))
      .agg(sum(col("_v")).as("psum"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1))
      .sortBy(_._1)
    // exclusive prefix: partition p's offset = sum of partials before p
    val zero = java.math.BigDecimal.ZERO
    val offsets = partials.scanLeft(0 -> zero) {
      case ((_, acc), (pid, psum)) => pid -> acc.add(psum)
    }.init.zip(partials).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    val w = Window.partitionBy(col("_pid"))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Align both addends to (37, s): Spark's decimal-addition typing would
    // otherwise need precision 39 and, under allowPrecisionLoss, CLIP THE
    // SCALE (observed: scale 10 → 9, a 1e-9 rounding) — silent drift, the
    // exact thing this operator exists to rule out. (37, s) + (37, s) fits
    // in (38, s) losslessly; the offsets' own values are exact sums of
    // scale-s inputs, so the cast is value-preserving.
    val s = ranged.schema("_v").dataType
      .asInstanceOf[org.apache.spark.sql.types.DecimalType].scale
    val dt = s"decimal(37,$s)"
    ranged.join(broadcast(offDf), Seq("_pid"))
      .withColumn("running",
        col("_off").cast(dt) + sum(col("_v")).over(w).cast(dt))
      .drop("_pid", "_off", "_v")
  }

  /** Global running MAX of a LONG `valueCol` over the total order
    * `orderCols` — same two-pass scheme as [[globalRunningSum]], but max
    * is idempotent and order-independent, so the carry is an exact long
    * and the output is bit-reproducible under any partitioning with no
    * decimal machinery. Appends `running_max`. (The streaming-watermark
    * recurrence: wm = max(wm, event_time) over arrival order.) */
  def globalRunningMax(df: DataFrame, orderCols: Seq[Column],
                       valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nParts = spark.sessionState.conf.numShufflePartitions
    // dtype check BEFORE the repartition+checkpoint: analysis is free, and
    // an invalid call must not pay a full materialization first.
    require(df.withColumn("_v", valueCol).schema("_v").dataType ==
        org.apache.spark.sql.types.LongType,
      "globalRunningMax needs a LONG value column — cast the measure")
    val ranged = df.repartitionByRange(nParts, orderCols: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_v", valueCol)
      .localCheckpoint(true) // pin the partitioning: offsets must describe THIS layout
    val partials = ranged.groupBy(col("_pid"))
      .agg(max(col("_v")).as("pmax"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    // exclusive prefix max: partition p's offset = max of partials before p
    val offsets = partials.scanLeft(0 -> Long.MinValue) {
      case ((_, acc), (pid, pm)) => pid -> math.max(acc, pm)
    }.init.zip(partials).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    val w = Window.partitionBy(col("_pid"))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offDf), Seq("_pid"))
      .withColumn("running_max",
        greatest(col("_off"), max(col("_v")).over(w)))
      .drop("_pid", "_off", "_v")
  }

  /** Global 1-based `row_number()` over the total order `orderCols`,
    * appended as LONG column `out` — the distributed form of
    * `row_number().over(Window.orderBy(...))`, which Catalyst executes as
    * ONE task holding the whole relation. Same two-pass scheme as
    * [[globalRunningSum]]: range-repartition by the order, per-partition
    * COUNTS (one long per partition) → exclusive offsets broadcast back →
    * per-partition `row_number` + offset. Ranks are exact integers, so the
    * output is bit-identical to the single-window form whenever
    * `orderCols` is a total (tie-free) order — which it must be anyway for
    * either form to be deterministic. Rows comparing equal on the range
    * boundary keys land in one partition, so no rank is ever split. */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column],
                      out: String = "rn"): DataFrame =
    rankedWithCount(df, orderCols, out)._1

  /** [[globalRowNumber]] plus the exact total row count N (already known
    * from the offset pass — no extra scan). Callers that need N in-plan
    * (ntile cutoffs, "top-10 of n" predicates) take it as a literal. */
  def globalRowNumberWithCount(df: DataFrame, orderCols: Seq[Column],
                               out: String = "rn"): (DataFrame, Long) =
    rankedWithCount(df, orderCols, out)

  /** Distributed `ntile(buckets)` over the total order `orderCols`,
    * appended as INT column `out`. Bit-identical to the single-window
    * `ntile` (and to DuckDB/ANSI semantics): with N rows, the first
    * N mod buckets buckets hold ceil(N/buckets) rows, the rest
    * floor(N/buckets). The rank comes from [[globalRowNumber]] (two-pass,
    * no single-task sort); the bucket is then a map-side closed-form
    * expression of (rank, N) — exact integer arithmetic throughout. */
  def globalNtile(df: DataFrame, buckets: Int, orderCols: Seq[Column],
                  out: String): DataFrame = {
    require(buckets > 0, s"ntile buckets must be positive, got $buckets")
    val (ranked, n) = rankedWithCount(df, orderCols, "_gnt_rn")
    val q = n / buckets       // small-bucket size
    val r = n % buckets       // number of big (q+1-row) buckets
    val cut = r * (q + 1)     // rows covered by the big buckets
    // Ranks are < 2^53 so double division is exact for the floor() forms.
    val rn = col("_gnt_rn")
    val bucket =
      if (q == 0) rn // N < buckets: every row is its own bucket
      else when(rn <= cut, floor((rn - 1) / lit(q + 1)) + 1)
        .otherwise(lit(r) + floor((rn - cut - 1) / lit(q)) + 1)
    ranked.withColumn(out, bucket.cast("int")).drop("_gnt_rn")
  }

  private def rankedWithCount(df: DataFrame, orderCols: Seq[Column],
                              out: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val nParts = spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(nParts, orderCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true) // pin the partitioning: offsets must describe THIS layout
    val partials = ranged.groupBy(col("_pid"))
      .agg(count(lit(1)).as("pcnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    // exclusive prefix count: partition p's offset = rows before p
    val offsets = partials.scanLeft(0 -> 0L) {
      case ((_, acc), (pid, c)) => pid -> (acc + c)
    }.init.zip(partials).map { case ((_, off), (pid, _)) => (pid, off) }
    val total = partials.map(_._2).sum
    val offDf = offsets.toSeq.toDF("_pid", "_off")
    val w = Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
    val ranked = ranged.join(broadcast(offDf), Seq("_pid"))
      .withColumn(out, (col("_off") + row_number().over(w)).cast("long"))
      .drop("_pid", "_off")
    (ranked, total)
  }

  /** Concurrency (sweep-line) profile over half-open activity intervals
    * [startCol, endCol): per time bucket, the net change in active
    * intervals and the number concurrently active. The deltas aggregate
    * distributedly (one groupBy on the bucket); the cumulative over the
    * distinct-bucket domain runs through [[globalRunningSum]] — the
    * bucket domain is bounded by the time RANGE, not the row count, but a
    * decade of minute buckets is still 5M rows, far past what one task
    * should sort. Longs ride the decimal carry losslessly, so all counts
    * stay exact integers. Returns (bucket, net, concurrent) ordered by
    * bucket. */
  def concurrencyProfile(df: DataFrame, startCol: Column,
                         endCol: Column): DataFrame = {
    val deltas = df.select(startCol.as("bucket"), lit(1L).as("d"))
      .unionAll(df.select(endCol.as("bucket"), lit(-1L).as("d")))
      .groupBy(col("bucket")).agg(sum(col("d")).as("net"))
    globalRunningSum(deltas, Seq(col("bucket")),
        col("net").cast("decimal(20,0)"))
      .withColumn("concurrent", col("running").cast("long"))
      .drop("running")
      .orderBy(col("bucket"))
  }
}
