package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the ANALYZE/data-quality step a pipeline runs before
  * trusting a new drop of data: per column, row/null/distinct counts and
  * min/max, emitted as one tidy row per column.
  *
  * Single aggregation job over one scan (Spark plans the multiple exact
  * count(DISTINCT)s with one Expand — input is replicated per distinct
  * aggregate inside the stage, never rescanned), then a stack() unpivot of
  * the single result row. Exact distincts keep the DuckDB oracle
  * bit-comparable; at 100 TB swap `countDistinct` for
  * `approx_count_distinct` — the plan shape is unchanged and the Expand
  * disappears.
  *
  * min/max surface as strings for a uniform schema; profile numeric-
  * rendering-stable columns (integers, strings, dates) when hash-comparing
  * across engines — float formatting differs. */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // internal aliases are INDEX-based and the unpivot is built from typed
    // Columns (not a selectExpr string) so profiled column names with
    // spaces/quotes/dashes — routine in ingested CSV headers — can never
    // break or corrupt the generated expression
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(col(c)).as(s"__nn_$i"),
        countDistinct(col(c)).as(s"__nd_$i"),
        min(col(c)).cast("string").as(s"__min_$i"),
        max(col(c)).cast("string").as(s"__max_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$i")).as("n_nulls"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__min_$i").as("min_val"),
        col(s"__max_$i").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Islands-and-gaps over an integral key sequence ("did the ingest drop a
    * batch"), scalable: a naive lead() over ALL keys needs one global sort
    * on a single task. Here keys bucket by `bucketSize`, the lead() window
    * partitions by bucket (parallel), and the only global pass is over the
    * per-bucket (min, max) summary — #buckets rows, driver-scale. Gaps that
    * straddle bucket boundaries come from that summary; gaps inside a
    * bucket from the partitioned window. Returns (gap_start, gap_end,
    * gap_len). */
  def sequenceGaps(df: DataFrame, keyCol: String,
                   bucketSize: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketSize >= 2, s"bucketSize must be >= 2, got $bucketSize")
    val keys = df.select(col(keyCol).cast("long").as("k")).distinct()
      .withColumn("b", floor(col("k") / bucketSize))
    val w = Window.partitionBy(col("b")).orderBy(col("k"))
    val within = keys.withColumn("next_k", lead(col("k"), 1).over(w))
      .filter(col("next_k") > col("k") + 1)
      .select((col("k") + 1).as("gap_start"), (col("next_k") - 1).as("gap_end"))
    val bounds = keys.groupBy(col("b")).agg(min(col("k")).as("mn"), max(col("k")).as("mx"))
    val wb = Window.orderBy(col("b")) // one row per bucket — tiny by design
    val across = bounds.withColumn("next_mn", lead(col("mn"), 1).over(wb))
      .filter(col("next_mn") > col("mx") + 1)
      .select((col("mx") + 1).as("gap_start"), (col("next_mn") - 1).as("gap_end"))
    within.unionByName(across)
      .withColumn("gap_len", col("gap_end") - col("gap_start") + 1)
      .orderBy(col("gap_start"))
  }
}
