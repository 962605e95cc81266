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
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      s"'$c', __n, __n - __nn_$c, __nd_$c, __min_$c, __max_$c"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.length}, $stacked) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_val, max_val)")
  }
}
