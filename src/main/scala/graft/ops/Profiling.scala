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
}
