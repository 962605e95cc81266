package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Statistical/aggregation breadth beyond the reference's surface (A9 family
  * — "free via Catalyst if exposed"): exact interpolated percentiles, CUBE
  * grouping sets, ordered string aggregation. All map-side-combinable or
  * grouping-set expansions Catalyst plans natively.
  */
object StatsQueries {

  def entries: Seq[Entry] = Seq(

    // Exact interpolated percentiles per group (Spark `percentile` and
    // DuckDB `quantile_cont` share linear interpolation).
    Entry("q58_percentiles",
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(min(col("value")), 4).as("vmin"),
          round(max(col("value")), 4).as("vmax"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  round(quantile_cont(value, 0.5), 4) AS p50,
             |  round(quantile_cont(value, 0.9), 4) AS p90,
             |  round(min(value), 4) AS vmin,
             |  round(max(value), 4) AS vmax
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // CUBE: all grouping-set combinations with subtotals.
    Entry("q59_cube_agg",
      (s, d) => Tables.events(s, d)
        .withColumn("day", dayofmonth(col("ts")))
        .filter(col("day") <= 3)
        .cube(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(asc_nulls_first("event_type"), asc_nulls_first("day")),
      Some("""SELECT event_type, day, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM (SELECT event_type, CAST(date_part('day', CAST(ts AS TIMESTAMP)) AS INT) AS day,
             |        value FROM events)
             |WHERE day <= 3
             |GROUP BY CUBE (event_type, day)
             |ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST""".stripMargin)),

    // Ordered string aggregation (deterministic listagg — sort inside the
    // aggregated array, then join).
    Entry("q60_string_agg",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_totalprice") > 480000)
        .groupBy(col("o_custkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("o_orderpriority")))).as("priorities"),
          count(lit(1)).as("n"))
        .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey,
             |  string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
             |  count(*) AS n
             |FROM orders WHERE o_totalprice > 480000
             |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // Column profiling (the ANALYZE / data-quality step): one scan, one
    // aggregation (multi-distinct via Expand), one row per column. Profiled
    // columns are rendering-stable types (ints/strings) so min/max string
    // casts hash-match across engines.
    Entry("q78_profile",
      (s, d) => graft.ops.Profiling.profile(Tables.orders(s, d),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy(col("column_name")),
      Some("""SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
             |  count(*) - count(o_orderkey) AS n_nulls,
             |  count(DISTINCT o_orderkey) AS n_distinct,
             |  CAST(min(o_orderkey) AS VARCHAR) AS min_val,
             |  CAST(max(o_orderkey) AS VARCHAR) AS max_val FROM orders
             |UNION ALL
             |SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
             |  count(DISTINCT o_custkey), CAST(min(o_custkey) AS VARCHAR),
             |  CAST(max(o_custkey) AS VARCHAR) FROM orders
             |UNION ALL
             |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
             |  count(DISTINCT o_orderstatus), min(o_orderstatus),
             |  max(o_orderstatus) FROM orders
             |UNION ALL
             |SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
             |  count(DISTINCT o_orderpriority), min(o_orderpriority),
             |  max(o_orderpriority) FROM orders
             |ORDER BY column_name""".stripMargin)))
}
