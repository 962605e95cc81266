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
             |ORDER BY column_name""".stripMargin)),

    // Robust outliers on the daily event-count series per type: median /
    // MAD (median absolute deviation) z-score, flagged at |z| > 3 with the
    // 1.4826 normal-consistency constant — the robust alternative to
    // q171's CUSUM (one wild day cannot drag the baseline the way a mean/
    // stddev detector lets it). Medians interpolate identically in Spark
    // `percentile` and DuckDB `quantile_cont`; counts are integers, so
    // every derived double is exact and the flag can never flip.
    Entry("q182_mad_outliers",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("c"))
        val med = daily.groupBy(col("event_type"))
          .agg(expr("percentile(c, 0.5D)").as("med"))
        val dev = daily.join(broadcast(med), "event_type")
          .withColumn("absdev", abs(col("c") - col("med")))
        val mad = dev.groupBy(col("event_type"))
          .agg(expr("percentile(absdev, 0.5D)").as("mad"))
        dev.join(broadcast(mad), "event_type")
          .withColumn("z", col("absdev") / (lit(1.4826) * col("mad")))
          .select(col("event_type"), col("day"), col("c"),
            col("z").cast("float").as("z"),
            (col("mad") > 0 && col("z") > 3.0).as("flagged"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |med AS (
             |  SELECT event_type, quantile_cont(c, 0.5) AS med
             |  FROM daily GROUP BY 1),
             |dev AS (
             |  SELECT d.event_type, d.day, d.c, abs(d.c - m.med) AS absdev
             |  FROM daily d JOIN med m USING (event_type)),
             |mad AS (
             |  SELECT event_type, quantile_cont(absdev, 0.5) AS mad
             |  FROM dev GROUP BY 1)
             |SELECT dev.event_type, dev.day, dev.c,
             |  CAST(absdev / (1.4826 * mad) AS REAL) AS z,
             |  (mad > 0 AND absdev / (1.4826 * mad) > 3.0) AS flagged
             |FROM dev JOIN mad USING (event_type)
             |ORDER BY event_type, day""".stripMargin)),

    // Last-touch conversion attribution: each purchase is credited to the
    // user's most recent view/click within a 24 h lookback (else 'none') —
    // the marketing-analytics shape of "carry forward the last qualifying
    // event", one IGNORE-NULLS running window per user, no self-join.
    // Gap minutes are an exact integer-second ratio; float32 at emit.
    Entry("q183_attribution",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val chTs = last(when(col("event_type").isin("view", "click"),
          col("ts")), ignoreNulls = true).over(w)
        val chTy = last(when(col("event_type").isin("view", "click"),
          col("event_type")), ignoreNulls = true).over(w)
        Tables.events(s, d)
          .withColumn("ch_ts", chTs).withColumn("ch_ty", chTy)
          .filter(col("event_type") === "purchase")
          .withColumn("gap_s",
            unix_timestamp(col("ts")) - unix_timestamp(col("ch_ts")))
          .withColumn("channel",
            when(col("ch_ts").isNotNull && col("gap_s") <= 86400L,
              col("ch_ty")).otherwise(lit("none")))
          .groupBy(col("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            (sum(when(col("channel") =!= "none", col("gap_s")))
              .cast("double") /
              (count(when(col("channel") =!= "none", lit(1))) * 60))
              .cast("float").as("avg_gap_min"))
          .orderBy(col("channel"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    last_value(CASE WHEN event_type IN ('view', 'click')
             |      THEN ts END IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS ch_ts,
             |    last_value(CASE WHEN event_type IN ('view', 'click')
             |      THEN event_type END IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS ch_ty
             |  FROM events),
             |p AS (
             |  SELECT CASE WHEN ch_ts IS NOT NULL
             |      AND floor(epoch(ts)) - floor(epoch(ch_ts)) <= 86400
             |    THEN ch_ty ELSE 'none' END AS channel,
             |    floor(epoch(ts)) - floor(epoch(ch_ts)) AS gap_s
             |  FROM e WHERE event_type = 'purchase')
             |SELECT channel, count(*) AS n_purchases,
             |  CAST(sum(CASE WHEN channel <> 'none' THEN gap_s END)::DOUBLE
             |    / (count(CASE WHEN channel <> 'none' THEN 1 END) * 60)
             |    AS REAL) AS avg_gap_min
             |FROM p GROUP BY channel ORDER BY channel""".stripMargin)),

    // Burst detection as gaps-and-islands: flag hours whose event count
    // exceeds 1.2× the type's hourly mean, then group CONSECUTIVE flagged
    // hours into bursts with the row_number-difference trick (an island's
    // hour-index minus its flagged-rank is constant). Reports each burst's
    // span and volume — the run-length upgrade of the pointwise detectors
    // (q171 CUSUM, q182 MAD). Windows partition by type; integer
    // arithmetic end to end, so islands are bit-stable.
    Entry("q185_burst_islands",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("c"))
        val mean = hourly.groupBy(col("event_type"))
          .agg((sum(col("c")) / count(lit(1))).as("mu"))
        val flagged = hourly.join(broadcast(mean), "event_type")
          .filter(col("c") > lit(1.2) * col("mu"))
          .withColumn("hidx",
            (unix_timestamp(col("hr")) / 3600).cast("long"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("hidx"))
        flagged
          .withColumn("grp", col("hidx") - row_number().over(w))
          .groupBy(col("event_type"), col("grp"))
          .agg(min(col("hr")).as("burst_start"),
            max(col("hr")).as("burst_end"),
            count(lit(1)).as("n_hours"), sum(col("c")).as("events"))
          .filter(col("n_hours") >= 2) // a lone hot hour is noise, not a burst
          .select(col("event_type"), col("burst_start"), col("burst_end"),
            col("n_hours"), col("events"))
          .orderBy(col("event_type"), col("burst_start"))
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |mean AS (
             |  SELECT event_type, sum(c) / count(*) AS mu
             |  FROM hourly GROUP BY 1),
             |flagged AS (
             |  SELECT h.event_type, h.hr, h.c,
             |    floor(epoch(h.hr)) // 3600 AS hidx
             |  FROM hourly h JOIN mean m USING (event_type)
             |  WHERE h.c > 1.2 * m.mu),
             |isl AS (
             |  SELECT event_type, hr, c,
             |    hidx - row_number() OVER (PARTITION BY event_type
             |      ORDER BY hidx) AS grp
             |  FROM flagged)
             |SELECT event_type, min(hr) AS burst_start, max(hr) AS burst_end,
             |  count(*) AS n_hours, CAST(sum(c) AS BIGINT) AS events
             |FROM isl GROUP BY event_type, grp
             |HAVING count(*) >= 2
             |ORDER BY event_type, burst_start""".stripMargin)),

    // Coverage growth curve: per day, how many (user, event_type) combos
    // appear for the FIRST time, plus the cumulative count — the
    // "is the pipeline still discovering new behavior" monitor. The
    // distributed shape matters: first-seen = one min-aggregation per
    // combo (never a running distinct), cumulative = a 30-row window over
    // the DAILY rollup, not the event log.
    Entry("q186_coverage_growth",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val firstSeen = Tables.events(s, d)
          .groupBy(col("user_id"), col("event_type"))
          .agg(min(to_date(col("ts"))).as("first_day"))
        val daily = firstSeen.groupBy(col("first_day").as("day"))
          .agg(count(lit(1)).as("new_combos"))
        val w = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .withColumn("cumulative", sum(col("new_combos")).over(w))
          .orderBy(col("day"))
      },
      Some("""WITH fs AS (
             |  SELECT user_id, event_type, min(CAST(ts AS DATE)) AS first_day
             |  FROM events GROUP BY 1, 2),
             |daily AS (
             |  SELECT first_day AS day, count(*) AS new_combos
             |  FROM fs GROUP BY 1)
             |SELECT day, new_combos,
             |  CAST(sum(new_combos) OVER (ORDER BY day
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative
             |FROM daily ORDER BY day""".stripMargin)))
}
