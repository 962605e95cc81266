package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{GraphAnalytics, Pruning}

/** Breadth batch 3: graph-analytic and relational operators that round out
  * the engine beyond the reference's own surface —
  *
  *  - triangle counting and multi-source BFS (SURVEY §7.5's "batch graph
  *    analytics" capability, alongside CC and PageRank);
  *  - Bloom-filter runtime-pruned semi joins (the shuffle-reduction workhorse
  *    for 0.1%-selective fact⋈dim joins at 100 TB);
  *  - GROUPING SETS, PIVOT, null-aware NOT IN, and time-series gap-fill
  *    (Catalyst-native SQL breadth a reference user would expect from a
  *    general engine: subtotal reports, wide-format exports, 3VL-correct
  *    exclusion, dense calendars for downstream window math).
  */
object BreadthQueries {

  def entries: Seq[Entry] = Seq(

    // Per-vertex triangle counts over the part co-purchase graph (edge =
    // two parts appearing in the same order at least twice). Spark side
    // uses degree-ordered orientation (skew-proof wedge generation); the
    // oracle closes wedges by id order — identical triangle set either way.
    Entry("q80_triangle_counts",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        val edges = li.select(col("l_orderkey"), col("l_partkey").as("src"))
          .join(li.select(col("l_orderkey"), col("l_partkey").as("dst")), "l_orderkey")
          .filter(col("src") < col("dst"))
          .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n_co"))
          .filter(col("n_co") >= 2)
          .select(col("src"), col("dst"))
        GraphAnalytics.triangleCounts(edges).orderBy(col("id"))
      },
      Some("""WITH pairs AS (
             |  SELECT l1.l_partkey AS a, l2.l_partkey AS b
             |  FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
             |  WHERE l1.l_partkey < l2.l_partkey
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |tri AS (
             |  SELECT e1.a AS u, e1.b AS v, e2.b AS w
             |  FROM pairs e1
             |  JOIN pairs e2 ON e2.a = e1.a AND e2.b > e1.b
             |  JOIN pairs e3 ON e3.a = e1.b AND e3.b = e2.b)
             |SELECT id, count(*) AS triangles FROM (
             |  SELECT u AS id FROM tri
             |  UNION ALL SELECT v FROM tri
             |  UNION ALL SELECT w FROM tri)
             |GROUP BY id ORDER BY id""".stripMargin)),

    // Multi-source BFS shortest paths over a deterministic functional graph
    // on customer keys (k -> 2k mod m, k -> k+7 mod m); the oracle is a
    // recursive CTE taking min(dist) over all enumerated reaches — BFS
    // first-visit depth equals that min by definition.
    Entry("q81_bfs_distances",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val m = cust.agg(max(col("c_custkey"))).head.getLong(0) + 1
        val c = cust.select(col("c_custkey"))
        val edges = c.select(col("c_custkey").as("src"),
            ((col("c_custkey") * 2) % m).as("dst"))
          .union(c.select(col("c_custkey").as("src"),
            ((col("c_custkey") + 7) % m).as("dst")))
        val sources = s.range(1).select(lit(0L).as("id"))
        GraphAnalytics.bfsDistances(edges, sources, maxDepth = 12)
          .orderBy(col("id"))
      },
      Some("""WITH RECURSIVE edges AS (
             |  SELECT c_custkey AS src,
             |    (c_custkey * 2) % (SELECT max(c_custkey) + 1 FROM customer) AS dst
             |  FROM customer
             |  UNION ALL
             |  SELECT c_custkey,
             |    (c_custkey + 7) % (SELECT max(c_custkey) + 1 FROM customer)
             |  FROM customer),
             |bfs(id, dist) AS (
             |  SELECT CAST(0 AS BIGINT) AS id, 0 AS dist
             |  UNION
             |  SELECT e.dst, b.dist + 1
             |  FROM bfs b JOIN edges e ON e.src = b.id WHERE b.dist < 12)
             |SELECT id, min(dist) AS dist FROM bfs GROUP BY id ORDER BY id""".stripMargin)),

    // Bloom-prefiltered semi join: the ~1 MiB dim-key sketch kills
    // non-matching fact rows at map side before the exact semi join —
    // result provably identical to the plain semi join (false positives
    // re-checked, false negatives impossible).
    Entry("q82_bloom_semi",
      (s, d) => {
        val dim = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 300000)
        Pruning.bloomSemiJoin(Tables.lineitem(s, d), "l_orderkey",
            dim, "o_orderkey", expectedItems = 100000L)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem WHERE l_orderkey IN (
             |  SELECT o_orderkey FROM orders
             |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000)
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Explicit GROUPING SETS (the subtotal shapes between q53's ROLLUP and
    // q59's CUBE) — one Expand, one aggregation.
    Entry("q83_grouping_sets",
      (s, d) => {
        Tables.events(s, d)
          .withColumn("day", dayofmonth(col("ts")))
          .filter(col("day") <= 4)
          .createOrReplaceTempView("ev_gs")
        s.sql("""SELECT event_type, day, count(*) AS n, round(sum(value), 2) AS sum_value
                |FROM ev_gs
                |GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
                |ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT event_type, day, count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM (SELECT event_type,
             |        CAST(date_part('day', CAST(ts AS TIMESTAMP)) AS INT) AS day, value
             |      FROM events)
             |WHERE day <= 4
             |GROUP BY GROUPING SETS ((event_type), (day), (event_type, day))
             |ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST""".stripMargin)),

    // PIVOT to wide format with an explicit value list (no extra
    // distinct-values pass) — one aggregation, conditional sums.
    Entry("q84_pivot",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(round(sum(col("o_totalprice")), 2))
        .withColumnRenamed("1-URGENT", "p_urgent")
        .withColumnRenamed("2-HIGH", "p_high")
        .withColumnRenamed("3-MEDIUM", "p_medium")
        .withColumnRenamed("4-NOT SPECIFIED", "p_notspec")
        .withColumnRenamed("5-LOW", "p_low")
        .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
             |  round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS p_urgent,
             |  round(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END), 2) AS p_high,
             |  round(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END), 2) AS p_medium,
             |  round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END), 2) AS p_notspec,
             |  round(sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2) AS p_low
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Null-aware NOT IN (3VL): outer rows with a NULL key can never satisfy
    // NOT IN — Catalyst plans a null-aware anti join, not a plain anti join.
    Entry("q85_not_in",
      (s, d) => {
        Tables.customer(s, d)
          .select(when(col("c_custkey") % 97 === 0, lit(null))
            .otherwise(col("c_custkey")).as("k"), col("c_name"))
          .createOrReplaceTempView("cust_nullable")
        Tables.orders(s, d).createOrReplaceTempView("orders_ni")
        s.sql("""SELECT k, c_name FROM cust_nullable
                |WHERE k NOT IN (
                |  SELECT o_custkey FROM orders_ni WHERE o_totalprice > 400000)
                |ORDER BY k""".stripMargin)
      },
      Some("""SELECT k, c_name FROM (
             |  SELECT CASE WHEN c_custkey % 97 = 0 THEN NULL ELSE c_custkey END AS k,
             |         c_name
             |  FROM customer)
             |WHERE k NOT IN (
             |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
             |ORDER BY k""".stripMargin)),

    // Time-series gap-fill: dense (event_type × day) calendar from the
    // observed bounds, sparse daily aggregates joined in, missing days
    // emitted as zero — the step that makes window math (moving averages,
    // lag deltas) correct on sparse series.
    Entry("q86_gapfill",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
        val daily = ev.filter(col("value") > 280)
          .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
        val days = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        ev.select(col("event_type")).distinct()
          .crossJoin(days)
          .join(daily, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("n"), lit(0L)).as("n"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
             |  FROM events),
             |daily AS (
             |  SELECT event_type, day, count(*) AS n FROM ev
             |  WHERE value > 280 GROUP BY 1, 2),
             |days AS (
             |  SELECT CAST(unnest(generate_series(CAST(min(day) AS TIMESTAMP),
             |    CAST(max(day) AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM ev)
             |SELECT t.event_type, days.day, coalesce(daily.n, 0) AS n
             |FROM (SELECT DISTINCT event_type FROM ev) t
             |CROSS JOIN days
             |LEFT JOIN daily ON daily.event_type = t.event_type AND daily.day = days.day
             |ORDER BY t.event_type, days.day""".stripMargin)))
}
