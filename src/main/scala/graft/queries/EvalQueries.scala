package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-4 eval-infrastructure completion: threshold curves, count-class
  * smoothing, decile gains — the remaining classifier/LM evaluation
  * surfaces beyond the scalar metrics (q263 AUC, q217 kappa, q201 NDCG).
  * Every entry is DuckDB-oracle-checked.
  */
object EvalQueries {

  def entries: Seq[Entry] = Seq(

    // Precision/recall curve: P and R of "volume predicts elevated error
    // share" at a threshold grid — the curve behind q263's single AUC
    // number. One per-user agg, then one 5-row broadcast grid expansion
    // with conditional sums (no per-threshold rescan). All-integer counts,
    // single divisions.
    Entry("q272_pr_curve",
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("score"),
            (sum(when(col("event_type") === "error", 1L).otherwise(0L)) * 5 >
              count(lit(1))).as("pos"))
          .localCheckpoint(true)
        // thresholds from score QUANTILES, not absolute counts — the grid
        // stays meaningful at any scale factor and never flags zero rows
        val grid = users
          .agg(expr("percentile(score, array(0.1, 0.3, 0.5, 0.7, 0.9))")
            .as("ths"))
          .select(posexplode(col("ths")).as(Seq("i", "threshold")))
          .select((col("i") + 1).cast("int").as("grid_pt"), col("threshold"))
        users.crossJoin(broadcast(grid))
          .groupBy(col("grid_pt"), col("threshold"))
          .agg(
            sum(when(col("score") >= col("threshold"), 1L).otherwise(0L))
              .as("n_flagged"),
            sum(when(col("score") >= col("threshold") && col("pos"), 1L)
              .otherwise(0L)).as("n_tp"),
            sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
          .select(col("grid_pt"), col("threshold"), col("n_flagged"),
            col("n_tp"),
            (col("n_tp") / col("n_flagged")).as("precision"),
            (col("n_tp") / col("n_pos")).as("recall"))
          .orderBy(col("grid_pt"))
      },
      Some("""WITH users AS (
             |  SELECT count(*) AS score,
             |    5 * count(CASE WHEN event_type = 'error' THEN 1 END)
             |      > count(*) AS pos
             |  FROM events GROUP BY user_id),
             |grid AS (
             |  SELECT CAST(i AS INT) AS grid_pt, th AS threshold FROM (
             |    SELECT unnest(quantile_cont(score,
             |        [0.1, 0.3, 0.5, 0.7, 0.9])) AS th,
             |      unnest(generate_series(1, 5)) AS i
             |    FROM users))
             |SELECT grid_pt, threshold,
             |  CAST(sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_flagged,
             |  CAST(sum(CASE WHEN score >= threshold AND pos THEN 1 ELSE 0
             |    END) AS BIGINT) AS n_tp,
             |  sum(CASE WHEN score >= threshold AND pos THEN 1 ELSE 0 END)
             |    ::DOUBLE
             |    / sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END)
             |    AS precision,
             |  sum(CASE WHEN score >= threshold AND pos THEN 1 ELSE 0 END)
             |    ::DOUBLE / sum(CASE WHEN pos THEN 1 ELSE 0 END) AS recall
             |FROM users CROSS JOIN grid
             |GROUP BY grid_pt, threshold ORDER BY grid_pt""".stripMargin)),

    // Good–Turing count-class smoothing: the count-of-counts table N_r
    // and the discounted estimate r* = (r+1)·N_{r+1}/N_r for the low
    // count classes — how an n-gram LM reserves mass for unseen events
    // (the missing-mass estimate N_1/N is the first row's headline). The
    // table is |count classes|-sized; corpus touched once. Exact
    // rationals. N_{r+1} comes from a SELF-JOIN on r+1 (coalesced to 0
    // when the class is empty), NOT lead() over the present classes —
    // lead returns N at the next PRESENT r, so a gap (say r=4 empty,
    // r=6 present) would silently feed r* the wrong numerator.
    Entry("q273_good_turing",
      (s, d) => {
        import graft.functions.Fns
        // 3-shingle "events", not unigrams — the 31-word vocabulary has no
        // low count classes, shingles populate r = 1..5 at every SF
        val counts = Tables.documents(s, d)
          .select(explode(Fns.shingles(Fns.tokens(col("text")), 3)).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("r"))
        val nr = counts.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
        val nextClass = nr.select((col("r") - 1).as("r"),
          col("n_r").as("n_r_next"))
        val tot = nr.agg(sum(col("r") * col("n_r")).as("n_total"))
        nr
          .join(nextClass, Seq("r"), "left")
          .crossJoin(broadcast(tot))
          .filter(col("r") <= 5)
          .select(col("r"), col("n_r"),
            ((col("r") + 1) * coalesce(col("n_r_next"), lit(0L)) /
              col("n_r")).as("r_star"),
            (col("r") * col("n_r") / col("n_total")).as("class_mass"))
          .orderBy(col("r"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS t
             |  FROM documents),
             |counts AS (
             |  SELECT w, count(*) AS r FROM (
             |    SELECT doc_id,
             |      unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
             |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS w
             |    FROM toks)
             |  GROUP BY w),
             |nr AS (SELECT r, count(*) AS n_r FROM counts GROUP BY r),
             |tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS n_total FROM nr)
             |SELECT a.r, a.n_r,
             |  (a.r + 1) * coalesce(b.n_r, 0)::DOUBLE / a.n_r AS r_star,
             |  a.r * a.n_r::DOUBLE / n_total AS class_mass
             |FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
             |CROSS JOIN tot
             |WHERE a.r <= 5 ORDER BY a.r""".stripMargin)),

    // Decile gains table: rank users by score, split into deciles, report
    // per-decile capture and CUMULATIVE capture of positives vs the
    // random baseline (lift) — the targeting readout ("the top 20% of the
    // list holds X% of the positives"). The user relation is corpus-sized,
    // so the decile cut is the two-pass BSP ranker (PrefixSum.globalNtile)
    // over the exact integer score with the id tie-break — bit-identical
    // to ANSI ntile, no single-task global sort; the remaining cumulative
    // windows run over the 10-row decile relation.
    Entry("q274_gains_table",
      (s, d) => {
        import graft.ops.PrefixSum
        val users = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("score"),
            (sum(when(col("event_type") === "error", 1L).otherwise(0L)) * 5 >
              count(lit(1))).as("pos"))
        val deciled = PrefixSum.globalNtile(users, 10,
          Seq(desc("score"), col("user_id")), "decile")
        val wCum = Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        deciled.groupBy(col("decile"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
          .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
          .withColumn("cum_n", sum(col("n")).over(wCum))
          .withColumn("tot_pos", sum(col("n_pos")).over(wAll))
          .withColumn("tot_n", sum(col("n")).over(wAll))
          .select(col("decile"), col("n"), col("n_pos"),
            (col("cum_pos") / col("tot_pos")).as("cum_capture"),
            ((col("cum_pos") / col("tot_pos")) /
              (col("cum_n") / col("tot_n"))).as("cum_lift"))
          .orderBy(col("decile"))
      },
      Some("""WITH users AS (
             |  SELECT user_id, count(*) AS score,
             |    5 * count(CASE WHEN event_type = 'error' THEN 1 END)
             |      > count(*) AS pos
             |  FROM events GROUP BY user_id),
             |deciled AS (
             |  SELECT *, ntile(10) OVER (ORDER BY score DESC, user_id)
             |      AS decile
             |  FROM users),
             |agg AS (
             |  SELECT decile, count(*) AS n,
             |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_pos
             |  FROM deciled GROUP BY decile),
             |c AS (
             |  SELECT *,
             |    CAST(sum(n_pos) OVER (ORDER BY decile
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum_pos,
             |    CAST(sum(n) OVER (ORDER BY decile
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum_n,
             |    CAST(sum(n_pos) OVER () AS BIGINT) AS tot_pos,
             |    CAST(sum(n) OVER () AS BIGINT) AS tot_n
             |  FROM agg)
             |SELECT decile, n, n_pos,
             |  cum_pos::DOUBLE / tot_pos AS cum_capture,
             |  (cum_pos::DOUBLE / tot_pos) / (cum_n::DOUBLE / tot_n)
             |    AS cum_lift
             |FROM c ORDER BY decile""".stripMargin)),

    // User-journey similarity: users whose first-12-event journey strings
    // (event-type initials in time order) are within edit distance 3 —
    // cohort discovery / bot-ring detection over SEQUENCES rather than
    // sets. Journeys are deterministic (sorted-struct fold, never bare
    // collect_list); the pair join is BLOCKED on the journey's 3-char
    // prefix, and the lev ≤ 3 predicate takes the q31 length-guard
    // rewrite — never users² DP evaluations.
    Entry("q275_journey_similarity",
      (s, d) => {
        graft.GraftExtensions.armOptimizations(s)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val journeys = Tables.events(s, d)
          .select(col("user_id"),
            substring(col("event_type"), 1, 1).as("c"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 12)
          .groupBy(col("user_id"))
          .agg(concat_ws("", transform(
            array_sort(collect_list(struct(col("rn"), col("c")))),
            p => p.getField("c"))).as("journey"))
          .filter(length(col("journey")) === 12)
          .localCheckpoint(true)
        val a = journeys.select(col("user_id").as("u_a"),
          col("journey").as("j_a"),
          substring(col("journey"), 1, 3).as("blk"))
        val b = journeys.select(col("user_id").as("u_b"),
          col("journey").as("j_b"),
          substring(col("journey"), 1, 3).as("blk"))
        a.join(b, Seq("blk"))
          .filter(col("u_a") < col("u_b"))
          .withColumn("lev", levenshtein(col("j_a"), col("j_b")).cast("long"))
          .filter(col("lev") <= 3)
          .select(col("u_a"), col("u_b"), col("lev"))
          .orderBy(col("lev"), col("u_a"), col("u_b"))
          .limit(50)
      },
      Some("""WITH seq AS (
             |  SELECT user_id, substr(event_type, 1, 1) AS c,
             |    row_number() OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events),
             |j AS (
             |  SELECT user_id, string_agg(c, '' ORDER BY rn) AS journey
             |  FROM seq WHERE rn <= 12 GROUP BY user_id
             |  HAVING length(string_agg(c, '' ORDER BY rn)) = 12)
             |SELECT a.user_id AS u_a, b.user_id AS u_b,
             |  CAST(levenshtein(a.journey, b.journey) AS BIGINT) AS lev
             |FROM j a JOIN j b
             |  ON substr(a.journey, 1, 3) = substr(b.journey, 1, 3)
             | AND a.user_id < b.user_id
             |WHERE levenshtein(a.journey, b.journey) <= 3
             |ORDER BY lev, u_a, u_b LIMIT 50""".stripMargin)),

    // Burstiness (Fano factor) per event type: variance-to-mean ratio of
    // hourly arrival counts — F ≈ 1 is Poisson, F ≫ 1 is bursty (retry
    // storms, bots), F < 1 is rate-limited. The hourly relation is
    // DENSIFIED against the global hour range (type × hour grid, absent
    // hours = 0 arrivals) — grouping only observed hours would drop the
    // zero-count hours, biasing the mean up and F down for sparse types
    // and breaking the "F ≈ 1 is Poisson" readout. Variance from exact
    // integer power sums (Σx, Σx²), so everything up to the two final
    // divisions is exact — no variance-of-doubles drift.
    Entry("q276_fano_burstiness",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        val hourly = ev.groupBy(col("event_type"), col("h"))
          .agg(count(lit(1)).as("x"))
        // global hour domain, in-plan (broadcast grid: |types| × |hours|,
        // bounded by the time range at any corpus size)
        val hours = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
          .select(explode(sequence(col("h0"), col("h1"),
            expr("interval 1 hour"))).as("h"))
        val dense = ev.select(col("event_type")).distinct()
          .crossJoin(hours)
          .join(hourly, Seq("event_type", "h"), "left")
          .withColumn("x", coalesce(col("x"), lit(0L)))
        dense.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"),
            sum(col("x")).as("s1"),
            sum(col("x") * col("x")).as("s2"))
          .filter(col("n_hours") > 1)
          .select(col("event_type"), col("n_hours"),
            (col("s1") / col("n_hours")).as("mean_per_hour"),
            (((col("s2") - col("s1") * col("s1") / col("n_hours").cast("double")) /
              (col("n_hours") - 1)) /
              (col("s1") / col("n_hours"))).as("fano"))
          .orderBy(col("event_type"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type, date_trunc('hour', ts) AS h FROM events),
             |hourly AS (
             |  SELECT event_type, h, count(*) AS x FROM ev GROUP BY 1, 2),
             |hours AS (
             |  SELECT unnest(generate_series(min(h), max(h),
             |    INTERVAL 1 HOUR)) AS h
             |  FROM ev),
             |dense AS (
             |  SELECT t.event_type, hr.h, coalesce(hourly.x, 0) AS x
             |  FROM (SELECT DISTINCT event_type FROM ev) t
             |  CROSS JOIN hours hr
             |  LEFT JOIN hourly ON hourly.event_type = t.event_type
             |    AND hourly.h = hr.h),
             |agg AS (
             |  SELECT event_type, count(*) AS n_hours,
             |    CAST(sum(x) AS BIGINT) AS s1,
             |    CAST(sum(x * x) AS BIGINT) AS s2
             |  FROM dense GROUP BY 1)
             |SELECT event_type, n_hours,
             |  s1::DOUBLE / n_hours AS mean_per_hour,
             |  ((s2 - s1 * s1 / n_hours::DOUBLE) / (n_hours - 1))
             |    / (s1::DOUBLE / n_hours) AS fano
             |FROM agg WHERE n_hours > 1 ORDER BY event_type""".stripMargin)),

    // Inter-event dwell-time percentiles per transition: exact p50/p90 of
    // the gap (seconds) between consecutive events for the 10 most common
    // (prev → next) transitions — the empirical basis for session-gap
    // (q37) and state-timeout choices, where q238 calibrates the
    // watermark. One lag window, one percentile agg per transition.
    Entry("q277_dwell_percentiles",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        val gaps = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("ts_us"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .select(col("prev_type"), col("event_type").as("next_type"),
            ((col("ts_us") - col("prev_us")) / 1000000.0).as("gap_s"))
        gaps.groupBy(col("prev_type"), col("next_type"))
          .agg(count(lit(1)).as("n"),
            round(expr("percentile(gap_s, 0.5)"), 3).as("p50_s"),
            round(expr("percentile(gap_s, 0.9)"), 3).as("p90_s"))
          .orderBy(desc("n"), col("prev_type"), col("next_type"))
          .limit(10)
      },
      Some("""WITH seq AS (
             |  SELECT user_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             |    lag(event_type) OVER w AS prev_type,
             |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS prev_us
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |gaps AS (
             |  SELECT prev_type, event_type AS next_type,
             |    (ts_us - prev_us) / 1000000.0 AS gap_s
             |  FROM seq WHERE prev_type IS NOT NULL)
             |SELECT prev_type, next_type, count(*) AS n,
             |  round(quantile_cont(gap_s, 0.5), 3) AS p50_s,
             |  round(quantile_cont(gap_s, 0.9), 3) AS p90_s
             |FROM gaps GROUP BY 1, 2
             |ORDER BY n DESC, prev_type, next_type LIMIT 10""".stripMargin)),

    // Lorenz concentration curve: cumulative share of total events held
    // by the bottom-p fraction of users, at decile points — the curve
    // behind q237's Gini scalar ("the top 10% of keys hold X% of the
    // rows" readout that sizes skew mitigations). The decile cut over the
    // corpus-sized user relation is the two-pass BSP ranker
    // (PrefixSum.globalNtile) on exact integer activity — bit-identical
    // to ANSI ntile, no single-task global sort; shares are exact single
    // divisions over the 10-row decile relation.
    Entry("q278_lorenz_curve",
      (s, d) => {
        import graft.ops.PrefixSum
        val users = Tables.events(s, d)
          .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
        val deciled = PrefixSum.globalNtile(users, 10,
          Seq(col("x"), col("user_id")), "decile")
        val wCum = Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        deciled.groupBy(col("decile"))
          .agg(count(lit(1)).as("n_users"), sum(col("x")).as("rows_held"))
          .withColumn("cum_rows", sum(col("rows_held")).over(wCum))
          .withColumn("tot_rows", sum(col("rows_held")).over(wAll))
          .withColumn("cum_users", sum(col("n_users")).over(wCum))
          .withColumn("tot_users", sum(col("n_users")).over(wAll))
          .select(col("decile"), col("n_users"), col("rows_held"),
            (col("cum_users") / col("tot_users")).as("pop_share"),
            (col("cum_rows") / col("tot_rows")).as("row_share"))
          .orderBy(col("decile"))
      },
      Some("""WITH users AS (
             |  SELECT user_id, count(*) AS x FROM events GROUP BY user_id),
             |deciled AS (
             |  SELECT *, ntile(10) OVER (ORDER BY x, user_id) AS decile
             |  FROM users),
             |agg AS (
             |  SELECT decile, count(*) AS n_users,
             |    CAST(sum(x) AS BIGINT) AS rows_held
             |  FROM deciled GROUP BY decile),
             |c AS (
             |  SELECT *,
             |    CAST(sum(rows_held) OVER (ORDER BY decile
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum_rows,
             |    CAST(sum(rows_held) OVER () AS BIGINT) AS tot_rows,
             |    CAST(sum(n_users) OVER (ORDER BY decile
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum_users,
             |    CAST(sum(n_users) OVER () AS BIGINT) AS tot_users
             |  FROM agg)
             |SELECT decile, n_users, rows_held,
             |  cum_users::DOUBLE / tot_users AS pop_share,
             |  cum_rows::DOUBLE / tot_rows AS row_share
             |FROM c ORDER BY decile""".stripMargin)),

    // Hill tail-index estimator over the top-200 order values: α =
    // 1 / mean(ln(x_i / x_k)) — is the revenue distribution power-law
    // heavy (α < 2: variance undefined, whales dominate; mitigations like
    // q256's winsorizing become mandatory)? Top-k via the bounded top-k
    // heap; ln-derived output emits float32.
    Entry("q279_hill_tail",
      (s, d) => {
        val k = 200
        val top = Tables.orders(s, d)
          .select(col("o_totalprice"), col("o_orderkey"))
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
          .limit(k + 1)
          .localCheckpoint(true) // feeds the cutoff scalar and the mean
        val cutoff = top.agg(min(col("o_totalprice")).as("x_k"))
        top.crossJoin(broadcast(cutoff))
          .filter(col("o_totalprice") > col("x_k"))
          .agg(count(lit(1)).as("n_tail"),
            (lit(1.0) / avg(log(col("o_totalprice") / col("x_k"))))
              .cast("float").as("hill_alpha"),
            max(col("o_totalprice")).as("x_max"),
            min(col("x_k")).as("x_k"))
      },
      Some("""WITH top AS (
             |  SELECT o_totalprice FROM orders
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 201),
             |cutoff AS (SELECT min(o_totalprice) AS x_k FROM top)
             |SELECT count(*) AS n_tail,
             |  CAST(1.0 / avg(ln(o_totalprice / x_k)) AS REAL) AS hill_alpha,
             |  max(o_totalprice) AS x_max, min(x_k) AS x_k
             |FROM top CROSS JOIN cutoff
             |WHERE o_totalprice > x_k""".stripMargin))
  )
}
