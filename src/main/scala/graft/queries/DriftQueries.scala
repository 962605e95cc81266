package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns
import graft.ops.PrefixSum

/** Round-5 set: the statistical-testing suite a training-data pipeline
  * runs between corpus snapshots — distribution drift (KS, Mann–Whitney,
  * χ²/Cramér's V, Jensen–Shannon), multiple-testing control (Benjamini–
  * Hochberg), a deterministic permutation test, and the generation-quality
  * diagnostics (n-gram novelty, distinct-n diversity). Every ranked or
  * cumulative step over a corpus-growing relation runs through the
  * two-pass BSP prefix primitives (ops/PrefixSum.scala) — no single-task
  * global sorts. Every entry is DuckDB-oracle-checked; transcendental
  * outputs (ln/exp) emit float32 per the repo-wide discipline, while
  * division/sqrt chains over exact integers emit full doubles (IEEE ops
  * on identical inputs are bit-identical across engines).
  *
  * The a/b population split used throughout is the source-name length
  * (src0–src9 vs src10–src19) for documents and an md5-parity user split
  * for events — deterministic, engine-portable (md5 is bit-identical
  * everywhere; no engine-specific hash enters an oracle-compared value).
  */
object DriftQueries {

  def entries: Seq[Entry] = Seq(

    // Two-sample Kolmogorov–Smirnov over the document-length distribution
    // of corpus halves: D = max |F_a(x) − F_b(x)| over the observed
    // support — the standard drift gate between corpus snapshots. Both
    // ECDFs are exact cumulative counts via the two-pass BSP prefix sum
    // over the (corpus-growing) distinct-value relation; D is a max of
    // single divisions of exact integers — bit-identical across engines.
    Entry("q280_ks_test",
      (s, d) => {
        val side = when(length(col("source")) === 4, lit("a")).otherwise(lit("b"))
        val g = Tables.documents(s, d)
          .select(col("n_chars"), side.as("side"))
          .groupBy(col("n_chars"))
          .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("ca"),
            sum(when(col("side") === "b", 1L).otherwise(0L)).as("cb"))
        val cum = PrefixSum.globalRunningSum(
          PrefixSum.globalRunningSum(g, Seq(col("n_chars")),
              col("ca").cast("decimal(20,0)"))
            .withColumnRenamed("running", "cum_a"),
          Seq(col("n_chars")), col("cb").cast("decimal(20,0)"))
          .withColumnRenamed("running", "cum_b")
        val tot = g.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
        cum.crossJoin(broadcast(tot))
          .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
            max(abs(col("cum_a").cast("double") / col("n_a") -
              col("cum_b").cast("double") / col("n_b"))).as("ks_d"))
      },
      Some("""WITH s AS (
             |  SELECT n_chars,
             |    CASE WHEN length(source) = 4 THEN 'a' ELSE 'b' END AS side
             |  FROM documents),
             |g AS (
             |  SELECT n_chars,
             |    CAST(sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM s GROUP BY 1),
             |c AS (
             |  SELECT
             |    CAST(sum(ca) OVER (ORDER BY n_chars) AS BIGINT) AS cum_a,
             |    CAST(sum(cb) OVER (ORDER BY n_chars) AS BIGINT) AS cum_b
             |  FROM g),
             |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
             |             CAST(sum(cb) AS BIGINT) AS n_b FROM g)
             |SELECT max(t.n_a) AS n_a, max(t.n_b) AS n_b,
             |  max(abs(c.cum_a::DOUBLE / t.n_a - c.cum_b::DOUBLE / t.n_b))
             |    AS ks_d
             |FROM c CROSS JOIN t""".stripMargin)),

    // Mann–Whitney U (Wilcoxon rank-sum) with midrank tie handling and the
    // tie-corrected normal approximation — the nonparametric location test
    // for "did the new crawl shift document lengths?". All rank machinery
    // is integer-exact WITHOUT materializing per-row ranks: 2·R_a =
    // Σ_v ca_v·(2·cumBefore_v + ct_v + 1) over the distinct-value relation,
    // whose cumulative runs through the BSP prefix sum. The z chain is
    // division/sqrt over exact integers — full-double emit.
    Entry("q281_mann_whitney",
      (s, d) => {
        val side = when(length(col("source")) === 4, lit("a")).otherwise(lit("b"))
        val g = Tables.documents(s, d)
          .select(col("n_chars"), side.as("side"))
          .groupBy(col("n_chars"))
          .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("ca"),
            sum(when(col("side") === "b", 1L).otherwise(0L)).as("cb"))
          .withColumn("ct", col("ca") + col("cb"))
        val cum = PrefixSum.globalRunningSum(g, Seq(col("n_chars")),
            col("ct").cast("decimal(20,0)"))
          .withColumn("cum", col("running").cast("long")).drop("running")
        val a = cum.agg(
          sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
          sum(col("ca") * (lit(2L) * (col("cum") - col("ct")) + col("ct") + 1L))
            .as("two_ra"),
          sum(col("ct") * col("ct") * col("ct") - col("ct")).as("tie_sum"))
        val uA = (col("two_ra").cast("double") -
          col("na").cast("double") * (col("na") + lit(1L))) / lit(2.0)
        val nD = (col("na") + col("nb")).cast("double")
        val sigma = sqrt(col("na").cast("double") * col("nb") / lit(12.0) *
          ((col("na") + col("nb") + lit(1L)).cast("double") -
            col("tie_sum").cast("double") / (nD * (col("na") + col("nb") - lit(1L)))))
        a.select(col("na").as("n_a"), col("nb").as("n_b"),
          uA.as("u_a"),
          ((uA - col("na").cast("double") * col("nb") / lit(2.0)) / sigma).as("z"))
      },
      Some("""WITH s AS (
             |  SELECT n_chars,
             |    CASE WHEN length(source) = 4 THEN 'a' ELSE 'b' END AS side
             |  FROM documents),
             |g AS (
             |  SELECT n_chars,
             |    CAST(sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb,
             |    CAST(count(*) AS BIGINT) AS ct
             |  FROM s GROUP BY 1),
             |c AS (
             |  SELECT *, CAST(sum(ct) OVER (ORDER BY n_chars) AS BIGINT) AS cum
             |  FROM g),
             |a AS (
             |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
             |    CAST(sum(ca * (2 * (cum - ct) + ct + 1)) AS BIGINT) AS two_ra,
             |    CAST(sum(ct * ct * ct - ct) AS BIGINT) AS tie_sum
             |  FROM c)
             |SELECT na AS n_a, nb AS n_b,
             |  (two_ra::DOUBLE - na::DOUBLE * (na + 1)) / 2.0 AS u_a,
             |  ((two_ra::DOUBLE - na::DOUBLE * (na + 1)) / 2.0
             |      - na::DOUBLE * nb / 2.0)
             |    / sqrt(na::DOUBLE * nb / 12.0 *
             |        ((na + nb + 1)::DOUBLE
             |          - tie_sum::DOUBLE / ((na + nb)::DOUBLE * (na + nb - 1))))
             |    AS z
             |FROM a""".stripMargin)),

    // χ² independence test of event_type × 6-hour daypart, with Cramér's V
    // effect size — "is traffic mix shifting across dayparts?". The
    // contingency grid is DENSIFIED (type × daypart cross join, absent
    // cells observed 0 — a zero cell still contributes its expectation).
    // Counts exact; each cell term is an exact-integer division, but χ²
    // SUMS those doubles — addition order is engine-dependent, so χ² and
    // the V derived from it emit float32 (one-ulp drift seen at sf0.001).
    Entry("q282_chi_squared",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), expr("hour(ts) div 6").as("daypart"))
        val obs = ev.groupBy(col("event_type"), col("daypart"))
          .agg(count(lit(1)).as("o"))
        val grid = ev.select(col("event_type")).distinct()
          .crossJoin(ev.select(col("daypart")).distinct())
          .join(obs, Seq("event_type", "daypart"), "left")
          .withColumn("o", coalesce(col("o"), lit(0L)))
        val rowT = grid.groupBy(col("event_type")).agg(sum(col("o")).as("rt"))
        val colT = grid.groupBy(col("daypart")).agg(sum(col("o")).as("ctt"))
        val nT = grid.agg(sum(col("o")).as("n"),
          countDistinct(col("event_type")).as("r"),
          countDistinct(col("daypart")).as("c"))
        val e = col("rt").cast("double") * col("ctt") / col("n")
        grid.join(broadcast(rowT), "event_type")
          .join(broadcast(colT), "daypart")
          .crossJoin(broadcast(nT))
          .agg(max(col("n")).as("n"), max(col("r")).as("r"),
            max(col("c")).as("c"),
            sum((col("o") - e) * (col("o") - e) / e).as("chi2"))
          .select(col("n"), col("r"), col("c"),
            ((col("r") - 1) * (col("c") - 1)).as("dof"),
            col("chi2").cast("float").as("chi2"),
            sqrt(col("chi2") / (col("n").cast("double") *
              least(col("r") - 1, col("c") - 1))).cast("float").as("cramers_v"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type, hour(ts) // 6 AS daypart FROM events),
             |obs AS (
             |  SELECT event_type, daypart, CAST(count(*) AS BIGINT) AS o
             |  FROM ev GROUP BY 1, 2),
             |grid AS (
             |  SELECT t.event_type, p.daypart, coalesce(obs.o, 0) AS o
             |  FROM (SELECT DISTINCT event_type FROM ev) t
             |  CROSS JOIN (SELECT DISTINCT daypart FROM ev) p
             |  LEFT JOIN obs ON obs.event_type = t.event_type
             |    AND obs.daypart = p.daypart),
             |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
             |       FROM grid GROUP BY 1),
             |ctt AS (SELECT daypart, CAST(sum(o) AS BIGINT) AS ctt
             |        FROM grid GROUP BY 1),
             |nt AS (SELECT CAST(sum(o) AS BIGINT) AS n,
             |  count(DISTINCT event_type) AS r, count(DISTINCT daypart) AS c
             |  FROM grid)
             |SELECT max(n) AS n, max(r) AS r, max(c) AS c,
             |  (max(r) - 1) * (max(c) - 1) AS dof,
             |  CAST(sum((g.o - rt.rt::DOUBLE * ctt.ctt / nt.n)
             |    * (g.o - rt.rt::DOUBLE * ctt.ctt / nt.n)
             |    / (rt.rt::DOUBLE * ctt.ctt / nt.n)) AS REAL) AS chi2,
             |  CAST(sqrt(sum((g.o - rt.rt::DOUBLE * ctt.ctt / nt.n)
             |    * (g.o - rt.rt::DOUBLE * ctt.ctt / nt.n)
             |    / (rt.rt::DOUBLE * ctt.ctt / nt.n))
             |    / (max(nt.n)::DOUBLE * least(max(r) - 1, max(c) - 1)))
             |    AS REAL) AS cramers_v
             |FROM grid g
             |JOIN rt USING (event_type) JOIN ctt USING (daypart)
             |CROSS JOIN nt""".stripMargin)),

    // Jensen–Shannon divergence between the token distributions of the two
    // corpus halves — the bounded (≤ ln 2), symmetric drift measure for
    // "did the vocabulary mix move?". One vocab-keyed count agg (map-side
    // combinable) and one broadcast of two scalars; ln enters the value,
    // so the JSD emits float32.
    Entry("q283_js_divergence",
      (s, d) => {
        val side = when(length(col("source")) === 4, lit("a")).otherwise(lit("b"))
        val cnt = Tables.documents(s, d)
          .select(side.as("side"), explode(Fns.tokens(col("text"))).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy(col("w"))
          .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("ca"),
            sum(when(col("side") === "b", 1L).otherwise(0L)).as("cb"))
        val tot = cnt.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
        val p = col("ca").cast("double") / col("n_a")
        val q = col("cb").cast("double") / col("n_b")
        val m = (p + q) / lit(2.0)
        cnt.crossJoin(broadcast(tot))
          .agg(count(lit(1)).as("vocab"),
            max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
            (lit(0.5) * sum(when(col("ca") > 0, p * log(p / m)).otherwise(0.0)) +
              lit(0.5) * sum(when(col("cb") > 0, q * log(q / m)).otherwise(0.0)))
              .cast("float").as("jsd"))
      },
      Some("""WITH s AS (
             |  SELECT CASE WHEN length(source) = 4 THEN 'a' ELSE 'b' END AS side,
             |    unnest(string_split(lower(text), ' ')) AS w
             |  FROM documents),
             |cnt AS (
             |  SELECT w,
             |    CAST(sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM s WHERE length(w) > 0 GROUP BY 1),
             |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
             |             CAST(sum(cb) AS BIGINT) AS n_b FROM cnt)
             |SELECT count(*) AS vocab, max(n_a) AS n_a, max(n_b) AS n_b,
             |  CAST(0.5 * sum(CASE WHEN ca > 0 THEN (ca::DOUBLE / n_a)
             |      * ln((ca::DOUBLE / n_a)
             |        / (((ca::DOUBLE / n_a) + (cb::DOUBLE / n_b)) / 2.0))
             |      ELSE 0.0 END)
             |    + 0.5 * sum(CASE WHEN cb > 0 THEN (cb::DOUBLE / n_b)
             |      * ln((cb::DOUBLE / n_b)
             |        / (((ca::DOUBLE / n_a) + (cb::DOUBLE / n_b)) / 2.0))
             |      ELSE 0.0 END) AS REAL) AS jsd
             |FROM cnt CROSS JOIN t""".stripMargin)),

    // Benjamini–Hochberg FDR control over a grid of Welch z-tests (arm =
    // md5-parity user split, one hypothesis per event_type × daypart cell):
    // rank p ascending, reject every rank ≤ max{i : p_(i) ≤ α·i/m}. The
    // corpus-sized work is ONE map-side-combinable agg (decimal power sums
    // per cell); the ranking window runs on the m-row hypothesis grid —
    // bounded by the design, not the corpus. The normal tail uses the
    // Abramowitz–Stegun 26.2.17 polynomial, written IDENTICALLY in both
    // engines; exp makes p float32, and BH compares that same float32 on
    // both sides, so the reject set can never straddle.
    Entry("q284_bh_fdr",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val arm = pmod(ascii(substring(md5(col("user_id").cast("string")), 1, 1)), lit(2))
        // decimal(12,6), NOT (20,6): v*v must fit (25,12) unclipped — at
        // (20,6) Spark's product would exceed precision 38 and CLIP the
        // scale to 9 while DuckDB keeps 12, a one-ulp z drift (seen at sf0.1)
        val cells = Tables.events(s, d)
          .select(col("event_type"), expr("hour(ts) div 6").as("daypart"),
            arm.as("arm"), col("value").cast("decimal(12,6)").as("v"))
          .groupBy(col("event_type"), col("daypart"))
          .agg(sum(when(col("arm") === 0, col("v"))).as("s0"),
            sum(when(col("arm") === 0, col("v") * col("v"))).as("q0"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("arm") === 1, col("v"))).as("s1"),
            sum(when(col("arm") === 1, col("v") * col("v"))).as("q1"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
          .filter(col("n0") > 1 && col("n1") > 1)
        def mv(sCol: String, qCol: String, nCol: String) = {
          val m = col(sCol).cast("double") / col(nCol)
          val v = (col(qCol).cast("double") -
            col(sCol).cast("double") * col(sCol).cast("double") / col(nCol)) /
            (col(nCol) - 1)
          (m, v)
        }
        val (m0, v0) = mv("s0", "q0", "n0")
        val (m1, v1) = mv("s1", "q1", "n1")
        val z = (m0 - m1) / sqrt(v0 / col("n0") + v1 / col("n1"))
        // the tail polynomial runs ALL-DOUBLE from the float32 z:
        // float-precision intermediates promote differently across
        // engines (Spark float*float=float, DuckDB REAL*lit=DOUBLE)
        val az = abs(col("z").cast("double"))
        val k = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
        val pnd = exp(-az * az / 2) * lit(0.3989422804014327) *
          (k * (lit(0.319381530) + k * (lit(-0.356563782) +
            k * (lit(1.781477937) + k * (lit(-1.821255978) +
              k * lit(1.330274429))))))
        val scored = cells
          .withColumn("z", z.cast("float"))
          .withColumn("p", (lit(2.0) * pnd).cast("float"))
          .withColumn("rank", row_number().over(
            Window.orderBy(col("p"), col("event_type"), col("daypart"))))
        val m = scored.agg(count(lit(1)).as("m")).head().getLong(0)
        val passed = col("p") <= col("rank").cast("double") * lit(0.05) / lit(m)
        val iMax = scored
          .agg(coalesce(max(when(passed, col("rank"))), lit(0)).as("i_max"))
        scored.crossJoin(broadcast(iMax))
          .select(col("event_type"), col("daypart"),
            col("n0").as("n_a"), col("n1").as("n_b"),
            col("z"), col("p"), col("rank"),
            (col("rank") <= col("i_max")).as("rejected"))
          .orderBy(col("rank"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type, hour(ts) // 6 AS daypart,
             |    ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 AS arm,
             |    CAST(value AS DECIMAL(12,6)) AS v
             |  FROM events),
             |cells AS (
             |  SELECT event_type, daypart,
             |    sum(CASE WHEN arm = 0 THEN v END) AS s0,
             |    sum(CASE WHEN arm = 0 THEN v * v END) AS q0,
             |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             |    sum(CASE WHEN arm = 1 THEN v END) AS s1,
             |    sum(CASE WHEN arm = 1 THEN v * v END) AS q1,
             |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
             |  FROM ev GROUP BY 1, 2
             |  HAVING sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) > 1
             |     AND sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) > 1),
             |zed AS (
             |  SELECT *,
             |    CAST((s0::DOUBLE / n0 - s1::DOUBLE / n1)
             |      / sqrt(((q0::DOUBLE - s0::DOUBLE * s0::DOUBLE / n0) / (n0 - 1)) / n0
             |           + ((q1::DOUBLE - s1::DOUBLE * s1::DOUBLE / n1) / (n1 - 1)) / n1)
             |      AS REAL) AS z
             |  FROM cells),
             |pp AS (
             |  SELECT *, CAST(2.0 * exp(-abs(z::DOUBLE) * abs(z::DOUBLE) / 2)
             |    * 0.3989422804014327
             |    * ((1.0 / (1.0 + 0.2316419 * abs(z::DOUBLE))) * (0.319381530
             |      + (1.0 / (1.0 + 0.2316419 * abs(z::DOUBLE))) * (-0.356563782
             |      + (1.0 / (1.0 + 0.2316419 * abs(z::DOUBLE))) * (1.781477937
             |      + (1.0 / (1.0 + 0.2316419 * abs(z::DOUBLE))) * (-1.821255978
             |      + (1.0 / (1.0 + 0.2316419 * abs(z::DOUBLE))) * 1.330274429)))))
             |    AS REAL) AS p
             |  FROM zed),
             |ranked AS (
             |  SELECT *, CAST(row_number() OVER
             |      (ORDER BY p, event_type, daypart) AS INT) AS rank,
             |    count(*) OVER () AS m
             |  FROM pp),
             |im AS (
             |  SELECT coalesce(max(CASE WHEN p <= rank::DOUBLE * 0.05 / m
             |    THEN rank END), 0) AS i_max FROM ranked)
             |SELECT event_type, daypart, n0 AS n_a, n1 AS n_b, z, p, rank,
             |  rank <= i_max AS rejected
             |FROM ranked CROSS JOIN im ORDER BY rank""".stripMargin)),

    // n-gram novelty: the fraction of each held-out source's DISTINCT
    // 3-shingles unseen in the training half — the generalization-vs-
    // memorization readout (novelty ≈ 0 means the "new" source is a
    // restatement of the train set; complements q117's contamination
    // direction). One distinct per side and one anti-join on the shingle
    // key; exact rationals.
    Entry("q285_ngram_novelty",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val train = docs.filter(length(col("source")) === 4)
          .select(explode(Fns.shingles(Fns.tokens(col("text")), 3)).as("sh"))
          .distinct()
        val test = docs.filter(length(col("source")) > 4)
          .select(col("source"), explode(Fns.shingles(Fns.tokens(col("text")), 3)).as("sh"))
          .distinct()
        val novel = test.join(train, Seq("sh"), "left_anti")
          .groupBy(col("source")).agg(count(lit(1)).as("n_novel"))
        test.groupBy(col("source")).agg(count(lit(1)).as("n_shingles"))
          .join(novel, Seq("source"), "left")
          .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
          .select(col("source"), col("n_shingles"), col("n_novel"),
            (col("n_novel").cast("double") / col("n_shingles")).as("novelty_rate"))
          .orderBy(col("source"))
      },
      Some("""WITH sh AS (
             |  SELECT source, unnest(list_transform(
             |    generate_series(1, greatest(len(t) - 2, 0)),
             |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
             |  FROM (SELECT source, string_split(lower(text), ' ') AS t
             |        FROM documents)),
             |train AS (SELECT DISTINCT sh FROM sh WHERE length(source) = 4),
             |test AS (SELECT DISTINCT source, sh FROM sh
             |         WHERE length(source) > 4),
             |novel AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_novel
             |  FROM test WHERE sh NOT IN (SELECT sh FROM train)
             |  GROUP BY source)
             |SELECT t.source, CAST(count(*) AS BIGINT) AS n_shingles,
             |  coalesce(max(novel.n_novel), 0) AS n_novel,
             |  coalesce(max(novel.n_novel), 0)::DOUBLE / count(*)
             |    AS novelty_rate
             |FROM test t LEFT JOIN novel ON novel.source = t.source
             |GROUP BY t.source ORDER BY t.source""".stripMargin)),

    // Distinct-n diversity per source: distinct/total n-gram ratios for
    // n = 1, 2, 3 — the standard template/degeneracy detector for
    // generated corpora (low distinct-2 = repetitive boilerplate). One
    // explode per n, all aggregates map-side combinable; exact rationals.
    Entry("q286_distinct_ngrams",
      (s, d) => {
        val docs = Tables.documents(s, d)
        def level(n: Int) = docs
          .select(col("source"),
            explode(Fns.shingles(Fns.tokens(col("text")), n)).as("g"))
          .filter(length(col("g")) > 0)
          .groupBy(col("source"))
          .agg(lit(n).as("n"), count(lit(1)).as("total"),
            countDistinct(col("g")).as("uniq"))
        level(1).unionAll(level(2)).unionAll(level(3))
          .select(col("source"), col("n"), col("total"), col("uniq"),
            (col("uniq").cast("double") / col("total")).as("distinct_ratio"))
          .orderBy(col("source"), col("n"))
      },
      Some {
        def sql(n: Int) = {
          val expr = (1 to n).map(j => s"t[i+${j - 1}]").mkString(" || ' ' || ")
          s"""SELECT source, $n AS n, CAST(count(*) AS BIGINT) AS total,
             |  CAST(count(DISTINCT g) AS BIGINT) AS uniq,
             |  count(DISTINCT g)::DOUBLE / count(*) AS distinct_ratio
             |FROM (
             |  SELECT source, unnest(list_transform(
             |    generate_series(1, greatest(len(t) - ${n - 1}, 0)),
             |    i -> $expr)) AS g
             |  FROM (SELECT source, string_split(lower(text), ' ') AS t
             |        FROM documents))
             |WHERE length(g) > 0
             |GROUP BY source""".stripMargin
        }
        s"""SELECT * FROM (${sql(1)} UNION ALL ${sql(2)} UNION ALL ${sql(3)})
           |ORDER BY source, n""".stripMargin
      }),

    // Deterministic permutation test for the A/B mean-value gap: 64
    // md5-keyed reassignments of users to arms (md5 is bit-identical in
    // every engine — the permutation IDs ride the oracle), two-sided
    // p = (1 + #{b : |Δ_b| ≥ |Δ_obs|}) / (B + 1). Sums carry DECIMAL so
    // every Δ_b is exact-input double — the ≥ comparison can never flip
    // on fp noise. One 65× map-side explode aggregated to 130 rows.
    Entry("q287_permutation_test",
      (s, d) => {
        val B = 64
        val perms = Tables.events(s, d)
          .select(col("user_id"), col("value").cast("decimal(20,6)").as("v"),
            explode(sequence(lit(0), lit(B))).as("b"))
          .withColumn("arm",
            pmod(ascii(substring(md5(concat(col("user_id"), lit("|"),
              col("b").cast("string"))), 1, 1)), lit(2)))
        val diffs = perms.groupBy(col("b"))
          .agg(sum(when(col("arm") === 0, col("v"))).as("s0"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("arm") === 1, col("v"))).as("s1"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
          .select(col("b"),
            (col("s0").cast("double") / col("n0") -
              col("s1").cast("double") / col("n1")).as("diff"))
        val obs = diffs.filter(col("b") === 0)
          .select(col("diff").as("diff_obs"))
        diffs.filter(col("b") > 0)
          .crossJoin(broadcast(obs))
          .agg(max(col("diff_obs")).as("diff_obs"),
            count(lit(1)).as("n_perms"),
            sum(when(abs(col("diff")) >= abs(col("diff_obs")), 1L)
              .otherwise(0L)).as("n_extreme"))
          .select(col("diff_obs").cast("float").as("diff_obs"),
            col("n_perms"), col("n_extreme"),
            ((col("n_extreme") + 1).cast("double") / (col("n_perms") + 1))
              .as("p_value"))
      },
      Some("""WITH perms AS (
             |  SELECT user_id, CAST(value AS DECIMAL(20,6)) AS v, b,
             |    ascii(substr(md5(user_id || '|' || CAST(b AS VARCHAR)), 1, 1))
             |      % 2 AS arm
             |  FROM events, unnest(generate_series(0, 64)) AS t(b)),
             |diffs AS (
             |  SELECT b,
             |    sum(CASE WHEN arm = 0 THEN v END)::DOUBLE
             |      / sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
             |    - sum(CASE WHEN arm = 1 THEN v END)::DOUBLE
             |      / sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS diff
             |  FROM perms GROUP BY b),
             |obs AS (SELECT diff AS diff_obs FROM diffs WHERE b = 0)
             |SELECT CAST(max(diff_obs) AS REAL) AS diff_obs,
             |  CAST(count(*) AS BIGINT) AS n_perms,
             |  CAST(sum(CASE WHEN abs(diff) >= abs(diff_obs) THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_extreme,
             |  (sum(CASE WHEN abs(diff) >= abs(diff_obs) THEN 1 ELSE 0 END) + 1)
             |    ::DOUBLE / (count(*) + 1) AS p_value
             |FROM diffs CROSS JOIN obs WHERE b > 0""".stripMargin)),

    // Kendall τ-b between document length (chars) and token count, over
    // ALL-INTEGER buckets (no float boundary can ever flip a cell across
    // engines). Concordant/discordant pairs come from the bucket
    // CONTINGENCY table's self-join — |cells|² work, bounded by the bucket
    // design, never corpus² — and the tie terms from the marginals. Exact
    // longs until the final sqrt ratio.
    Entry("q288_kendall_tau",
      (s, d) => {
        val cells = Tables.documents(s, d)
          .select(expr("n_chars div 50").as("x"),
            expr("size(split(lower(text), ' ')) div 5").as("y"))
          .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true) // read by the pair join (twice) + 3 margins
        val a = cells.select(col("x").as("xa"), col("y").as("ya"), col("cnt").as("na"))
        val b = cells.select(col("x").as("xb"), col("y").as("yb"), col("cnt").as("nb"))
        val pairs = a.join(b, col("xa") < col("xb"))
          .agg(sum(when(col("ya") < col("yb"), col("na") * col("nb")).otherwise(0L)).as("conc"),
            sum(when(col("ya") > col("yb"), col("na") * col("nb")).otherwise(0L)).as("disc"))
        val n = cells.agg(sum(col("cnt")).as("n"))
        val tx = cells.groupBy(col("x")).agg(sum(col("cnt")).as("t"))
          .agg(sum(expr("t * (t - 1) div 2")).as("n1"))
        val ty = cells.groupBy(col("y")).agg(sum(col("cnt")).as("t"))
          .agg(sum(expr("t * (t - 1) div 2")).as("n2"))
        pairs.crossJoin(broadcast(n)).crossJoin(broadcast(tx))
          .crossJoin(broadcast(ty))
          .select(col("n"), col("conc"), col("disc"),
            ((col("conc") - col("disc")).cast("double") /
              sqrt((col("n").cast("double") * (col("n") - 1) / lit(2.0) - col("n1")) *
                (col("n").cast("double") * (col("n") - 1) / lit(2.0) - col("n2"))))
              .as("tau_b"))
      },
      Some("""WITH cells AS (
             |  SELECT n_chars // 50 AS x,
             |    len(string_split(lower(text), ' ')) // 5 AS y,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM documents GROUP BY 1, 2),
             |pairs AS (
             |  SELECT
             |    CAST(sum(CASE WHEN a.y < b.y THEN a.cnt * b.cnt ELSE 0 END)
             |      AS BIGINT) AS conc,
             |    CAST(sum(CASE WHEN a.y > b.y THEN a.cnt * b.cnt ELSE 0 END)
             |      AS BIGINT) AS disc
             |  FROM cells a JOIN cells b ON a.x < b.x),
             |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cells),
             |tx AS (SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n1 FROM (
             |  SELECT CAST(sum(cnt) AS BIGINT) AS t FROM cells GROUP BY x)),
             |ty AS (SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n2 FROM (
             |  SELECT CAST(sum(cnt) AS BIGINT) AS t FROM cells GROUP BY y))
             |SELECT n, conc, disc,
             |  (conc - disc)::DOUBLE
             |    / sqrt((n::DOUBLE * (n - 1) / 2.0 - n1)
             |         * (n::DOUBLE * (n - 1) / 2.0 - n2)) AS tau_b
             |FROM pairs CROSS JOIN n CROSS JOIN tx CROSS JOIN ty""".stripMargin)),

    // Weight-of-evidence / information-value scorecard: activity deciles
    // (two-pass BSP ntile over the corpus-sized user relation) against the
    // error-heavy outcome — the standard credit-scoring feature audit
    // ("which score bands separate the classes, and how much signal does
    // the feature carry in total"). Counts exact; WoE and IV take ln →
    // float32 emit. The IV total rides a 10-row window (k-bounded).
    Entry("q289_woe_iv",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val users = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("score"),
            (sum(when(col("event_type") === "error", 1L).otherwise(0L)) * 5 >
              count(lit(1))).as("pos"))
        val deciled = PrefixSum.globalNtile(users, 10,
          Seq(desc("score"), col("user_id")), "decile")
        val g = deciled.groupBy(col("decile"))
          .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
            sum(when(col("pos"), 0L).otherwise(1L)).as("n_neg"))
        val tot = g.agg(sum(col("n_pos")).as("tp"), sum(col("n_neg")).as("tn"))
        // ADJUSTED WoE (+0.5 per-bucket smoothing): a pure bucket (zero
        // positives or negatives in a decile) would otherwise divide by
        // zero — which ANSI Spark raises as an error even for doubles
        // (seen at sf0.001). The IV weight keeps the raw shares.
        val pr = col("n_pos").cast("double") / col("tp")
        val nr = col("n_neg").cast("double") / col("tn")
        val woe = log(((col("n_pos") + lit(0.5)) / col("tp")) /
          ((col("n_neg") + lit(0.5)) / col("tn")))
        val scored = g.crossJoin(broadcast(tot))
          .filter(col("tp") > 0 && col("tn") > 0)
          .withColumn("woe_term", (pr - nr) * woe)
          .withColumn("woe", woe.cast("float"))
        val wAll = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        scored
          .withColumn("iv", sum(col("woe_term")).over(wAll).cast("float"))
          .select(col("decile"), col("n_pos"), col("n_neg"), col("woe"),
            col("iv"))
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
             |g AS (
             |  SELECT decile,
             |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
             |  FROM deciled GROUP BY decile),
             |t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tp,
             |             CAST(sum(n_neg) AS BIGINT) AS tn FROM g)
             |SELECT decile, n_pos, n_neg,
             |  CAST(ln(((n_pos + 0.5) / tp) / ((n_neg + 0.5) / tn)) AS REAL)
             |    AS woe,
             |  CAST(sum((n_pos::DOUBLE / tp - n_neg::DOUBLE / tn)
             |    * ln(((n_pos + 0.5) / tp) / ((n_neg + 0.5) / tn))) OVER ()
             |    AS REAL) AS iv
             |FROM g CROSS JOIN t WHERE tp > 0 AND tn > 0 ORDER BY decile""".stripMargin)),

    // Kaplan–Meier survival over user lifetimes (days between first and
    // last event), right-censored at the corpus horizon (no event in the
    // final 12 hours = churned; later activity = still alive, censored) —
    // the retention curve behind churn
    // modeling. Risk sets are exact cumulative counts and the survival
    // product is exp(Σ ln(1 − d/n)), both cumulatives through the two-pass
    // BSP prefix sum (the duration axis grows with the observation span);
    // ln/exp make survival float32.
    Entry("q290_kaplan_meier",
      (s, d) => {
        val horizon = 12L * 3600000000L
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("us"))
        val corpusMax = ev.agg(max(col("us")).as("max_us"))
        val life = ev.groupBy(col("user_id"))
          .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
          .crossJoin(broadcast(corpusMax))
          .select(expr("(last_us - first_us) div 86400000000").as("dur_d"),
            when(col("max_us") - col("last_us") > horizon, 1L).otherwise(0L)
              .as("died"))
        val byDur = life.groupBy(col("dur_d"))
          .agg(sum(col("died")).as("d_events"),
            sum(lit(1L) - col("died")).as("c_censored"),
            count(lit(1)).as("ct"))
        val nTot = byDur.agg(sum(col("ct")).as("n_total"))
        val cum = PrefixSum.globalRunningSum(byDur, Seq(col("dur_d")),
            col("ct").cast("decimal(20,0)"))
          .crossJoin(broadcast(nTot))
          .withColumn("n_risk",
            col("n_total") - col("running").cast("long") + col("ct"))
          .withColumn("ln_term",
            // Clamp away from 0: a terminal bucket where every at-risk
            // user dies (d == n) would be ln(0) = -Inf, which the
            // decimal(30,15) running-sum cast rejects under ANSI. The
            // clamped product is then OVERRIDDEN to an exact 0 below —
            // d == n can only happen at the terminal bucket (nobody
            // survives past it to populate a later one), so the override
            // never propagates into other rows' running product.
            log(greatest(lit(1e-12),
              lit(1.0) - col("d_events").cast("double") / col("n_risk"))))
        PrefixSum.globalRunningSum(cum.drop("running"), Seq(col("dur_d")),
            col("ln_term").cast("decimal(30,15)"))
          .withColumn("survival",
            when(col("d_events") === col("n_risk"), lit(0.0f))
              .otherwise(exp(col("running").cast("double")).cast("float")))
          .filter(col("d_events") > 0)
          .select(col("dur_d"), col("n_risk"), col("d_events"),
            col("c_censored"), col("survival"))
          .orderBy(col("dur_d"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
             |  FROM events),
             |mx AS (SELECT max(us) AS max_us FROM ev),
             |life AS (
             |  SELECT (max(us) - min(us)) // 86400000000 AS dur_d,
             |    CASE WHEN (SELECT max_us FROM mx) - max(us) > 43200000000
             |      THEN 1 ELSE 0 END AS died
             |  FROM ev GROUP BY user_id),
             |byd AS (
             |  SELECT dur_d, CAST(sum(died) AS BIGINT) AS d_events,
             |    CAST(sum(1 - died) AS BIGINT) AS c_censored,
             |    CAST(count(*) AS BIGINT) AS ct
             |  FROM life GROUP BY dur_d),
             |t AS (SELECT CAST(sum(ct) AS BIGINT) AS n_total FROM byd),
             |risk AS (
             |  SELECT *,
             |    (SELECT n_total FROM t)
             |      - CAST(sum(ct) OVER (ORDER BY dur_d) AS BIGINT) + ct
             |      AS n_risk
             |  FROM byd),
             |surv AS (
             |  SELECT *,
             |    CASE WHEN d_events = n_risk THEN CAST(0 AS REAL)
             |    ELSE CAST(exp(sum(CAST(ln(greatest(1e-12,
             |        1.0 - d_events::DOUBLE / n_risk))
             |        AS DECIMAL(30,15))) OVER (ORDER BY dur_d)) AS REAL)
             |    END AS survival
             |  FROM risk)
             |SELECT dur_d, n_risk, d_events, c_censored, survival
             |FROM surv WHERE d_events > 0 ORDER BY dur_d""".stripMargin)),

    // Dedup-cluster edge-density audit: connected components merge
    // transitively, so a cluster can contain pairs that were NEVER
    // directly similar (chain-merge over-clustering — the failure mode
    // that deletes non-duplicates). Per cluster size: direct-edge count
    // vs possible pairs; density 1 = every member pair verified, density
    // → 0 = chains. Edges map onto clusters with one broadcast-size join
    // (near-dup population, not corpus); the ratio is one exact division.
    Entry("q291_cluster_density",
      (s, d) => {
        import graft.ops.{Dedup, GraphAnalytics}
        val pairs = Dedup.exactJaccardPairs(Tables.documents(s, d),
            "doc_id", "text", 3, 0.5)
          .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
        val clusters = GraphAnalytics.dedupClusters(pairs)
        val sizes = clusters.groupBy(col("cluster")).agg(count(lit(1)).as("s"))
        val edges = pairs
          .join(clusters.select(col("doc_id").as("doc_a"),
            col("cluster")), "doc_a")
          .groupBy(col("cluster")).agg(count(lit(1)).as("ne"))
        sizes.join(edges, "cluster")
          .groupBy(col("s").as("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("ne")).as("n_edges"),
            sum(expr("s * (s - 1) div 2")).as("n_possible"))
          .withColumn("edge_density",
            col("n_edges").cast("double") / col("n_possible"))
          .orderBy(col("cluster_size"))
      },
      Some("""WITH RECURSIVE
             |toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
             |         FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, unnest(list_transform(
             |    generate_series(1, greatest(len(t) - 2, 0)),
             |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
             |  FROM toks),
             |inter AS (
             |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b,
             |    count(*) AS ninter
             |  FROM sh sa JOIN sh sb
             |    ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
             |  GROUP BY 1, 2),
             |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |pairs AS (
             |  SELECT doc_a, doc_b FROM inter i
             |  JOIN sizes na ON na.doc_id = i.doc_a
             |  JOIN sizes nb ON nb.doc_id = i.doc_b
             |  WHERE ninter::DOUBLE / (na.n + nb.n - ninter) >= 0.5),
             |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(a, b) AS (
             |  SELECT a, b FROM sym
             |  UNION
             |  SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a),
             |comp AS (
             |  SELECT a AS doc_id, least(a, min(b)) AS cluster
             |  FROM reach GROUP BY a),
             |cl AS (SELECT cluster, CAST(count(*) AS BIGINT) AS s
             |       FROM comp GROUP BY 1),
             |pe AS (
             |  SELECT c.cluster, CAST(count(*) AS BIGINT) AS ne
             |  FROM pairs p JOIN comp c ON c.doc_id = p.doc_a
             |  GROUP BY 1)
             |SELECT s AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
             |  CAST(sum(ne) AS BIGINT) AS n_edges,
             |  CAST(sum(s * (s - 1) // 2) AS BIGINT) AS n_possible,
             |  sum(ne)::DOUBLE / sum(s * (s - 1) // 2) AS edge_density
             |FROM cl JOIN pe USING (cluster)
             |GROUP BY s ORDER BY s""".stripMargin)),

    // Expected calibration error over a temporal split: each user's
    // first-half error RATE is the "predicted probability" that they hit
    // an error in the second half; ECE = Σ_b (n_b/N)·|acc_b − conf_b|
    // over ten fixed-width bins. Bin ids floor identical doubles (exact
    // rationals) so cells can never straddle engines; mean confidence
    // sums doubles → float32, accuracy stays an exact rational.
    Entry("q292_ece",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts").cast("timestamp")).as("us"))
        val mid = ev.agg(((min(col("us")) + max(col("us"))) / 2).as("mid_us"))
        val users = ev.crossJoin(broadcast(mid))
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("us") < col("mid_us"), 1L).otherwise(0L)).as("n1"),
            sum(when(col("us") < col("mid_us") &&
              col("event_type") === "error", 1L).otherwise(0L)).as("e1"),
            max(when(col("us") >= col("mid_us") &&
              col("event_type") === "error", 1L).otherwise(0L)).as("pos"))
          .filter(col("n1") > 0)
          .withColumn("p_hat", col("e1").cast("double") / col("n1"))
          .withColumn("bin",
            least(floor(col("p_hat") * 10), lit(9L)).cast("int"))
        val g = users.groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            sum(col("pos")).as("n_pos"),
            avg(col("p_hat")).as("conf_d"))
        val tot = g.agg(sum(col("n")).as("n_tot"))
        val wAll = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        g.crossJoin(broadcast(tot))
          .withColumn("acc", col("n_pos").cast("double") / col("n"))
          .withColumn("ece", sum(
            col("n").cast("double") / col("n_tot") *
              abs(col("acc") - col("conf_d"))).over(wAll).cast("float"))
          .select(col("bin"), col("n"), col("conf_d").cast("float").as("conf"),
            col("acc"), col("ece"))
          .orderBy(col("bin"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
             |  FROM events),
             |mid AS (SELECT (min(us) + max(us)) / 2 AS mid_us FROM ev),
             |users AS (
             |  SELECT user_id,
             |    CAST(sum(CASE WHEN us < mid_us THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n1,
             |    CAST(sum(CASE WHEN us < mid_us AND event_type = 'error'
             |      THEN 1 ELSE 0 END) AS BIGINT) AS e1,
             |    CAST(max(CASE WHEN us >= mid_us AND event_type = 'error'
             |      THEN 1 ELSE 0 END) AS BIGINT) AS pos
             |  FROM ev CROSS JOIN mid GROUP BY user_id
             |  HAVING sum(CASE WHEN us < mid_us THEN 1 ELSE 0 END) > 0),
             |binned AS (
             |  SELECT *, e1::DOUBLE / n1 AS p_hat,
             |    CAST(least(floor((e1::DOUBLE / n1) * 10), 9) AS INT) AS bin
             |  FROM users),
             |g AS (
             |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(pos) AS BIGINT) AS n_pos, avg(p_hat) AS conf_d
             |  FROM binned GROUP BY bin),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM g)
             |SELECT bin, n, CAST(conf_d AS REAL) AS conf,
             |  n_pos::DOUBLE / n AS acc,
             |  CAST(sum(n::DOUBLE / n_tot * abs(n_pos::DOUBLE / n - conf_d))
             |    OVER () AS REAL) AS ece
             |FROM g CROSS JOIN t ORDER BY bin""".stripMargin)),

    // Count-min sketch audit: a 4×64 CMS over the token stream (seeded
    // md5 row hashes — bit-identical in any engine), read back for the
    // ten heaviest tokens against their true counts. The one-sided error
    // (est ≥ true, bounded by collisions) is the planning input for
    // sizing sketch width vs the q99 exact heavy-hitter pass. Sketch
    // cells are ONE map-side-combinable agg (d·w cells total); estimates
    // are a broadcast-size join. All exact integers.
    Entry("q293_countmin",
      (s, d) => {
        val cnt = Tables.documents(s, d)
          .select(explode(Fns.tokens(col("text"))).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
          .localCheckpoint(true) // feeds the cells, the top-10 and the probe
        val hashed = cnt.select(col("w"), col("c"),
            explode(sequence(lit(0), lit(3))).as("r"))
          .withColumn("bucket",
            pmod(Fns.hash60(concat(col("w"), lit("#"), col("r"))), lit(64L)))
        val cells = hashed.groupBy(col("r"), col("bucket"))
          .agg(sum(col("c")).as("cell"))
        val top = cnt.orderBy(desc("c"), col("w")).limit(10)
          .select(col("w").as("tw"), col("c").as("true_c"))
        val probes = top
          .withColumn("r", explode(sequence(lit(0), lit(3))))
          .withColumn("bucket",
            pmod(Fns.hash60(concat(col("tw"), lit("#"), col("r"))), lit(64L)))
          .join(cells, Seq("r", "bucket"))
        probes.groupBy(col("tw").as("w"))
          .agg(max(col("true_c")).as("true_c"), min(col("cell")).as("est"))
          .withColumn("err", col("est") - col("true_c"))
          .orderBy(desc("true_c"), col("w"))
      },
      Some {
        val h = (e: String) => s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"
        s"""WITH cnt AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
           |    SELECT unnest(string_split(lower(text), ' ')) AS w
           |    FROM documents)
           |  WHERE length(w) > 0 GROUP BY w),
           |hashed AS (
           |  SELECT w, c, r,
           |    ${h("w || '#' || CAST(r AS VARCHAR)")} % 64 AS bucket
           |  FROM cnt, unnest(generate_series(0, 3)) AS t(r)),
           |cells AS (
           |  SELECT r, bucket, CAST(sum(c) AS BIGINT) AS cell
           |  FROM hashed GROUP BY 1, 2),
           |top AS (
           |  SELECT w AS tw, c AS true_c FROM cnt
           |  ORDER BY c DESC, w LIMIT 10),
           |probes AS (
           |  SELECT tw, true_c, cells.cell
           |  FROM top, unnest(generate_series(0, 3)) AS t(r)
           |  JOIN cells ON cells.r = t.r
           |    AND cells.bucket = ${h("tw || '#' || CAST(t.r AS VARCHAR)")} % 64)
           |SELECT tw AS w, max(true_c) AS true_c,
           |  CAST(min(cell) AS BIGINT) AS est,
           |  CAST(min(cell) - max(true_c) AS BIGINT) AS err
           |FROM probes GROUP BY tw ORDER BY true_c DESC, w""".stripMargin
      }),

    // Neyman allocation for a labeling budget: the optimal stratified
    // sample takes n_h ∝ N_h·σ_h — big AND internally varied strata get
    // annotators; uniform strata don't. σ from exact integer power sums
    // (one scan); the share normalizer sums 20 doubles → float32 emit.
    Entry("q294_neyman_allocation",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val g = Tables.documents(s, d)
          .select(col("source"), col("n_chars").cast("long").as("x"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_h"),
            sum(col("x")).as("s1"), sum(col("x") * col("x")).as("s2"))
          .filter(col("n_h") > 1)
        val sigma = sqrt((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") / col("n_h")) /
          (col("n_h") - 1))
        val wAll = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        g.withColumn("w_h", col("n_h").cast("double") * sigma)
          .withColumn("share", (col("w_h") / sum(col("w_h")).over(wAll))
            .cast("float"))
          .select(col("source"), col("n_h"), sigma.cast("float").as("sigma"),
            col("share"))
          .orderBy(col("source"))
      },
      Some("""WITH g AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_h,
             |    CAST(sum(n_chars) AS BIGINT) AS s1,
             |    CAST(sum(n_chars::BIGINT * n_chars) AS BIGINT) AS s2
             |  FROM documents GROUP BY source HAVING count(*) > 1),
             |w AS (
             |  SELECT *, n_h::DOUBLE * sqrt((s2::DOUBLE
             |      - s1::DOUBLE * s1::DOUBLE / n_h) / (n_h - 1)) AS w_h
             |  FROM g)
             |SELECT source, n_h,
             |  CAST(sqrt((s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / n_h)
             |    / (n_h - 1)) AS REAL) AS sigma,
             |  CAST(w_h / sum(w_h) OVER () AS REAL) AS share
             |FROM w ORDER BY source""".stripMargin)),

    // Quality ~ ln(length) regression per source — the confound audit
    // before using either signal for curation (a high slope means the
    // "quality" feature is mostly re-measuring length for that source).
    // One grouped regr agg (map-side-combinable power sums); regression
    // outputs emit float32 (ln + engine-ordered sums).
    Entry("q295_quality_length_regression",
      (s, d) => {
        import graft.ops.TextAnalysis
        val docs = Tables.documents(s, d)
        val q = TextAnalysis.quality(docs, "doc_id", "text")
          .select(col("doc_id"), col("quality"))
          .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
            "doc_id")
        q.groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            expr("regr_slope(quality, ln(n_chars))").cast("float").as("slope"),
            expr("regr_r2(quality, ln(n_chars))").cast("float").as("r2"))
          .orderBy(col("source"))
      },
      Some {
        val stop = graft.ops.TextAnalysis.langMarkers.values.flatten.toSeq
          .distinct.sorted.map(m => s"'$m'").mkString(", ")
        s"""WITH t AS (
           |  SELECT doc_id, source, n_chars,
           |    string_split(lower(text), ' ') AS toks
           |  FROM documents),
           |f AS (
           |  SELECT doc_id, source, n_chars,
           |    CAST(len(toks) AS BIGINT) AS n_tokens,
           |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           |    CAST(len(list_filter(toks, x -> list_contains([$stop], x)))
           |      AS BIGINT) AS n_stop
           |  FROM t),
           |qual AS (
           |  SELECT doc_id, source, n_chars,
           |    0.4 * least(1.0, n_tokens / 64.0)
           |      + 0.3 * (n_distinct::DOUBLE / n_tokens)
           |      + 0.3 * (1.0 - n_stop::DOUBLE / n_tokens) AS quality
           |  FROM f)
           |SELECT source, CAST(count(*) AS BIGINT) AS n,
           |  CAST(regr_slope(quality, ln(n_chars)) AS REAL) AS slope,
           |  CAST(regr_r2(quality, ln(n_chars)) AS REAL) AS r2
           |FROM qual GROUP BY source ORDER BY source""".stripMargin
      }),

    // Flesch reading-ease per source, with a deterministic vowel-group
    // syllable heuristic (regex, identical in both engines) — the
    // readability gate corpus curation runs next to the q24/q175 quality
    // scores. One explode for syllables, one regex count for sentences;
    // per-doc scores are exact-input doubles, the per-source mean sums
    // them → float32.
    Entry("q296_readability",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val syl = docs
          .select(col("doc_id"), explode(Fns.tokens(col("text"))).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(greatest(lit(1),
              size(regexp_extract_all(col("w"), lit("[aeiouy]+"), lit(0)))
                .cast("long"))).as("n_syl"))
        val perDoc = docs
          .select(col("doc_id"), col("source"),
            greatest(lit(1L),
              size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
                .cast("long")).as("n_sent"))
          .join(syl, "doc_id")
          .withColumn("flesch",
            lit(206.835) -
              lit(1.015) * (col("n_words").cast("double") / col("n_sent")) -
              lit(84.6) * (col("n_syl").cast("double") / col("n_words")))
        perDoc.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            avg(col("flesch")).cast("float").as("avg_flesch"),
            avg(col("n_syl").cast("double") / col("n_words")).cast("float")
              .as("avg_syl_per_word"))
          .orderBy(col("source"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
             |  FROM documents),
             |syl AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             |    CAST(sum(greatest(1,
             |      len(regexp_extract_all(w, '[aeiouy]+')))) AS BIGINT)
             |      AS n_syl
             |  FROM toks WHERE length(w) > 0 GROUP BY doc_id),
             |perdoc AS (
             |  SELECT d.source,
             |    206.835
             |      - 1.015 * (s.n_words::DOUBLE
             |          / greatest(1, len(regexp_extract_all(d.text, '[.!?]+'))))
             |      - 84.6 * (s.n_syl::DOUBLE / s.n_words) AS flesch,
             |    s.n_syl::DOUBLE / s.n_words AS spw
             |  FROM documents d JOIN syl s USING (doc_id))
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(avg(flesch) AS REAL) AS avg_flesch,
             |  CAST(avg(spw) AS REAL) AS avg_syl_per_word
             |FROM perdoc GROUP BY source ORDER BY source""".stripMargin)),

    // Trailing 7-day active users per day (DAU + WAU7) — the liveness
    // series behind every engagement dashboard. Exact distinct counts:
    // the (day, user) relation joins a 7-day trailing range (bounded ×7
    // fan-out, never corpus²), then one distinct-count per day.
    Entry("q297_rolling_active",
      (s, d) => {
        val du = Tables.events(s, d)
          .select(to_date(col("ts")).as("day"), col("user_id"))
          .distinct().localCheckpoint(true) // feeds the grid, DAU and the range join
        val days = du.select(col("day")).distinct()
        val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
        val wau = days.as("g")
          .join(du.as("u"),
            col("u.day") >= date_sub(col("g.day"), 6) &&
              col("u.day") <= col("g.day"))
          .groupBy(col("g.day").as("day"))
          .agg(countDistinct(col("u.user_id")).as("wau7"))
        dau.join(wau, "day").orderBy(col("day"))
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
             |days AS (SELECT DISTINCT day FROM du),
             |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
             |        FROM du GROUP BY day),
             |wau AS (
             |  SELECT g.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau7
             |  FROM days g JOIN du u
             |    ON u.day >= g.day - 6 AND u.day <= g.day
             |  GROUP BY g.day)
             |SELECT day, dau, wau7 FROM dau JOIN wau USING (day)
             |ORDER BY day""".stripMargin)),

    // Church–Gale word burstiness for the 50 heaviest tokens: a Poisson
    // spread would hit df_pred = D·(1 − e^(−tf/D)) documents; real words
    // CLUMP (df_obs < df_pred), templates repeat everywhere. The
    // burstiness ratio feeds stopword/boilerplate calls the raw df rank
    // (q176) can't make. Counts exact; e^ makes the ratio float32.
    Entry("q298_word_burstiness",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(Fns.tokens(col("text"))).as("w"))
          .filter(length(col("w")) > 0)
        val stats = tok.groupBy(col("w"))
          .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        stats.orderBy(desc("tf"), col("w")).limit(50)
          .crossJoin(broadcast(nDocs))
          .select(col("w"), col("tf"), col("df"),
            ((col("n_docs") * (lit(1.0) -
              exp(-col("tf").cast("double") / col("n_docs")))) /
              col("df")).cast("float").as("burstiness"))
          .orderBy(desc("tf"), col("w"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
             |  FROM documents),
             |stats AS (
             |  SELECT w, CAST(count(*) AS BIGINT) AS tf,
             |    CAST(count(DISTINCT doc_id) AS BIGINT) AS df
             |  FROM tok WHERE length(w) > 0 GROUP BY w),
             |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
             |top AS (SELECT * FROM stats ORDER BY tf DESC, w LIMIT 50)
             |SELECT w, tf, df,
             |  CAST((n_docs * (1.0 - exp(-(tf::DOUBLE) / n_docs))) / df
             |    AS REAL) AS burstiness
             |FROM top CROSS JOIN nd ORDER BY tf DESC, w""".stripMargin)),

    // Mutual information (and the sqrt-normalized NMI) between event type
    // and daypart — the effect-size companion to q282's χ²: how many nats
    // does knowing the hour tell you about the event mix? Same densified
    // grid; ln → float32.
    Entry("q299_mutual_information",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), expr("hour(ts) div 6").as("daypart"))
        val obs = ev.groupBy(col("event_type"), col("daypart"))
          .agg(count(lit(1)).as("o"))
        val rowT = obs.groupBy(col("event_type")).agg(sum(col("o")).as("rt"))
        val colT = obs.groupBy(col("daypart")).agg(sum(col("o")).as("ctt"))
        val nT = obs.agg(sum(col("o")).as("n"))
        val pxy = col("o").cast("double") / col("n")
        val px = col("rt").cast("double") / col("n")
        val py = col("ctt").cast("double") / col("n")
        val joined = obs.join(broadcast(rowT), "event_type")
          .join(broadcast(colT), "daypart")
          .crossJoin(broadcast(nT))
        val hx = rowT.crossJoin(broadcast(nT))
          .agg(sum(-(col("rt").cast("double") / col("n")) *
            log(col("rt").cast("double") / col("n"))).as("h_x"))
        val hy = colT.crossJoin(broadcast(nT))
          .agg(sum(-(col("ctt").cast("double") / col("n")) *
            log(col("ctt").cast("double") / col("n"))).as("h_y"))
        joined
          .agg(max(col("n")).as("n"),
            sum(pxy * log(pxy / (px * py))).as("mi_d"))
          .crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
          .select(col("n"), col("mi_d").cast("float").as("mi"),
            (col("mi_d") / sqrt(col("h_x") * col("h_y"))).cast("float")
              .as("nmi"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type, hour(ts) // 6 AS daypart FROM events),
             |obs AS (
             |  SELECT event_type, daypart, CAST(count(*) AS BIGINT) AS o
             |  FROM ev GROUP BY 1, 2),
             |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
             |       FROM obs GROUP BY 1),
             |ctt AS (SELECT daypart, CAST(sum(o) AS BIGINT) AS ctt
             |        FROM obs GROUP BY 1),
             |nt AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
             |hx AS (SELECT sum(-(rt::DOUBLE / n) * ln(rt::DOUBLE / n)) AS h_x
             |       FROM rt CROSS JOIN nt),
             |hy AS (SELECT sum(-(ctt::DOUBLE / n) * ln(ctt::DOUBLE / n)) AS h_y
             |       FROM ctt CROSS JOIN nt)
             |SELECT max(n) AS n,
             |  CAST(sum((o::DOUBLE / n) * ln((o::DOUBLE / n)
             |    / ((rt.rt::DOUBLE / n) * (ctt.ctt::DOUBLE / n)))) AS REAL)
             |    AS mi,
             |  CAST(sum((o::DOUBLE / n) * ln((o::DOUBLE / n)
             |    / ((rt.rt::DOUBLE / n) * (ctt.ctt::DOUBLE / n))))
             |    / sqrt(max(h_x) * max(h_y)) AS REAL) AS nmi
             |FROM obs JOIN rt USING (event_type) JOIN ctt USING (daypart)
             |CROSS JOIN nt CROSS JOIN hx CROSS JOIN hy""".stripMargin)),

    // End-to-end curation run report — the whole filter funnel as ONE
    // declarative plan: length gate → language gate → repetition gate →
    // exact dedup (md5 canonical) → near-dup dedup (prefix-filter pairs,
    // CC clusters, min-id representative). Each stage filters the
    // PREVIOUS stage's survivors; the report emits surviving docs and
    // chars per stage — the run card a 100 TB curation job prints. Every
    // gate is exact/deterministic, so the funnel is hash-reproducible;
    // the near-dup stage reuses the candidate-restricted pair join and
    // the distributed CC (never corpus²).
    Entry("q300_curation_report",
      (s, d) => {
        import graft.ops.{Dedup, GraphAnalytics}
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
        val s1 = docs.filter(col("n_chars") >= 100)
        val s2 = s1.filter(col("lang") === "en")
        val s3 = s2
          .withColumn("toks", filter(Fns.tokens(col("text")),
            t => length(t) > 0))
          .filter(size(array_distinct(col("toks"))).cast("double") /
            size(col("toks")) >= 0.5)
          .drop("toks")
        val s4 = s3.withColumn("h", md5(col("text")))
          .withColumn("keep", col("doc_id") === min(col("doc_id"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
          .filter(col("keep")).drop("h", "keep")
          .localCheckpoint(true) // feeds the pair join AND the s5 anti-join
        val pairs = Dedup.exactJaccardPairs(s4, "doc_id", "text", 3, 0.5)
          .select(col("doc_a"), col("doc_b"))
        val dropNearDup = GraphAnalytics.dedupClusters(pairs)
          .filter(col("doc_id") =!= col("cluster")) // non-representatives
          .select(col("doc_id"))
        val s5 = s4.join(dropNearDup, Seq("doc_id"), "left_anti")
        def stage(name: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n_docs"),
              coalesce(sum(col("n_chars")), lit(0L)).as("n_chars"))
            .select(lit(name).as("stage"), col("n_docs"),
              col("n_chars").cast("long").as("n_chars"))
        stage("0_input", docs)
          .unionAll(stage("1_length", s1))
          .unionAll(stage("2_lang", s2))
          .unionAll(stage("3_repetition", s3))
          .unionAll(stage("4_exact_dedup", s4))
          .unionAll(stage("5_near_dedup", s5))
          .orderBy(col("stage"))
      },
      Some("""WITH RECURSIVE
             |s1 AS (SELECT * FROM documents WHERE n_chars >= 100),
             |s2 AS (SELECT * FROM s1 WHERE lang = 'en'),
             |s3 AS (
             |  SELECT * FROM s2
             |  WHERE len(list_distinct(list_filter(
             |      string_split(lower(text), ' '), x -> length(x) > 0)))
             |    ::DOUBLE / len(list_filter(
             |      string_split(lower(text), ' '), x -> length(x) > 0)) >= 0.5),
             |s4 AS (
             |  SELECT * FROM s3
             |  WHERE doc_id IN (
             |    SELECT min(doc_id) FROM s3 GROUP BY md5(text))),
             |toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
             |         FROM s4),
             |sh AS (
             |  SELECT DISTINCT doc_id, unnest(list_transform(
             |    generate_series(1, greatest(len(t) - 2, 0)),
             |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
             |  FROM toks),
             |inter AS (
             |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b,
             |    count(*) AS ninter
             |  FROM sh sa JOIN sh sb
             |    ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
             |  GROUP BY 1, 2),
             |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |pairs AS (
             |  SELECT doc_a, doc_b FROM inter i
             |  JOIN sizes na ON na.doc_id = i.doc_a
             |  JOIN sizes nb ON nb.doc_id = i.doc_b
             |  WHERE ninter::DOUBLE / (na.n + nb.n - ninter) >= 0.5),
             |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
             |  UNION SELECT doc_b, doc_a FROM pairs),
             |reach(a, b) AS (
             |  SELECT a, b FROM sym
             |  UNION
             |  SELECT r.a, e.b FROM reach r JOIN sym e ON r.b = e.a),
             |comp AS (
             |  SELECT a AS doc_id, least(a, min(b)) AS cluster
             |  FROM reach GROUP BY a),
             |s5 AS (
             |  SELECT * FROM s4 WHERE doc_id NOT IN (
             |    SELECT doc_id FROM comp WHERE doc_id <> cluster))
             |SELECT * FROM (
             |  SELECT '0_input' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS n_chars
             |  FROM documents
             |  UNION ALL SELECT '1_length', CAST(count(*) AS BIGINT),
             |    CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM s1
             |  UNION ALL SELECT '2_lang', CAST(count(*) AS BIGINT),
             |    CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM s2
             |  UNION ALL SELECT '3_repetition', CAST(count(*) AS BIGINT),
             |    CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM s3
             |  UNION ALL SELECT '4_exact_dedup', CAST(count(*) AS BIGINT),
             |    CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM s4
             |  UNION ALL SELECT '5_near_dedup', CAST(count(*) AS BIGINT),
             |    CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM s5)
             |ORDER BY stage""".stripMargin)),

    // Sample-ratio mismatch check for the md5-parity A/B assignment: a
    // healthy 50/50 user split should give |z| ≤ 3; SRM is the first
    // thing to rule out before reading any experiment metric (a biased
    // assignment invalidates every downstream lift). One distinct-user
    // agg; z is divisions/sqrt over exact integers (full double), the
    // A–S tail p emits float32.
    Entry("q301_srm_check",
      (s, d) => {
        val users = Tables.events(s, d).select(col("user_id")).distinct()
          .withColumn("arm",
            pmod(ascii(substring(md5(col("user_id").cast("string")), 1, 1)),
              lit(2)))
        val g = users.agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
        val n = col("n_a") + col("n_b")
        val z = (col("n_a").cast("double") - n.cast("double") / 2) /
          sqrt(n.cast("double") / 4)
        val az = abs(col("z"))
        val k = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
        val pnd = exp(-az * az / 2) * lit(0.3989422804014327) *
          (k * (lit(0.319381530) + k * (lit(-0.356563782) +
            k * (lit(1.781477937) + k * (lit(-1.821255978) +
              k * lit(1.330274429))))))
        g.withColumn("z", z)
          .select(col("n_a"), col("n_b"), col("z"),
            (lit(2.0) * pnd).cast("float").as("p"),
            (abs(col("z")) > 3.0).as("srm_flag"))
      },
      Some("""WITH users AS (
             |  SELECT DISTINCT user_id,
             |    ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 AS arm
             |  FROM events),
             |g AS (
             |  SELECT
             |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
             |  FROM users),
             |zed AS (
             |  SELECT *, (n_a::DOUBLE - (n_a + n_b)::DOUBLE / 2)
             |    / sqrt((n_a + n_b)::DOUBLE / 4) AS z
             |  FROM g)
             |SELECT n_a, n_b, z,
             |  CAST(2.0 * exp(-abs(z) * abs(z) / 2) * 0.3989422804014327
             |    * ((1.0 / (1.0 + 0.2316419 * abs(z))) * (0.319381530
             |      + (1.0 / (1.0 + 0.2316419 * abs(z))) * (-0.356563782
             |      + (1.0 / (1.0 + 0.2316419 * abs(z))) * (1.781477937
             |      + (1.0 / (1.0 + 0.2316419 * abs(z))) * (-1.821255978
             |      + (1.0 / (1.0 + 0.2316419 * abs(z))) * 1.330274429)))))
             |    AS REAL) AS p,
             |  abs(z) > 3.0 AS srm_flag
             |FROM zed""".stripMargin)),

    // MinHash banding planner: for every (bands, rows) factorization of a
    // 16-hash signature, the S-curve P(match | s) = 1 − (1 − s^r)^b
    // integrated above/below the target threshold gives the false-negative
    // and false-positive mass — the a-priori companion to q143's empirical
    // calibration (pick the factorization BEFORE paying a corpus pass).
    // Pure closed-form grid (5 plans × 19 similarity points, broadcast
    // literals); pow emits float32.
    Entry("q302_lsh_band_planner",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val t = 0.5
        val plans = Seq((1, 16), (2, 8), (4, 4), (8, 2), (16, 1))
        val planDf = s.range(1).select(explode(array(plans.map {
            case (b, r) => struct(lit(b).as("bands"),
              lit(r).as("rows_per_band"))
          }: _*)).as("p"))
          .select(col("p.bands").as("bands"),
            col("p.rows_per_band").as("rows_per_band"))
        val grid = planDf.withColumn("i",
          explode(sequence(lit(1), lit(19))))
          .withColumn("sim", col("i").cast("double") / 20)
        val pMatch = lit(1.0) -
          pow(lit(1.0) - pow(col("sim"), col("rows_per_band")), col("bands"))
        val scored = grid
          .withColumn("fn", when(col("sim") >= t, lit(1.0) - pMatch)
            .otherwise(0.0))
          .withColumn("fp", when(col("sim") < t, pMatch).otherwise(0.0))
          .groupBy(col("bands"), col("rows_per_band"))
          .agg(sum(col("fn")).as("fn_mass_d"), sum(col("fp")).as("fp_mass_d"))
          .withColumn("cost_d", col("fn_mass_d") + col("fp_mass_d"))
        val wAll = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        scored
          .withColumn("best",
            col("cost_d") === min(col("cost_d")).over(wAll))
          .select(col("bands"), col("rows_per_band"),
            col("fn_mass_d").cast("float").as("fn_mass"),
            col("fp_mass_d").cast("float").as("fp_mass"),
            col("cost_d").cast("float").as("cost"), col("best"))
          .orderBy(col("bands"))
      },
      Some("""WITH plans(bands, rows_per_band) AS (
             |  VALUES (1, 16), (2, 8), (4, 4), (8, 2), (16, 1)),
             |grid AS (
             |  SELECT bands, rows_per_band, i::DOUBLE / 20 AS sim
             |  FROM plans, unnest(generate_series(1, 19)) AS t(i)),
             |scored AS (
             |  SELECT bands, rows_per_band,
             |    sum(CASE WHEN sim >= 0.5
             |      THEN 1.0 - (1.0 - (1.0 - pow(sim, rows_per_band))
             |        ** bands) ELSE 0.0 END) AS fn_mass_d,
             |    sum(CASE WHEN sim < 0.5
             |      THEN 1.0 - (1.0 - pow(sim, rows_per_band)) ** bands
             |      ELSE 0.0 END) AS fp_mass_d
             |  FROM grid GROUP BY 1, 2)
             |SELECT bands, rows_per_band,
             |  CAST(fn_mass_d AS REAL) AS fn_mass,
             |  CAST(fp_mass_d AS REAL) AS fp_mass,
             |  CAST(fn_mass_d + fp_mass_d AS REAL) AS cost,
             |  fn_mass_d + fp_mass_d
             |    = min(fn_mass_d + fp_mass_d) OVER () AS best
             |FROM scored ORDER BY bands""".stripMargin)),

    // Per-user interval-union coverage: treat each event as an activity
    // interval [ts, ts + ceil(value) minutes) and compute the exact union
    // length (merged, overlap-free) vs the first→last span — how BUSY a
    // user's timeline actually is, the per-key sibling of q195's global
    // sweep. One user-partitioned window (running max of interval end
    // over PRIOR rows clips each interval's new contribution); exact
    // integer seconds throughout.
    Entry("q303_interval_coverage",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("s_us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val clipped = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts").cast("timestamp")).as("s_us"),
            (unix_micros(col("ts").cast("timestamp")) +
              greatest(lit(1L), ceil(col("value")).cast("long")) * 60000000L)
              .as("e_us"))
          .withColumn("prev_end", max(col("e_us")).over(w))
          .withColumn("add_us",
            greatest(lit(0L), col("e_us") -
              greatest(col("s_us"), coalesce(col("prev_end"), col("s_us")))))
        clipped.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("add_us")).as("cov_us"),
            (max(col("e_us")) - min(col("s_us"))).as("span_us"))
          // INTEGER division (div), not /: a double quotient could round
          // up across an integer boundary before the truncating cast
          .withColumn("covered_s", expr("cov_us div 1000000"))
          .withColumn("span_s", expr("span_us div 1000000"))
          .withColumn("coverage",
            col("covered_s").cast("double") / col("span_s"))
          .select(col("user_id"), col("n_events"), col("covered_s"),
            col("span_s"), col("coverage"))
          .orderBy(col("user_id"))
      },
      Some("""WITH iv AS (
             |  SELECT user_id, event_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS s_us,
             |    epoch_us(CAST(ts AS TIMESTAMP))
             |      + greatest(1, CAST(ceil(value) AS BIGINT)) * 60000000
             |      AS e_us
             |  FROM events),
             |clipped AS (
             |  SELECT *,
             |    max(e_us) OVER (PARTITION BY user_id
             |      ORDER BY s_us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS prev_end
             |  FROM iv)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(greatest(0, e_us
             |    - greatest(s_us, coalesce(prev_end, s_us)))) // 1000000
             |    AS BIGINT) AS covered_s,
             |  CAST((max(e_us) - min(s_us)) // 1000000 AS BIGINT) AS span_s,
             |  (CAST(sum(greatest(0, e_us
             |    - greatest(s_us, coalesce(prev_end, s_us)))) // 1000000
             |    AS BIGINT))::DOUBLE
             |    / ((max(e_us) - min(s_us)) // 1000000) AS coverage
             |FROM clipped GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Herfindahl–Hirschman concentration of the token supply across
    // sources, with the effective source count 1/HHI — "is the corpus
    // really diverse, or three sources in a trenchcoat?" (the mixing
    // planners q133/q142 read this before reweighting). Counts exact;
    // the share-square sum is engine-ordered → float32.
    Entry("q304_hhi_concentration",
      (s, d) => {
        val g = Tables.documents(s, d)
          .select(col("source"), explode(Fns.tokens(col("text"))).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy(col("source")).agg(count(lit(1)).as("c"))
        val tot = g.agg(sum(col("c")).as("t"))
        val share = col("c").cast("double") / col("t")
        g.crossJoin(broadcast(tot))
          .agg(count(lit(1)).as("n_sources"),
            sum(share * share).as("hhi_d"))
          .select(col("n_sources"), col("hhi_d").cast("float").as("hhi"),
            (lit(1.0) / col("hhi_d")).cast("float").as("effective_sources"))
      },
      Some("""WITH g AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS c FROM (
             |    SELECT source, unnest(string_split(lower(text), ' ')) AS w
             |    FROM documents)
             |  WHERE length(w) > 0 GROUP BY source),
             |t AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM g)
             |SELECT count(*) AS n_sources,
             |  CAST(sum((c::DOUBLE / t) * (c::DOUBLE / t)) AS REAL) AS hhi,
             |  CAST(1.0 / sum((c::DOUBLE / t) * (c::DOUBLE / t)) AS REAL)
             |    AS effective_sources
             |FROM g CROSS JOIN t""".stripMargin)),

    // Decision-stump learner: the information gain of every "activity ≥ t"
    // split for predicting the error-heavy outcome, with the best split
    // flagged — the single-feature baseline every feature audit starts
    // from (and the WoE table's discrete cousin). Candidate thresholds =
    // the distinct activity values; left/right class counts come from ONE
    // cumulative pass over that relation (BSP prefix sum — the value
    // domain grows with the corpus), entropies are closed-form from exact
    // counts; ln → float32. The argmax rides an agg + broadcast join, not
    // a global window.
    Entry("q305_info_gain_split",
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("score"),
            (sum(when(col("event_type") === "error", 1L).otherwise(0L)) * 5 >
              count(lit(1))).as("pos"))
        val g = users.groupBy(col("score"))
          .agg(count(lit(1)).as("n_s"),
            sum(when(col("pos"), 1L).otherwise(0L)).as("pos_s"))
        // cumulative from the HIGH end: left split of "score >= t"
        val cum = PrefixSum.globalRunningSum(
          PrefixSum.globalRunningSum(g, Seq(desc("score")),
              col("n_s").cast("decimal(20,0)"))
            .withColumn("n_left", col("running").cast("long"))
            .drop("running"),
          Seq(desc("score")), col("pos_s").cast("decimal(20,0)"))
          .withColumn("pos_left", col("running").cast("long"))
          .drop("running")
        val tot = g.agg(sum(col("n_s")).as("n"), sum(col("pos_s")).as("npos"))
        def ent(p: org.apache.spark.sql.Column) =
          when(p > 0 && p < 1, -p * log(p) - (lit(1.0) - p) * log(lit(1.0) - p))
            .otherwise(0.0)
        val scored = cum.crossJoin(broadcast(tot))
          .withColumn("n_right", col("n") - col("n_left"))
          .withColumn("pos_right", col("npos") - col("pos_left"))
          .filter(col("n_right") > 0) // the lowest threshold splits nothing off
          .withColumn("ig_d",
            ent(col("npos").cast("double") / col("n")) -
              col("n_left").cast("double") / col("n") *
                ent(col("pos_left").cast("double") / col("n_left")) -
              col("n_right").cast("double") / col("n") *
                ent(col("pos_right").cast("double") / col("n_right")))
        val best = scored.agg(max(col("ig_d")).as("best_ig"))
        scored.crossJoin(broadcast(best))
          .select(col("score").as("threshold"), col("n_left"), col("pos_left"),
            col("ig_d").cast("float").as("info_gain"),
            (col("ig_d") === col("best_ig")).as("best"))
          .orderBy(col("threshold"))
      },
      Some("""WITH users AS (
             |  SELECT user_id, count(*) AS score,
             |    5 * count(CASE WHEN event_type = 'error' THEN 1 END)
             |      > count(*) AS pos
             |  FROM events GROUP BY user_id),
             |g AS (
             |  SELECT score, CAST(count(*) AS BIGINT) AS n_s,
             |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS pos_s
             |  FROM users GROUP BY score),
             |cum AS (
             |  SELECT score,
             |    CAST(sum(n_s) OVER (ORDER BY score DESC) AS BIGINT)
             |      AS n_left,
             |    CAST(sum(pos_s) OVER (ORDER BY score DESC) AS BIGINT)
             |      AS pos_left
             |  FROM g),
             |t AS (SELECT CAST(sum(n_s) AS BIGINT) AS n,
             |             CAST(sum(pos_s) AS BIGINT) AS npos FROM g),
             |scored AS (
             |  SELECT score, n_left, pos_left,
             |    (CASE WHEN npos > 0 AND npos < n
             |       THEN -(npos::DOUBLE / n) * ln(npos::DOUBLE / n)
             |          - (1.0 - npos::DOUBLE / n) * ln(1.0 - npos::DOUBLE / n)
             |       ELSE 0.0 END)
             |    - n_left::DOUBLE / n *
             |      (CASE WHEN pos_left > 0 AND pos_left < n_left
             |        THEN -(pos_left::DOUBLE / n_left)
             |            * ln(pos_left::DOUBLE / n_left)
             |          - (1.0 - pos_left::DOUBLE / n_left)
             |            * ln(1.0 - pos_left::DOUBLE / n_left)
             |        ELSE 0.0 END)
             |    - (n - n_left)::DOUBLE / n *
             |      (CASE WHEN npos - pos_left > 0 AND npos - pos_left < n - n_left
             |        THEN -((npos - pos_left)::DOUBLE / (n - n_left))
             |            * ln((npos - pos_left)::DOUBLE / (n - n_left))
             |          - (1.0 - (npos - pos_left)::DOUBLE / (n - n_left))
             |            * ln(1.0 - (npos - pos_left)::DOUBLE / (n - n_left))
             |        ELSE 0.0 END) AS ig_d
             |  FROM cum CROSS JOIN t WHERE n - n_left > 0),
             |best AS (SELECT max(ig_d) AS best_ig FROM scored)
             |SELECT score AS threshold, n_left, pos_left,
             |  CAST(ig_d AS REAL) AS info_gain, ig_d = best_ig AS best
             |FROM scored CROSS JOIN best ORDER BY threshold""".stripMargin)),

    // Smoothed target encoding of event_type against the high-value
    // outcome (value above the exact corpus mean): te = (pos_c + m·prior)
    // / (n_c + m) with m = 10 — the leakage-resistant categorical feature
    // every tabular model starts with. The mean rides an exact decimal
    // sum so the outcome labels can never straddle engines; everything
    // after is exact counts + single divisions (full doubles).
    Entry("q306_target_encoding",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("value"))
        val mean = ev.agg(
          (sum(col("value").cast("decimal(20,6)")).cast("double") /
            count(lit(1))).as("mu"))
        val labeled = ev.crossJoin(broadcast(mean))
          .withColumn("pos", col("value") > col("mu"))
        val g = labeled.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
        val prior = g.agg(sum(col("n")).as("nt"), sum(col("n_pos")).as("pt"))
        g.crossJoin(broadcast(prior))
          .select(col("event_type"), col("n"), col("n_pos"),
            (col("n_pos").cast("double") / col("n")).as("raw_rate"),
            ((col("n_pos").cast("double") +
              lit(10.0) * (col("pt").cast("double") / col("nt"))) /
              (col("n") + lit(10L))).as("te_smoothed"))
          .orderBy(col("event_type"))
      },
      Some("""WITH mu AS (
             |  SELECT sum(CAST(value AS DECIMAL(20,6)))::DOUBLE / count(*)
             |    AS mu
             |  FROM events),
             |g AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN value > mu THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_pos
             |  FROM events CROSS JOIN mu GROUP BY event_type),
             |p AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
             |             CAST(sum(n_pos) AS BIGINT) AS pt FROM g)
             |SELECT event_type, n, n_pos,
             |  n_pos::DOUBLE / n AS raw_rate,
             |  (n_pos::DOUBLE + 10.0 * (pt::DOUBLE / nt)) / (n + 10)
             |    AS te_smoothed
             |FROM g CROSS JOIN p ORDER BY event_type""".stripMargin)),

    // Hash-fold split stability: five md5-keyed folds of the corpus, per-
    // fold mean quality and length, and the max−min fold drift — if a
    // random 20% slice moves the metric, per-fold eval numbers are noise,
    // not signal. Fold routing is engine-portable md5; means sum doubles
    // → float32; drift from the 5-row fold relation.
    Entry("q307_split_stability",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import graft.ops.TextAnalysis
        val docs = Tables.documents(s, d)
        val q = TextAnalysis.quality(docs, "doc_id", "text")
          .select(col("doc_id"), col("quality"))
          .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
          .withColumn("fold",
            pmod(ascii(substring(md5(col("doc_id").cast("string")), 1, 1)),
              lit(5)))
        val g = q.groupBy(col("fold"))
          .agg(count(lit(1)).as("n"),
            avg(col("quality")).as("mq_d"),
            avg(col("n_chars")).as("mc_d"))
        val wAll = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        g.withColumn("quality_drift",
            (max(col("mq_d")).over(wAll) - min(col("mq_d")).over(wAll))
              .cast("float"))
          .select(col("fold"), col("n"),
            col("mq_d").cast("float").as("mean_quality"),
            col("mc_d").cast("float").as("mean_chars"),
            col("quality_drift"))
          .orderBy(col("fold"))
      },
      Some {
        val stop = graft.ops.TextAnalysis.langMarkers.values.flatten.toSeq
          .distinct.sorted.map(m => s"'$m'").mkString(", ")
        s"""WITH t AS (
           |  SELECT doc_id, n_chars, string_split(lower(text), ' ') AS toks
           |  FROM documents),
           |f AS (
           |  SELECT doc_id, n_chars,
           |    CAST(len(toks) AS BIGINT) AS n_tokens,
           |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           |    CAST(len(list_filter(toks, x -> list_contains([$stop], x)))
           |      AS BIGINT) AS n_stop
           |  FROM t),
           |qual AS (
           |  SELECT doc_id, n_chars,
           |    0.4 * least(1.0, n_tokens / 64.0)
           |      + 0.3 * (n_distinct::DOUBLE / n_tokens)
           |      + 0.3 * (1.0 - n_stop::DOUBLE / n_tokens) AS quality,
           |    ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 5 AS fold
           |  FROM f),
           |g AS (
           |  SELECT fold, CAST(count(*) AS BIGINT) AS n,
           |    avg(quality) AS mq_d, avg(n_chars) AS mc_d
           |  FROM qual GROUP BY fold)
           |SELECT fold, n, CAST(mq_d AS REAL) AS mean_quality,
           |  CAST(mc_d AS REAL) AS mean_chars,
           |  CAST(max(mq_d) OVER () - min(mq_d) OVER () AS REAL)
           |    AS quality_drift
           |FROM g ORDER BY fold""".stripMargin
      }),

    // Pairwise vocabulary overlap between sources (token-set Jaccard) —
    // which sources are restatements of each other BEFORE document-level
    // dedup ever runs. The pair terms come from the token-keyed join of
    // distinct (source, token) rows — Σ per-token source-pair work, never
    // |sources|² × vocab. Exact counts and one division.
    Entry("q308_vocab_overlap",
      (s, d) => {
        val st = Tables.documents(s, d)
          .select(col("source"), explode(Fns.tokens(col("text"))).as("w"))
          .filter(length(col("w")) > 0)
          .distinct().localCheckpoint(true) // feeds sizes + both join legs
        val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("nv"))
        val inter = st.select(col("source").as("source_a"), col("w"))
          .join(st.select(col("source").as("source_b"), col("w")), Seq("w"))
          .filter(col("source_a") < col("source_b"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(sizes.select(col("source").as("source_a"),
            col("nv").as("na")), "source_a")
          .join(sizes.select(col("source").as("source_b"),
            col("nv").as("nb")), "source_b")
          .select(col("source_a"), col("source_b"), col("inter"),
            (col("na") + col("nb") - col("inter")).as("union_sz"),
            (col("inter").cast("double") /
              (col("na") + col("nb") - col("inter"))).as("jaccard"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some("""WITH st AS (
             |  SELECT DISTINCT source, w FROM (
             |    SELECT source, unnest(string_split(lower(text), ' ')) AS w
             |    FROM documents)
             |  WHERE length(w) > 0),
             |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS nv
             |          FROM st GROUP BY source),
             |inter AS (
             |  SELECT a.source AS source_a, b.source AS source_b,
             |    CAST(count(*) AS BIGINT) AS inter
             |  FROM st a JOIN st b ON a.w = b.w AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT source_a, source_b, inter,
             |  na.nv + nb.nv - inter AS union_sz,
             |  inter::DOUBLE / (na.nv + nb.nv - inter) AS jaccard
             |FROM inter
             |JOIN sizes na ON na.source = source_a
             |JOIN sizes nb ON nb.source = source_b
             |ORDER BY source_a, source_b""".stripMargin)),

    // Nelson–Aalen cumulative hazard over the q290 lifetimes — the
    // additive (hazard-space) twin of the Kaplan–Meier product: H(t) =
    // Σ_{t'≤t} d/n is what hazard-regression models consume. Per-duration
    // hazards are single exact divisions; the cumulative rides the BSP
    // prefix sum in decimal, emitted float32.
    Entry("q309_nelson_aalen",
      (s, d) => {
        val horizon = 12L * 3600000000L
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            unix_micros(col("ts").cast("timestamp")).as("us"))
        val corpusMax = ev.agg(max(col("us")).as("max_us"))
        val life = ev.groupBy(col("user_id"))
          .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
          .crossJoin(broadcast(corpusMax))
          .select(expr("(last_us - first_us) div 86400000000").as("dur_d"),
            when(col("max_us") - col("last_us") > horizon, 1L).otherwise(0L)
              .as("died"))
        val byDur = life.groupBy(col("dur_d"))
          .agg(sum(col("died")).as("d_events"), count(lit(1)).as("ct"))
        val nTot = byDur.agg(sum(col("ct")).as("n_total"))
        val risk = PrefixSum.globalRunningSum(byDur, Seq(col("dur_d")),
            col("ct").cast("decimal(20,0)"))
          .crossJoin(broadcast(nTot))
          .withColumn("n_risk",
            col("n_total") - col("running").cast("long") + col("ct"))
          .drop("running")
          .withColumn("hazard",
            col("d_events").cast("double") / col("n_risk"))
        PrefixSum.globalRunningSum(risk, Seq(col("dur_d")),
            col("hazard").cast("decimal(30,15)"))
          .withColumn("cum_hazard", col("running").cast("double").cast("float"))
          .filter(col("d_events") > 0)
          .select(col("dur_d"), col("n_risk"), col("d_events"),
            col("hazard"), col("cum_hazard"))
          .orderBy(col("dur_d"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
             |  FROM events),
             |mx AS (SELECT max(us) AS max_us FROM ev),
             |life AS (
             |  SELECT (max(us) - min(us)) // 86400000000 AS dur_d,
             |    CASE WHEN (SELECT max_us FROM mx) - max(us) > 43200000000
             |      THEN 1 ELSE 0 END AS died
             |  FROM ev GROUP BY user_id),
             |byd AS (
             |  SELECT dur_d, CAST(sum(died) AS BIGINT) AS d_events,
             |    CAST(count(*) AS BIGINT) AS ct
             |  FROM life GROUP BY dur_d),
             |t AS (SELECT CAST(sum(ct) AS BIGINT) AS n_total FROM byd),
             |risk AS (
             |  SELECT *,
             |    (SELECT n_total FROM t)
             |      - CAST(sum(ct) OVER (ORDER BY dur_d) AS BIGINT) + ct
             |      AS n_risk
             |  FROM byd),
             |haz AS (
             |  SELECT *, d_events::DOUBLE / n_risk AS hazard FROM risk)
             |SELECT dur_d, n_risk, d_events, hazard,
             |  CAST(CAST(sum(CAST(hazard AS DECIMAL(30,15)))
             |    OVER (ORDER BY dur_d) AS DOUBLE) AS REAL) AS cum_hazard
             |FROM haz WHERE d_events > 0 ORDER BY dur_d""".stripMargin)),

    // Character-class profile per source: upper-case, digit, punctuation
    // and whitespace character shares — the cheap curation columns that
    // catch ALL-CAPS spam, number dumps and markup residue before any
    // model-based scoring. Counts via regex-strip length differences
    // (identical regex engines on ASCII classes); exact integers and
    // single divisions.
    Entry("q310_casing_profile",
      (s, d) => {
        def cnt(pat: String) =
          (length(col("text")) -
            length(regexp_replace(col("text"), pat, ""))).cast("long")
        val g = Tables.documents(s, d)
          .select(col("source"), length(col("text")).cast("long").as("nc"),
            cnt("[A-Z]").as("upper"), cnt("[0-9]").as("digit"),
            cnt("[^A-Za-z0-9 ]").as("punct"), cnt(" ").as("space"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("n_chars"),
            sum(col("upper")).as("u"), sum(col("digit")).as("dg"),
            sum(col("punct")).as("p"), sum(col("space")).as("sp"))
        g.select(col("source"), col("n_docs"), col("n_chars"),
            (col("u").cast("double") / col("n_chars")).as("upper_ratio"),
            (col("dg").cast("double") / col("n_chars")).as("digit_ratio"),
            (col("p").cast("double") / col("n_chars")).as("punct_ratio"),
            (col("sp").cast("double") / col("n_chars")).as("space_ratio"))
          .orderBy(col("source"))
      },
      Some("""WITH g AS (
             |  SELECT source,
             |    CAST(length(text) AS BIGINT) AS nc,
             |    CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
             |      AS BIGINT) AS u,
             |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
             |      AS BIGINT) AS dg,
             |    CAST(length(text)
             |      - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))
             |      AS BIGINT) AS p,
             |    CAST(length(text) - length(regexp_replace(text, ' ', '', 'g'))
             |      AS BIGINT) AS sp
             |  FROM documents)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(nc) AS BIGINT) AS n_chars,
             |  sum(u)::DOUBLE / sum(nc) AS upper_ratio,
             |  sum(dg)::DOUBLE / sum(nc) AS digit_ratio,
             |  sum(p)::DOUBLE / sum(nc) AS punct_ratio,
             |  sum(sp)::DOUBLE / sum(nc) AS space_ratio
             |FROM g GROUP BY source ORDER BY source""".stripMargin)),

    // Template-head detection: documents sharing their first five tokens
    // — the cheapest boilerplate-family finder (form letters, scraped
    // templates, generated spam share heads long before they share whole
    // shingle sets). One prefix groupBy; heads hitting ≥ 3 docs emit with
    // an example doc. Exact counts.
    Entry("q311_template_heads",
      (s, d) => {
        val heads = Tables.documents(s, d)
          .select(col("doc_id"), Fns.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 5)
          .select(col("doc_id"),
            array_join(slice(col("toks"), 1, 5), " ").as("head"))
        heads.groupBy(col("head"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("example_doc"))
          .filter(col("n_docs") >= 3)
          .orderBy(desc("n_docs"), col("head"))
      },
      Some("""WITH heads AS (
             |  SELECT doc_id,
             |    array_to_string(t[1:5], ' ') AS head
             |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
             |        FROM documents)
             |  WHERE len(t) >= 5)
             |SELECT head, CAST(count(*) AS BIGINT) AS n_docs,
             |  min(doc_id) AS example_doc
             |FROM heads GROUP BY head HAVING count(*) >= 3
             |ORDER BY n_docs DESC, head""".stripMargin)),

    // Degree assortativity of the co-purchase graph (q216's edges): the
    // Pearson correlation of endpoint degrees over the directed edge list
    // — positive means hubs buddy with hubs (retail graphs are usually
    // DISassortative, which is why hub-aware partitioning pays). Exact
    // integer power sums over edges; one closed-form correlation.
    Entry("q312_assortativity",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        val edges = graft.ops.GraphAnalytics.coOccurrenceEdges(li, "l_orderkey", "l_partkey", 2)
          .select(col("src"), col("dst"))
          .localCheckpoint(true) // feeds degrees AND the directed expansion
        val deg = edges.select(col("src").as("id"))
          .union(edges.select(col("dst").as("id")))
          .groupBy(col("id")).agg(count(lit(1)).as("deg"))
        val directed = edges
          .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
        val pairs = directed
          .join(deg.select(col("id").as("src"), col("deg").as("dx")), "src")
          .join(deg.select(col("id").as("dst"), col("deg").as("dy")), "dst")
        val a = pairs.agg(count(lit(1)).as("m"),
          sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
          sum(col("dx") * col("dy")).as("sxy"),
          sum(col("dx") * col("dx")).as("sxx"),
          sum(col("dy") * col("dy")).as("syy"))
        a.select(col("m"),
          ((col("m").cast("double") * col("sxy") - col("sx").cast("double") * col("sy")) /
            sqrt((col("m").cast("double") * col("sxx") -
              col("sx").cast("double") * col("sx")) *
              (col("m").cast("double") * col("syy") -
                col("sy").cast("double") * col("sy"))))
            .as("assortativity"))
      },
      Some("""WITH e AS (
             |  SELECT src, dst FROM (
             |    SELECT x.l_partkey AS src, y.l_partkey AS dst,
             |      count(*) AS n_co
             |    FROM lineitem x JOIN lineitem y
             |      ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
             |    GROUP BY 1, 2) WHERE n_co >= 2),
             |deg AS (
             |  SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
             |    SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
             |  GROUP BY id),
             |directed AS (
             |  SELECT src, dst FROM e
             |  UNION ALL SELECT dst, src FROM e),
             |pairs AS (
             |  SELECT a.deg AS dx, b.deg AS dy
             |  FROM directed
             |  JOIN deg a ON a.id = directed.src
             |  JOIN deg b ON b.id = directed.dst),
             |agg AS (
             |  SELECT CAST(count(*) AS BIGINT) AS m,
             |    CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
             |    CAST(sum(dx * dy) AS BIGINT) AS sxy,
             |    CAST(sum(dx * dx) AS BIGINT) AS sxx,
             |    CAST(sum(dy * dy) AS BIGINT) AS syy
             |  FROM pairs)
             |SELECT m,
             |  (m::DOUBLE * sxy - sx::DOUBLE * sy)
             |    / sqrt((m::DOUBLE * sxx - sx::DOUBLE * sx)
             |         * (m::DOUBLE * syy - sy::DOUBLE * sy)) AS assortativity
             |FROM agg""".stripMargin)),

    // Deterministic Poisson bootstrap CI for the mean event value: 32
    // replicas, each row's replica weight drawn from a QUANTIZED
    // Poisson(1) inverse-CDF over an md5-derived byte — fully
    // reproducible and bit-identical in any engine (the practical
    // requirement a sampled bootstrap can't meet). Replica means are
    // exact-decimal rationals; the band is the 2nd-smallest/2nd-largest
    // replica mean (a ~94% percentile-bootstrap interval at B = 32).
    Entry("q313_hash_bootstrap_ci",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val B = 32
        // byte ∈ [0,256): two md5 hex chars; Poisson(1) CDF quantized to
        // /256 steps: P(0)=.368→94, P(≤1)=.736→188, P(≤2)=.920→235,
        // P(≤3)=.981→251, P(≤4)=.996→255
        val byte = conv(substring(md5(concat(col("event_id"), lit("|"),
          col("b").cast("string"))), 1, 2), 16, 10).cast("int")
        val w = when(col("byte") < 94, 0L).when(col("byte") < 188, 1L)
          .when(col("byte") < 235, 2L).when(col("byte") < 251, 3L)
          .when(col("byte") < 255, 4L).otherwise(5L)
        val reps = Tables.events(s, d)
          .select(col("event_id"), col("value").cast("decimal(20,6)").as("v"),
            explode(sequence(lit(1), lit(B))).as("b"))
          .withColumn("byte", byte)
          .withColumn("w", w)
          .groupBy(col("b"))
          .agg((sum(col("w") * col("v")).cast("double") / sum(col("w")))
            .as("rep_mean"))
        val obs = Tables.events(s, d)
          .agg((sum(col("value").cast("decimal(20,6)")).cast("double") /
            count(lit(1))).as("mean_obs"))
        val ranked = reps.withColumn("rk",
          row_number().over(Window.orderBy(col("rep_mean"), col("b"))))
        ranked.crossJoin(broadcast(obs))
          .agg(max(col("mean_obs")).as("mean_obs"),
            count(lit(1)).as("n_reps"),
            max(when(col("rk") === 2, col("rep_mean"))).as("ci_lo"),
            max(when(col("rk") === B - 1, col("rep_mean"))).as("ci_hi"))
      },
      Some("""WITH reps AS (
             |  SELECT b,
             |    sum(w * v)::DOUBLE / sum(w) AS rep_mean
             |  FROM (
             |    SELECT b, CAST(value AS DECIMAL(20,6)) AS v,
             |      CASE WHEN byte < 94 THEN 0 WHEN byte < 188 THEN 1
             |        WHEN byte < 235 THEN 2 WHEN byte < 251 THEN 3
             |        WHEN byte < 255 THEN 4 ELSE 5 END AS w
             |    FROM (
             |      SELECT event_id, value, b,
             |        CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)
             |          || '|' || CAST(b AS VARCHAR)), 1, 2)) AS INT) AS byte
             |      FROM events, unnest(generate_series(1, 32)) AS t(b)))
             |  GROUP BY b),
             |obs AS (
             |  SELECT sum(CAST(value AS DECIMAL(20,6)))::DOUBLE / count(*)
             |    AS mean_obs
             |  FROM events),
             |ranked AS (
             |  SELECT *, row_number() OVER (ORDER BY rep_mean, b) AS rk
             |  FROM reps)
             |SELECT max(mean_obs) AS mean_obs,
             |  CAST(count(*) AS BIGINT) AS n_reps,
             |  max(CASE WHEN rk = 2 THEN rep_mean END) AS ci_lo,
             |  max(CASE WHEN rk = 31 THEN rep_mean END) AS ci_hi
             |FROM ranked CROSS JOIN obs""".stripMargin)),

    // Label-centroid separation matrix: between-centroid cosine for every
    // label pair next to each label's within-cohesion (mean member→
    // centroid cosine) — the embedding-space class-separability audit
    // (labels whose centroids cosine ≈ their within-cohesion are not
    // separable by any metric model). Centroids are per-dim float32 means
    // (the q236 pattern — f32 absorbs the sum-order drift), cosines are
    // the fixed-order double fold; the within means emit float32.
    Entry("q314_centroid_separation",
      (s, d) => {
        import graft.functions.VectorFunctions.cosineSim
        val emb = Tables.embeddings(s, d)
        val cent = emb
          .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy(col("label"), col("i")).agg(avg(col("x")).as("m"))
          .groupBy(col("label"))
          .agg(array_sort(collect_list(struct(col("i"), col("m"))))
            .as("pairs"))
          .select(col("label"),
            transform(col("pairs"), p => p.getField("m").cast("float"))
              .as("centroid"))
          .localCheckpoint(true) // feeds the within join AND the pair matrix
        val within = emb.join(broadcast(cent), "label")
          .withColumn("c", cosineSim(col("embedding"), col("centroid")))
          .groupBy(col("label")).agg(avg(col("c")).cast("float").as("within"))
        cent.select(col("label").as("label_a"), col("centroid").as("ca"))
          .join(cent.select(col("label").as("label_b"), col("centroid").as("cb")),
            col("label_a") < col("label_b"))
          .withColumn("between_cos", cosineSim(col("ca"), col("cb")))
          .join(broadcast(within.select(col("label").as("label_a"),
            col("within").as("within_a"))), "label_a")
          .join(broadcast(within.select(col("label").as("label_b"),
            col("within").as("within_b"))), "label_b")
          .select(col("label_a"), col("label_b"), col("between_cos"),
            col("within_a"), col("within_b"))
          .orderBy(col("label_a"), col("label_b"))
      },
      Some {
        val cosEC = OracleSql.cosine("e.embedding", "c.centroid")
        val cosAB = OracleSql.cosine("a.centroid", "b.centroid")
        s"""WITH cent AS (
           |  SELECT label, i, CAST(avg(embedding[i]::DOUBLE) AS REAL) AS m
           |  FROM embeddings,
           |    UNNEST(generate_series(1,
           |      (SELECT max(len(embedding)) FROM embeddings))) AS t(i)
           |  GROUP BY 1, 2),
           |c AS (SELECT label, list(m ORDER BY i) AS centroid
           |      FROM cent GROUP BY 1),
           |within AS (
           |  SELECT e.label, CAST(avg($cosEC) AS REAL) AS within
           |  FROM embeddings e JOIN c ON e.label = c.label
           |  GROUP BY e.label)
           |SELECT a.label AS label_a, b.label AS label_b,
           |  $cosAB AS between_cos,
           |  wa.within AS within_a, wb.within AS within_b
           |FROM c a JOIN c b ON a.label < b.label
           |JOIN within wa ON wa.label = a.label
           |JOIN within wb ON wb.label = b.label
           |ORDER BY label_a, label_b""".stripMargin
      }),

    // KNN label-margin audit: for a fixed probe set, the gap between the
    // best SAME-label neighbor and the best OTHER-label neighbor — the
    // metric-learning health readout (negative margin = the space
    // confuses that probe's class; the per-label negative-margin rate is
    // what triggers hard-negative mining, q134). Probe side is bounded
    // (50 ids) and broadcast; one corpus scan of fixed-order double
    // cosines; means emit float32, rates stay exact rationals.
    Entry("q315_knn_margin",
      (s, d) => {
        import graft.functions.VectorFunctions.cosineSim
        val emb = Tables.embeddings(s, d)
        val probes = emb.orderBy(col("vec_id")).limit(50)
          .select(col("vec_id").as("pid"), col("label").as("plabel"),
            col("embedding").as("pemb"))
        val scored = emb.crossJoin(broadcast(probes))
          .filter(col("vec_id") =!= col("pid"))
          .withColumn("cos", cosineSim(col("embedding"), col("pemb")))
        val perProbe = scored.groupBy(col("pid"), col("plabel"))
          .agg(max(when(col("label") === col("plabel"), col("cos"))).as("best_same"),
            max(when(col("label") =!= col("plabel"), col("cos"))).as("best_diff"))
          .withColumn("margin", col("best_same") - col("best_diff"))
        perProbe.groupBy(col("plabel").as("label"))
          .agg(count(lit(1)).as("n_probes"),
            avg(col("margin")).cast("float").as("mean_margin"),
            (sum(when(col("margin") < 0, 1L).otherwise(0L)).cast("double") /
              count(lit(1))).as("neg_margin_rate"))
          .orderBy(col("label"))
      },
      Some {
        val cos = OracleSql.cosine("e.embedding", "p.pemb")
        s"""WITH p AS (
           |  SELECT vec_id AS pid, label AS plabel, embedding AS pemb
           |  FROM embeddings ORDER BY vec_id LIMIT 50),
           |scored AS (
           |  SELECT p.pid, p.plabel, e.label, $cos AS cos
           |  FROM embeddings e CROSS JOIN p WHERE e.vec_id <> p.pid),
           |per AS (
           |  SELECT pid, plabel,
           |    max(CASE WHEN label = plabel THEN cos END) AS best_same,
           |    max(CASE WHEN label <> plabel THEN cos END) AS best_diff
           |  FROM scored GROUP BY 1, 2)
           |SELECT plabel AS label, CAST(count(*) AS BIGINT) AS n_probes,
           |  CAST(avg(best_same - best_diff) AS REAL) AS mean_margin,
           |  sum(CASE WHEN best_same - best_diff < 0 THEN 1 ELSE 0 END)
           |    ::DOUBLE / count(*) AS neg_margin_rate
           |FROM per GROUP BY plabel ORDER BY label""".stripMargin
      }),

    // Token entropy BY POSITION (1..10): template-heavy corpora collapse
    // early-position entropy (every doc opens with the same boilerplate)
    // long before whole-document statistics notice — the quantitative
    // twin of q311's template heads. Exact counts per (position, token);
    // ln → float32.
    Entry("q316_positional_entropy",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), Fns.tokens(col("text")).as("t"))
        val at = toks
          .select(explode(sequence(lit(1), lit(10))).as("pos"), col("t"))
          .filter(size(col("t")) >= col("pos"))
          .select(col("pos"), element_at(col("t"), col("pos")).as("w"))
        val g = at.groupBy(col("pos"), col("w")).agg(count(lit(1)).as("c"))
        val tot = g.groupBy(col("pos")).agg(sum(col("c")).as("n"),
          count(lit(1)).as("vocab"))
        val p = col("c").cast("double") / col("n")
        g.join(broadcast(tot), "pos")
          .groupBy(col("pos"))
          .agg(max(col("n")).as("n_docs"), max(col("vocab")).as("vocab"),
            sum(-p * log(p)).cast("float").as("entropy"))
          .orderBy(col("pos"))
      },
      Some("""WITH at AS (
             |  SELECT i AS pos, t[i] AS w FROM (
             |    SELECT string_split(lower(text), ' ') AS t FROM documents),
             |    unnest(generate_series(1, 10)) AS s(i)
             |  WHERE len(t) >= i),
             |g AS (SELECT pos, w, CAST(count(*) AS BIGINT) AS c
             |      FROM at GROUP BY 1, 2),
             |tot AS (SELECT pos, CAST(sum(c) AS BIGINT) AS n,
             |        CAST(count(*) AS BIGINT) AS vocab FROM g GROUP BY pos)
             |SELECT pos, max(n) AS n_docs, max(vocab) AS vocab,
             |  CAST(sum(-(c::DOUBLE / n) * ln(c::DOUBLE / n)) AS REAL)
             |    AS entropy
             |FROM g JOIN tot USING (pos) GROUP BY pos ORDER BY pos""".stripMargin)),

    // Two-feature OLS via the closed-form normal equations: quality ~
    // ln(chars) + type-token ratio — how much of the composite is
    // reconstructable from length plus lexical diversity (q295 fits
    // length alone)? One scan of power sums, a 2×2 solve in closed form;
    // coefficient/R² outputs are engine-ordered double sums → float32.
    // (The second feature must VARY: a constant regressor makes the
    // normal-equation determinant exactly 0 — ANSI Spark raises where
    // DuckDB would emit NaN.)
    Entry("q317_two_feature_ols",
      (s, d) => {
        import graft.ops.TextAnalysis
        val docs = Tables.documents(s, d)
        val ttr = size(array_distinct(filter(Fns.tokens(col("text")),
            t => length(t) > 0))).cast("double") /
          size(filter(Fns.tokens(col("text")), t => length(t) > 0))
        val feats = TextAnalysis.quality(docs, "doc_id", "text")
          .select(col("doc_id"), col("quality").as("y"))
          .join(docs.select(col("doc_id"), log(col("n_chars")).as("x1"),
            ttr.as("x2")), "doc_id")
        val a = feats.agg(count(lit(1)).as("n"),
          sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
          sum(col("x1") * col("x1")).as("s11"),
          sum(col("x2") * col("x2")).as("s22"),
          sum(col("x1") * col("x2")).as("s12"),
          sum(col("x1") * col("y")).as("s1y"),
          sum(col("x2") * col("y")).as("s2y"),
          sum(col("y") * col("y")).as("syy"))
        val n = col("n").cast("double")
        val c11 = col("s11") - col("s1") * col("s1") / n
        val c22 = col("s22") - col("s2") * col("s2") / n
        val c12 = col("s12") - col("s1") * col("s2") / n
        val c1y = col("s1y") - col("s1") * col("sy") / n
        val c2y = col("s2y") - col("s2") * col("sy") / n
        val cyy = col("syy") - col("sy") * col("sy") / n
        val det = c11 * c22 - c12 * c12
        val b1 = (c1y * c22 - c2y * c12) / det
        val b2 = (c2y * c11 - c1y * c12) / det
        a.select(col("n"),
          b1.cast("float").as("beta_len"),
          b2.cast("float").as("beta_punct"),
          ((col("sy") / n) - b1 * (col("s1") / n) - b2 * (col("s2") / n))
            .cast("float").as("intercept"),
          ((b1 * c1y + b2 * c2y) / cyy).cast("float").as("r2"))
      },
      Some {
        val stop = graft.ops.TextAnalysis.langMarkers.values.flatten.toSeq
          .distinct.sorted.map(m => s"'$m'").mkString(", ")
        s"""WITH t AS (
           |  SELECT doc_id, n_chars, text,
           |    string_split(lower(text), ' ') AS toks
           |  FROM documents),
           |f AS (
           |  SELECT doc_id, n_chars, text,
           |    CAST(len(toks) AS BIGINT) AS n_tokens,
           |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           |    CAST(len(list_filter(toks, x -> list_contains([$stop], x)))
           |      AS BIGINT) AS n_stop,
           |    CAST(len(list_filter(toks, x -> length(x) > 0)) AS BIGINT)
           |      AS nz_tokens,
           |    CAST(len(list_distinct(list_filter(toks, x -> length(x) > 0)))
           |      AS BIGINT) AS nz_distinct
           |  FROM t),
           |feats AS (
           |  SELECT
           |    0.4 * least(1.0, n_tokens / 64.0)
           |      + 0.3 * (n_distinct::DOUBLE / n_tokens)
           |      + 0.3 * (1.0 - n_stop::DOUBLE / n_tokens) AS y,
           |    ln(n_chars) AS x1,
           |    nz_distinct::DOUBLE / nz_tokens AS x2
           |  FROM f),
           |a AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |    sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
           |    sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
           |    sum(x1 * x2) AS s12, sum(x1 * y) AS s1y,
           |    sum(x2 * y) AS s2y, sum(y * y) AS syy
           |  FROM feats)
           |SELECT n,
           |  CAST(((s1y - s1 * sy / n) * (s22 - s2 * s2 / n)
           |      - (s2y - s2 * sy / n) * (s12 - s1 * s2 / n))
           |    / ((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n)
           |      - (s12 - s1 * s2 / n) * (s12 - s1 * s2 / n)) AS REAL)
           |    AS beta_len,
           |  CAST(((s2y - s2 * sy / n) * (s11 - s1 * s1 / n)
           |      - (s1y - s1 * sy / n) * (s12 - s1 * s2 / n))
           |    / ((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n)
           |      - (s12 - s1 * s2 / n) * (s12 - s1 * s2 / n)) AS REAL)
           |    AS beta_punct,
           |  CAST(sy / n
           |    - (((s1y - s1 * sy / n) * (s22 - s2 * s2 / n)
           |        - (s2y - s2 * sy / n) * (s12 - s1 * s2 / n))
           |      / ((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n)
           |        - (s12 - s1 * s2 / n) * (s12 - s1 * s2 / n))) * (s1 / n)
           |    - (((s2y - s2 * sy / n) * (s11 - s1 * s1 / n)
           |        - (s1y - s1 * sy / n) * (s12 - s1 * s2 / n))
           |      / ((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n)
           |        - (s12 - s1 * s2 / n) * (s12 - s1 * s2 / n))) * (s2 / n)
           |    AS REAL) AS intercept,
           |  CAST(((((s1y - s1 * sy / n) * (s22 - s2 * s2 / n)
           |        - (s2y - s2 * sy / n) * (s12 - s1 * s2 / n))
           |      / ((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n)
           |        - (s12 - s1 * s2 / n) * (s12 - s1 * s2 / n)))
           |      * (s1y - s1 * sy / n)
           |    + (((s2y - s2 * sy / n) * (s11 - s1 * s1 / n)
           |        - (s1y - s1 * sy / n) * (s12 - s1 * s2 / n))
           |      / ((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n)
           |        - (s12 - s1 * s2 / n) * (s12 - s1 * s2 / n)))
           |      * (s2y - s2 * sy / n))
           |    / (syy - sy * sy / n) AS REAL) AS r2
           |FROM a""".stripMargin
      }),

    // One round of neighborhood mean-aggregation (the GNN message-passing
    // primitive) over the co-purchase graph, scored by Dirichlet energy:
    // how much smoother does the price signal get after one propagation?
    // Neighbor means clamp to float32 (absorbing per-node sum order)
    // before the energy sums, which emit float32 themselves. Joins only —
    // Σ deg work, never vertices².
    Entry("q318_feature_propagation",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
        val edges = graft.ops.GraphAnalytics.coOccurrenceEdges(li, "l_orderkey", "l_partkey", 2)
          .select(col("src"), col("dst"))
          .localCheckpoint(true) // feeds both energies + the propagation
        val f = Tables.part(s, d)
          .select(col("p_partkey").as("id"), col("p_retailprice").as("x"))
        val directed = edges
          .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
        val prop = directed
          .join(f.select(col("id").as("dst"), col("x").as("xn")), "dst")
          .groupBy(col("src").as("id"))
          .agg(avg(col("xn")).cast("float").as("px"))
        def energy(feat: org.apache.spark.sql.DataFrame, c: String) = edges
          .join(feat.select(col("id").as("src"), col(c).as("fa")), "src")
          .join(feat.select(col("id").as("dst"), col(c).as("fb")), "dst")
          .agg(count(lit(1)).as("m"),
            sum((col("fa") - col("fb")) * (col("fa") - col("fb"))).as("e"))
        val before = energy(f.withColumn("x0", col("x").cast("float")), "x0")
          .select(col("m").as("n_edges"), col("e").as("e_before"))
        val after = energy(prop, "px").select(col("e").as("e_after"))
        before.crossJoin(after)
          .select(col("n_edges"),
            col("e_before").cast("float").as("energy_before"),
            col("e_after").cast("float").as("energy_after"),
            (col("e_after") / col("e_before")).cast("float")
              .as("smoothing_ratio"))
      },
      Some("""WITH e AS (
             |  SELECT src, dst FROM (
             |    SELECT x.l_partkey AS src, y.l_partkey AS dst,
             |      count(*) AS n_co
             |    FROM lineitem x JOIN lineitem y
             |      ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
             |    GROUP BY 1, 2) WHERE n_co >= 2),
             |f AS (SELECT p_partkey AS id, p_retailprice AS x FROM part),
             |directed AS (
             |  SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
             |prop AS (
             |  SELECT directed.src AS id, CAST(avg(fn.x) AS REAL) AS px
             |  FROM directed JOIN f fn ON fn.id = directed.dst
             |  GROUP BY directed.src),
             |before_e AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_edges,
             |    sum((CAST(fa.x AS REAL) - CAST(fb.x AS REAL))
             |      * (CAST(fa.x AS REAL) - CAST(fb.x AS REAL))) AS e_before
             |  FROM e JOIN f fa ON fa.id = e.src JOIN f fb ON fb.id = e.dst),
             |after_e AS (
             |  SELECT sum((pa.px - pb.px) * (pa.px - pb.px)) AS e_after
             |  FROM e JOIN prop pa ON pa.id = e.src
             |  JOIN prop pb ON pb.id = e.dst)
             |SELECT n_edges, CAST(e_before AS REAL) AS energy_before,
             |  CAST(e_after AS REAL) AS energy_after,
             |  CAST(e_after / e_before AS REAL) AS smoothing_ratio
             |FROM before_e CROSS JOIN after_e""".stripMargin)),

    // Score-band monotonicity audit: the outcome rate should fall (or
    // rise) MONOTONICALLY across activity deciles for the score to be
    // rankable at all — each adjacent inversion (rate going the wrong way
    // between neighboring deciles) is a calibration defect the WoE table
    // (q289) can't see. Deciles via the BSP ntile; the adjacency join is
    // on the 10-row decile relation. Exact rationals.
    Entry("q319_rate_monotonicity",
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("score"),
            (sum(when(col("event_type") === "error", 1L).otherwise(0L)) * 5 >
              count(lit(1))).as("pos"))
        val g = PrefixSum.globalNtile(users, 10,
            Seq(desc("score"), col("user_id")), "decile")
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
          .withColumn("rate", col("n_pos").cast("double") / col("n"))
        val nxt = g.select((col("decile") - 1).as("decile"),
          col("rate").as("next_rate"))
        g.join(nxt, Seq("decile"), "left")
          .withColumn("inversion",
            col("next_rate").isNotNull && col("next_rate") > col("rate"))
          .select(col("decile"), col("n"), col("n_pos"), col("rate"),
            col("inversion"))
          .orderBy(col("decile"))
      },
      Some("""WITH users AS (
             |  SELECT user_id, count(*) AS score,
             |    5 * count(CASE WHEN event_type = 'error' THEN 1 END)
             |      > count(*) AS pos
             |  FROM events GROUP BY user_id),
             |g AS (
             |  SELECT decile, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_pos
             |  FROM (SELECT *, ntile(10) OVER (ORDER BY score DESC, user_id)
             |          AS decile FROM users)
             |  GROUP BY decile),
             |r AS (SELECT *, n_pos::DOUBLE / n AS rate FROM g)
             |SELECT a.decile, a.n, a.n_pos, a.rate,
             |  b.rate IS NOT NULL AND b.rate > a.rate AS inversion
             |FROM r a LEFT JOIN r b ON b.decile = a.decile + 1
             |ORDER BY a.decile""".stripMargin)),

    // Seasonality strength per event type: the share of hourly-count
    // variance explained by the (hour-of-day × day-of-week) profile —
    // R² of the seasonal means. Near 1 = a periodic signal worth
    // gap-filling around; near 0 = noise. Exact counts feed power sums;
    // the variance ratio sums engine-ordered doubles → float32.
    Entry("q320_seasonality_strength",
      (s, d) => {
        val hourly = Tables.events(s, d)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .groupBy(col("event_type"), col("h"))
          .agg(count(lit(1)).as("x"))
          .withColumn("hod", hour(col("h")))
          .withColumn("dow", dayofweek(col("h")) - 1)
        val cell = hourly.groupBy(col("event_type"), col("hod"), col("dow"))
          .agg(sum(col("x")).as("sx"), count(lit(1)).as("cn"))
          .withColumn("cell_mean", col("sx").cast("double") / col("cn"))
        val joined = hourly.join(cell, Seq("event_type", "hod", "dow"))
        val tot = hourly.groupBy(col("event_type"))
          .agg(sum(col("x")).as("st"), count(lit(1)).as("nt"))
          .withColumn("gmean", col("st").cast("double") / col("nt"))
        joined.join(broadcast(tot), "event_type")
          .groupBy(col("event_type"))
          .agg(max(col("nt")).as("n_hours"),
            (lit(1.0) -
              sum((col("x") - col("cell_mean")) * (col("x") - col("cell_mean"))) /
                sum((col("x") - col("gmean")) * (col("x") - col("gmean"))))
              .cast("float").as("seasonality_r2"))
          .orderBy(col("event_type"))
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, date_trunc('hour', ts) AS h,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |k AS (
             |  SELECT *, hour(h) AS hod, dayofweek(h) AS dow FROM hourly),
             |cell AS (
             |  SELECT event_type, hod, dow,
             |    sum(x)::DOUBLE / count(*) AS cell_mean
             |  FROM k GROUP BY 1, 2, 3),
             |tot AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
             |    sum(x)::DOUBLE / count(*) AS gmean
             |  FROM k GROUP BY 1)
             |SELECT event_type, max(n_hours) AS n_hours,
             |  CAST(1.0 - sum((x - cell_mean) * (x - cell_mean))
             |    / sum((x - gmean) * (x - gmean)) AS REAL)
             |    AS seasonality_r2
             |FROM k JOIN cell USING (event_type, hod, dow)
             |JOIN tot USING (event_type)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Bigram conditional entropy per source: H(w₂|w₁) = H(bigram) −
    // H(unigram) — the compressibility proxy (low conditional entropy =
    // predictable, template-like text; the per-source slice of what
    // q149's surprise scores per document). Map-side count aggs; ln →
    // float32.
    Entry("q321_bigram_cond_entropy",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), Fns.tokens(col("text")).as("t"))
        def ent(df: org.apache.spark.sql.DataFrame) = {
          val g = df.groupBy(col("source"), col("g")).agg(count(lit(1)).as("c"))
          val t = g.groupBy(col("source")).agg(sum(col("c")).as("n"))
          val p = col("c").cast("double") / col("n")
          g.join(broadcast(t), "source")
            .groupBy(col("source")).agg(sum(-p * log(p)).as("h"))
        }
        val uni = ent(toks.select(col("source"),
          explode(Fns.shingles(col("t"), 1)).as("g")))
          .withColumnRenamed("h", "h1")
        val bi = ent(toks.select(col("source"),
          explode(Fns.shingles(col("t"), 2)).as("g")))
          .withColumnRenamed("h", "h2")
        uni.join(bi, "source")
          .select(col("source"), col("h1").cast("float").as("h_unigram"),
            col("h2").cast("float").as("h_bigram"),
            (col("h2") - col("h1")).cast("float").as("h_cond"))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (
             |  SELECT source, string_split(lower(text), ' ') AS t
             |  FROM documents),
             |uni AS (
             |  SELECT source, w AS g FROM (
             |    SELECT source, unnest(t) AS w FROM t)),
             |bi AS (
             |  SELECT source, unnest(list_transform(
             |    generate_series(1, greatest(len(t) - 1, 0)),
             |    i -> t[i] || ' ' || t[i+1])) AS g
             |  FROM t),
             |h1 AS (
             |  SELECT source, sum(-(c::DOUBLE / n) * ln(c::DOUBLE / n)) AS h1
             |  FROM (SELECT source, g, CAST(count(*) AS BIGINT) AS c
             |        FROM uni GROUP BY 1, 2) x
             |  JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n
             |        FROM uni GROUP BY 1) y USING (source)
             |  GROUP BY source),
             |h2 AS (
             |  SELECT source, sum(-(c::DOUBLE / n) * ln(c::DOUBLE / n)) AS h2
             |  FROM (SELECT source, g, CAST(count(*) AS BIGINT) AS c
             |        FROM bi GROUP BY 1, 2) x
             |  JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n
             |        FROM bi GROUP BY 1) y USING (source)
             |  GROUP BY source)
             |SELECT source, CAST(h1 AS REAL) AS h_unigram,
             |  CAST(h2 AS REAL) AS h_bigram,
             |  CAST(h2 - h1 AS REAL) AS h_cond
             |FROM h1 JOIN h2 USING (source) ORDER BY source""".stripMargin)),

    // Day-over-day active-user stickiness: Jaccard of consecutive days'
    // active sets — the short-horizon retention series (WAU7 in q297
    // smooths exactly this signal away). One day+1 self-join of the
    // distinct (day, user) relation; exact counts.
    Entry("q322_dau_stickiness",
      (s, d) => {
        val du = Tables.events(s, d)
          .select(to_date(col("ts")).as("day"), col("user_id"))
          .distinct().localCheckpoint(true) // both join legs + sizes
        val sizes = du.groupBy(col("day")).agg(count(lit(1)).as("n"))
        val inter = du.select(col("day"), col("user_id"))
          .join(du.select(date_sub(col("day"), 1).as("day"), col("user_id")),
            Seq("day", "user_id"))
          .groupBy(col("day")).agg(count(lit(1)).as("inter"))
        sizes
          .join(sizes.select(date_sub(col("day"), 1).as("day"),
            col("n").as("n_next")), Seq("day"))
          .join(inter, Seq("day"), "left")
          .withColumn("inter", coalesce(col("inter"), lit(0L)))
          .select(col("day"), col("n").as("dau"), col("n_next").as("dau_next"),
            col("inter"),
            (col("inter").cast("double") /
              (col("n") + col("n_next") - col("inter"))).as("jaccard"))
          .orderBy(col("day"))
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
             |sizes AS (SELECT day, CAST(count(*) AS BIGINT) AS n
             |          FROM du GROUP BY day),
             |inter AS (
             |  SELECT a.day, CAST(count(*) AS BIGINT) AS inter
             |  FROM du a JOIN du b
             |    ON b.day = a.day + 1 AND b.user_id = a.user_id
             |  GROUP BY a.day)
             |SELECT a.day, a.n AS dau, b.n AS dau_next,
             |  coalesce(i.inter, 0) AS inter,
             |  coalesce(i.inter, 0)::DOUBLE
             |    / (a.n + b.n - coalesce(i.inter, 0)) AS jaccard
             |FROM sizes a JOIN sizes b ON b.day = a.day + 1
             |LEFT JOIN inter i ON i.day = a.day
             |ORDER BY a.day""".stripMargin)),

    // Discount elasticity: mean quantity per discount level plus the OLS
    // slope of that response curve — does a deeper discount actually move
    // volume? Level means are exact decimal rationals; the 11-point
    // regression is a closed-form slope over engine-identical doubles —
    // the slope emits float32 (level-mean sums are engine-ordered).
    Entry("q323_discount_elasticity",
      (s, d) => {
        val g = Tables.lineitem(s, d)
          .select(col("l_discount").cast("decimal(4,2)").as("disc"),
            col("l_quantity").cast("decimal(12,2)").as("q"))
          .groupBy(col("disc"))
          .agg(count(lit(1)).as("n"),
            (sum(col("q")).cast("double") / count(lit(1))).as("mean_qty"))
        val x = col("disc").cast("double")
        val a = g.agg(count(lit(1)).as("k"),
          sum(x).as("sx"), sum(col("mean_qty")).as("sy"),
          sum(x * col("mean_qty")).as("sxy"), sum(x * x).as("sxx"))
        val slope = (col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx"))
        g.crossJoin(broadcast(a.select(slope.cast("float").as("slope"))))
          .select(col("disc").cast("double").as("discount"), col("n"),
            col("mean_qty"), col("slope"))
          .orderBy(col("discount"))
      },
      Some("""WITH g AS (
             |  SELECT CAST(l_discount AS DECIMAL(4,2)) AS disc,
             |    CAST(count(*) AS BIGINT) AS n,
             |    sum(CAST(l_quantity AS DECIMAL(12,2)))::DOUBLE / count(*)
             |      AS mean_qty
             |  FROM lineitem GROUP BY 1),
             |a AS (
             |  SELECT CAST(count(*) AS BIGINT) AS k,
             |    sum(disc::DOUBLE) AS sx, sum(mean_qty) AS sy,
             |    sum(disc::DOUBLE * mean_qty) AS sxy,
             |    sum(disc::DOUBLE * disc::DOUBLE) AS sxx
             |  FROM g)
             |SELECT disc::DOUBLE AS discount, n, mean_qty,
             |  CAST((k * sxy - sx * sy) / (k * sxx - sx * sx) AS REAL)
             |    AS slope
             |FROM g CROSS JOIN a ORDER BY discount""".stripMargin))
  )
}
