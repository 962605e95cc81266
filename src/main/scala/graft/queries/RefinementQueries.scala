package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Curation, Dedup, GraphAnalytics}

/** Round-4 refinement set: the exact-recall scale path for set-similarity
  * joins (prefix filtering), leakage-safe dataset splitting, the per-source
  * dedup impact report, and the character-entropy quality gate. Every entry
  * is DuckDB-oracle-checked.
  */
object RefinementQueries {

  // DuckDB twin of Fns.hash60.
  private def h60(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  // Shared oracle CTEs: lowercased tokens and distinct 3-shingles (the
  // TextQueries fragment, repeated here because Scala objects don't share
  // private vals across files).
  private val shingleCtes: String =
    s"""toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
       |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
       |  FROM toks)""".stripMargin

  // Brute-force exact-Jaccard pair oracle at a given threshold. The ENGINE
  // runs the prefix-filtered plan; the oracle only has to agree on the
  // OUTPUT, so it can afford the simple inverted-index form.
  private def jaccardOracle(threshold: Double): String =
    s"""WITH $shingleCtes,
       |inter AS (
       |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS ninter
       |  FROM sh sa JOIN sh sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
       |SELECT i.doc_a, i.doc_b,
       |  ninter::DOUBLE / (na.n + nb.n - ninter) AS jaccard
       |FROM inter i
       |JOIN sizes na ON na.doc_id = i.doc_a
       |JOIN sizes nb ON nb.doc_id = i.doc_b
       |WHERE ninter::DOUBLE / (na.n + nb.n - ninter) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // Near-dup clusters (recursive-CTE connected components over exact
  // Jaccard ≥ 0.5 pairs) — the q56 oracle shape, reused by q190/q191.
  private val clusterCtes: String =
    s"""$shingleCtes,
       |inter AS (
       |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS ninter
       |  FROM sh sa JOIN sh sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
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
       |  SELECT a AS doc_id, least(a, min(b)) AS cluster FROM reach GROUP BY a),
       |assigned AS (
       |  SELECT d.doc_id, coalesce(comp.cluster, d.doc_id) AS cluster
       |  FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id)""".stripMargin

  def entries: Seq[Entry] = Seq(

    // Exact Jaccard self-join via prefix filtering (PPJoin family): same
    // output as q21's inverted-index join, but candidates are generated
    // ONLY from each doc's n−ceil(t·n)+1 globally-rarest shingles plus a
    // size-ratio prune — the exact-recall plan that survives stop-shingle
    // skew at 100 TB. The oracle is the brute-force form: output equality
    // IS the prefix-filter-lemma check.
    Entry("q189_prefix_filter_join",
      (s, d) => Dedup.prefixFilterJoin(Tables.documents(s, d), "doc_id", "text",
        shingleK = 3, threshold = 0.6),
      Some(jaccardOracle(0.6))),

    // Leakage-safe train/test split: near-dup clusters (exact Jaccard ≥ 0.5
    // + connected components) assigned WHOLLY to one split by hashing the
    // cluster representative — eval can never contain a near-copy of a
    // training doc. Singletons hash their own id.
    Entry("q190_cluster_safe_split",
      (s, d) => Dedup.leakageSafeSplit(Tables.documents(s, d), "doc_id",
        Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text", 3, 0.5)
          .select(col("doc_a"), col("doc_b")),
        trainPct = 80),
      Some(s"""WITH RECURSIVE $clusterCtes
              |SELECT doc_id, cluster,
              |  CASE WHEN ${h60("CAST(cluster AS VARCHAR)")} % 100 < 80
              |    THEN 'train' ELSE 'test' END AS split
              |FROM assigned ORDER BY doc_id""".stripMargin)),

    // Per-source dedup impact report: doc/token keep rates after near-dup
    // clustering (canonical survivor = cluster min). The numbers a mixture
    // planner needs before weighting sources. All counts exact; the two
    // rates are single divisions.
    Entry("q191_dedup_impact",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Curation.dedupImpact(docs, "doc_id", "text", "source",
          GraphAnalytics.dedupClusters(
            Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
              .select(col("doc_a"), col("doc_b"))))
      },
      Some(s"""WITH RECURSIVE $clusterCtes,
              |tok AS (
              |  SELECT doc_id, source,
              |    len(list_filter(string_split(lower(text), ' '),
              |      x -> length(x) > 0))::BIGINT AS n_tokens
              |  FROM documents),
              |j AS (
              |  SELECT tok.source, tok.n_tokens,
              |    (assigned.cluster = tok.doc_id) AS kept
              |  FROM tok JOIN assigned USING (doc_id))
              |SELECT source, count(*) AS n_docs,
              |  sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
              |  sum(CASE WHEN kept THEN 1 ELSE 0 END)::DOUBLE / count(*) AS keep_rate,
              |  sum(n_tokens)::BIGINT AS tokens_total,
              |  sum(CASE WHEN kept THEN n_tokens ELSE 0 END)::BIGINT AS tokens_kept,
              |  (sum(n_tokens) - sum(CASE WHEN kept THEN n_tokens ELSE 0 END))::DOUBLE
              |    / sum(n_tokens) AS token_loss_rate
              |FROM j GROUP BY source ORDER BY source""".stripMargin)),

    // Character-level Shannon entropy — the compressibility/gibberish gate.
    // Exact char counts; ln-based arithmetic; float32 at the emit boundary
    // absorbs partition-order sum drift.
    Entry("q192_char_entropy",
      (s, d) => Curation.charEntropy(Tables.documents(s, d), "doc_id", "text"),
      Some("""WITH ch AS (
             |  SELECT doc_id, substr(text, i, 1) AS ch
             |  FROM documents, unnest(generate_series(1, length(text))) AS u(i)),
             |c AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
             |a AS (SELECT doc_id, sum(c)::BIGINT AS n_chars,
             |        count(*) AS distinct_chars, sum(c * ln(c)) AS clog
             |      FROM c GROUP BY 1)
             |SELECT doc_id, n_chars, distinct_chars,
             |  CAST((ln(n_chars) - clog / n_chars) / ln(2) AS REAL) AS entropy
             |FROM a ORDER BY doc_id""".stripMargin))
  )
}
