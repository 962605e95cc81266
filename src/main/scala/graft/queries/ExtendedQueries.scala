package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, Rerank, Retrieval, Similarity}

/** Second coverage wave: OMO safety filter (F5), last-wins dedup (A2),
  * deterministic rerank (W5), projection/trim (F7), multi-space vector
  * fusion (V2), tumbling windows (§2.10), simhash-hamming near-dup,
  * id-list hydration with pointer chains (J1/J6), adaptive quota fill (W2).
  */
object ExtendedQueries {

  private def cosineSql(vecA: String, vecB: String): String =
    s"""list_sum(list_transform(generate_series(1, len($vecA)),
       |    i -> $vecA[i]::DOUBLE * $vecB[i]::DOUBLE))
       |  / (sqrt(list_sum(list_transform($vecA, x -> x::DOUBLE * x::DOUBLE)))
       |   * sqrt(list_sum(list_transform($vecB, x -> x::DOUBLE * x::DOUBLE))))""".stripMargin

  def entries: Seq[Entry] = Seq(

    // F5: OMO safety — consent gate + ordinal risk bound
    // (shared_types.py:2555+, memory_routes_v1.py:2000-2035). Consent/risk
    // synthesized deterministically from event columns.
    Entry("q38_omo_filter",
      (s, d) => Tables.events(s, d)
        .withColumn("consent",
          when(col("event_type") === "view", "none")
            .when(col("event_type") === "signup", "explicit")
            .when(col("event_type") === "purchase", "terms")
            .otherwise("implicit"))
        .withColumn("risk",
          when(col("value") > 400, "flagged")
            .when(col("value") > 300, "sensitive")
            .otherwise("none"))
        .filter(Retrieval.omoPredicate(col("consent"), col("risk"), "sensitive"))
        .select(col("event_id"), col("consent"), col("risk"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, consent, risk FROM (
             |  SELECT event_id,
             |    CASE WHEN event_type = 'view' THEN 'none'
             |         WHEN event_type = 'signup' THEN 'explicit'
             |         WHEN event_type = 'purchase' THEN 'terms'
             |         ELSE 'implicit' END AS consent,
             |    CASE WHEN value > 400 THEN 'flagged'
             |         WHEN value > 300 THEN 'sensitive'
             |         ELSE 'none' END AS risk
             |  FROM events)
             |WHERE consent <> 'none'
             |  AND (CASE risk WHEN 'none' THEN 0 WHEN 'sensitive' THEN 1 ELSE 2 END) <= 1
             |ORDER BY event_id""".stripMargin)),

    // A2: last-wins dedup by key — newest event per user
    // (memory_graph.py:9113-9115).
    Entry("q39_last_wins",
      (s, d) => Retrieval.lastWins(
          Tables.events(s, d).select(col("user_id"), col("event_id"), col("value"), col("ts")),
          "user_id", Seq(desc("ts"), desc("event_id")))
        .select(col("user_id"), col("event_id"), col("value"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, event_id, value FROM (
             |  SELECT user_id, event_id, value,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events) WHERE rn = 1
             |ORDER BY user_id""".stripMargin)),

    // W5: deterministic lexical rerank over a candidate set
    // (rerank stage of memory_graph.py:6931-7113; stub scorer per
    // tests/calculate_query_scores.py:18).
    Entry("q40_rerank_lexical",
      (s, d) => Rerank.rerank(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "text", "doc_id", query = "spark table join merge sort", k = 15)
        .select(col("doc_id"), col("rr_score"))
        .orderBy(desc("rr_score"), col("doc_id")),
      Some("""SELECT doc_id,
             |  len(list_intersect(list_distinct(string_split(lower(text), ' ')),
             |    ['join', 'merge', 'sort', 'spark', 'table'])) / 5.0 AS rr_score
             |FROM documents
             |ORDER BY rr_score DESC, doc_id LIMIT 15""".stripMargin)),

    // F7: projection/trim — bounded snippet of related content
    // (trim_and_filter_related_memories, memory_graph.py:5175).
    Entry("q41_trim_projection",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 100).as("snippet"),
          length(col("text")).cast("long").as("full_len"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, substr(text, 1, 100) AS snippet,
             |  CAST(length(text) AS BIGINT) AS full_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // V2: multi-space parallel search + fusion — same query in two embedding
    // spaces, union, keep best score per id (memory_graph.py:6085-6127;
    // second space simulated by component reversal).
    Entry("q42_multispace_fusion",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val corpusA = emb.filter(col("vec_id") =!= 0)
        val corpusB = corpusA.withColumn("embedding", reverse(col("embedding")))
        val qA = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
        val qB = qA.select(reverse(col("qvec")).as("qvec"))
        val hitsA = Similarity.knnCosine(corpusA, qA, "vec_id", "embedding", 30, -1.0)
        val hitsB = Similarity.knnCosine(corpusB, qB, "vec_id", "embedding", 30, -1.0)
        hitsA.unionByName(hitsB)
          .groupBy(col("vec_id")).agg(max(col("score")).as("score"))
          .orderBy(desc("score"), col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
              |spaceA AS (
              |  SELECT vec_id, round(${cosineSql("embedding", "qvec")}, 4) AS score
              |  FROM embeddings, q WHERE vec_id <> 0
              |  ORDER BY score DESC, vec_id LIMIT 30),
              |qb AS (SELECT list_reverse(qvec) AS qvec FROM q),
              |revb AS (SELECT vec_id, list_reverse(embedding) AS embedding
              |  FROM embeddings WHERE vec_id <> 0),
              |spaceB AS (
              |  SELECT vec_id, round(${cosineSql("embedding", "qvec")}, 4) AS score
              |  FROM revb, qb
              |  ORDER BY score DESC, vec_id LIMIT 30)
              |SELECT vec_id, max(score) AS score FROM (
              |  SELECT * FROM spaceA UNION ALL SELECT * FROM spaceB)
              |GROUP BY vec_id ORDER BY score DESC, vec_id LIMIT 10""".stripMargin)),

    // §2.10: tumbling-window aggregation over the event stream (batch twin
    // of the streaming windowed agg; epoch-aligned 6h windows).
    Entry("q43_tumbling_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "6 hours").as("w"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("w.start").as("ws"), col("n"), col("sum_value"))
        .orderBy(col("ws")),
      Some("""SELECT time_bucket(INTERVAL 6 HOUR, CAST(ts AS TIMESTAMP)) AS ws,
             |  count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY ws ORDER BY ws""".stripMargin)),

    // SimHash near-dup pairs by hamming distance on 16-bit fingerprints.
    Entry("q44_simhash_hamming",
      (s, d) => Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
        bits = 16, maxDist = 3),
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
             |  FROM documents),
             |th AS (SELECT doc_id,
             |  CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS h FROM tok),
             |votes AS (
             |  SELECT doc_id, bit,
             |    sum(CASE WHEN (h >> bit) % 2 = 1 THEN 1 ELSE -1 END) AS votes
             |  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bit) bits
             |  GROUP BY 1, 2),
             |sig AS (
             |  SELECT doc_id,
             |    CAST(sum(CASE WHEN votes > 0 THEN (CAST(1 AS BIGINT) << bit)
             |      ELSE 0 END) AS BIGINT) AS simhash
             |  FROM votes GROUP BY doc_id)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
             |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // J1/J6: id-list hydration with a two-level pointer chain
    // (fetch_memory_items_from_sources_mongo + parse_pointer,
    // memory_graph.py:7719-7860): top ids → row fetch → FK resolution.
    Entry("q45_hydrate_ids",
      (s, d) => {
        val ids = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
          .limit(20)
        ids.join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .select(col("o_orderkey"), col("c_name"), col("n_name"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH ids AS (
             |  SELECT o_orderkey, o_custkey FROM orders
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 20)
             |SELECT o_orderkey, c_name, n_name
             |FROM ids
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |ORDER BY o_orderkey""".stripMargin)),

    // W2: adaptive quota filling — per-source quota then global-score fill
    // of the remaining slots (memory_graph.py:6330-6372).
    Entry("q46_adaptive_fill",
      (s, d) => Retrieval.adaptiveFill(
          Tables.events(s, d).select(col("event_type"), col("event_id"), col("value")),
          "event_type", "value", "event_id", quota = 2, nSources = 5, totalK = 20)
        .select(col("event_type"), col("event_id"), col("value"))
        .orderBy(desc("value"), col("event_id")),
      Some("""WITH ranked AS (
             |  SELECT event_type, event_id, value,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY value DESC, event_id) AS rn
             |  FROM events),
             |base AS (SELECT event_type, event_id, value FROM ranked WHERE rn <= 2),
             |fill AS (
             |  SELECT event_type, event_id, value FROM ranked WHERE rn > 2
             |  ORDER BY value DESC, event_id LIMIT 10)
             |SELECT event_type, event_id, value FROM (
             |  SELECT * FROM base UNION ALL SELECT * FROM fill)
             |ORDER BY value DESC, event_id""".stripMargin)),

    // W7 (beyond parity, free via Catalyst): frame-spec window — per-user
    // running event count and running value sum in event-time order.
    Entry("q55_running_window",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("running_n", count(lit(1)).over(w))
          .withColumn("running_sum", round(sum(col("value")).over(w), 2))
          .select(col("user_id"), col("event_id"), col("running_n"), col("running_sum"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
             |  count(*) OVER w AS running_n,
             |  round(sum(value) OVER w, 2) AS running_sum
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),

    // Catalyst decorrelation (SURVEY §4 "free via Catalyst"), exercised
    // through the engine's SQL surface: orders more than 2× their own
    // customer's average — correlated scalar subquery → join rewrite.
    Entry("q57_correlated_subquery",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderkey FROM orders_v o
                |WHERE o_totalprice > 2 * (
                |  SELECT avg(o_totalprice) FROM orders_v o2
                |  WHERE o2.o_custkey = o.o_custkey)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey FROM orders o
             |WHERE o_totalprice > 2 * (
             |  SELECT avg(o_totalprice) FROM orders o2
             |  WHERE o2.o_custkey = o.o_custkey)
             |ORDER BY o_orderkey""".stripMargin)))
}
