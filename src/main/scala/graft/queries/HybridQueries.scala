package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.engine.HashEmbedder
import graft.functions.Fns
import graft.multimodal.Multimodal
import graft.ops.Retrieval

/** Hybrid retrieval and training-corpus hygiene operators:
  *
  *  - q116: hybrid lexical+vector search — BM25 and whole-document cosine
  *    legs fused by reciprocal rank (the standard two-tower hybrid stack;
  *    the reference runs lexical rerank features next to its vector
  *    sources, memory_graph.py:7001-7090 — here both legs are first-class
  *    and rank-fused so score scales never need calibration);
  *  - q117: benchmark-contamination detection — eval-split documents
  *    sharing an 8-token n-gram with any train-split document, via an
  *    inverted-index join (pairs materialize only on shared n-grams — the
  *    shape that survives a 100 TB train corpus);
  *  - q118: multimodal frame sampling — the video-decode batch stage
  *    (deterministic stub decoder) with frame grid, timestamps, and the
  *    first feature component oracle-checked in SQL via sha-256.
  */
object HybridQueries {

  private val hybridTerms = Seq("query", "merge", "vector")

  def entries: Seq[Entry] = Seq(

    Entry("q116_hybrid_search",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val lex = Retrieval.bm25TopK(docs, "doc_id", "text", hybridTerms, k = 30)
        val emb = docs.select(col("doc_id"), col("text"))
          .as[(Long, String)].mapPartitions { it =>
            val e = new HashEmbedder(64)     // one embedder per partition
            it.map { case (id, t) => (id, e.embed(t)) }
          }.toDF("doc_id", "embedding")
        val qv = typedLit(new HashEmbedder(64).embed(hybridTerms.mkString(" ")))
        import graft.functions.VectorFunctions._
        val vec = emb.withColumn("score", cosineSim(col("embedding"), qv))
          .select(col("doc_id"), col("score"))
          .orderBy(desc("score"), col("doc_id"))
          .limit(30)
        Retrieval.rrfFuse(Seq(lex, vec), "doc_id")
          .orderBy(desc("rrf"), col("doc_id"))
          .limit(20)
      },
      Some {
        val terms = hybridTerms
        val tfCols = terms.zipWithIndex.map { case (t, i) =>
          s"sum(CASE WHEN token = '$t' THEN 1 ELSE 0 END) AS tf_$i"
        }.mkString(",\n    ")
        val dfCols = terms.indices.map(i =>
          s"sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i").mkString(",\n    ")
        val score = terms.indices.map(i =>
          s"""ln(1 + (n_docs - CAST(df_$i AS DOUBLE) + 0.5) / (CAST(df_$i AS DOUBLE) + 0.5))
             |      * CAST(tf_$i AS DOUBLE) * (1.2 + 1)
             |      / (CAST(tf_$i AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))""".stripMargin)
          .mkString("\n    + ")
        val qvec = OracleSql.vecLit(new HashEmbedder(64).embed(terms.mkString(" ")))
        s"""WITH tok AS (
           |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
           |  FROM documents),
           |perdoc AS (
           |  SELECT doc_id, count(*) AS dl,
           |    $tfCols
           |  FROM tok GROUP BY doc_id),
           |stats AS (
           |  SELECT count(*) AS n_docs, avg(dl) AS avgdl,
           |    $dfCols
           |  FROM perdoc),
           |lex AS (
           |  SELECT doc_id, $score AS score
           |  FROM perdoc, stats
           |  WHERE $score > 0
           |  ORDER BY score DESC, doc_id LIMIT 30),
           |lexr AS (
           |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
           |  FROM lex),
           |dsrc AS (SELECT doc_id AS id, text AS txt FROM documents),
           |${OracleSql.embedCtes("dsrc", 64, "demb")},
           |vec AS (
           |  SELECT id AS doc_id, ${OracleSql.cosine("emb", qvec)} AS score
           |  FROM demb
           |  ORDER BY score DESC, doc_id LIMIT 30),
           |vecr AS (
           |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
           |  FROM vec)
           |SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
           |  coalesce(1.0 / (60 + l.r), 0) + coalesce(1.0 / (60 + v.r), 0) AS rrf
           |FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id
           |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
      }),

    // Train/eval n-gram contamination: the classic 8-gram overlap detector
    // (benchmark leakage hygiene). Inverted-index join on the n-gram —
    // candidate pairs exist only where an n-gram is shared, never an
    // eval×train product.
    Entry("q117_contamination",
      (s, d) => {
        val evalSources = Seq("src0", "src1", "src2", "src3", "src4")
        // tokens materialized in their OWN projection first: the shingle
        // higher-order function is interpreted and would re-run
        // split(lower(text)) once per output element otherwise
        val sh = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), Fns.tokens(col("text")).as("t"))
          .select(col("doc_id"), col("source"),
            explode(Fns.shingles(col("t"), 8)).as("ng"))
          .distinct()
        val evalSh = sh.filter(col("source").isin(evalSources: _*))
        val trainSh = sh.filter(!col("source").isin(evalSources: _*))
          .select(col("ng"), col("doc_id").as("train_id"))
        evalSh.join(trainSh, Seq("ng"))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("ng")).as("shared_ngrams"),
            countDistinct(col("train_id")).as("n_train_docs"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source, string_split(lower(text), ' ') AS tk
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, source, array_to_string(tk[i:i+7], ' ') AS ng
             |  FROM t, LATERAL (SELECT unnest(generate_series(1,
             |         greatest(len(tk) - 7, 0))) AS i) g
             |  WHERE len(tk) >= 8),
             |ev AS (SELECT * FROM sh
             |       WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')),
             |tr AS (SELECT * FROM sh
             |       WHERE source NOT IN ('src0', 'src1', 'src2', 'src3', 'src4'))
             |SELECT e.doc_id, count(DISTINCT e.ng) AS shared_ngrams,
             |  count(DISTINCT tr.doc_id) AS n_train_docs
             |FROM ev e JOIN tr ON e.ng = tr.ng
             |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin)),

    // Novelty rate: q117's inverse view — for EVERY eval document, the
    // fraction of its distinct 8-grams NOT present anywhere in train
    // (q117 reports only contaminated pairs; decontamination reporting
    // needs every doc scored, zero-overlap included). Left-join on the
    // same inverted index; the ratio is exact small-int arithmetic.
    Entry("q165_novelty_rate",
      (s, d) => {
        val evalSources = Seq("src0", "src1", "src2", "src3", "src4")
        val sh = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), Fns.tokens(col("text")).as("t"))
          .select(col("doc_id"), col("source"),
            explode(Fns.shingles(col("t"), 8)).as("ng"))
          .distinct()
          .localCheckpoint(true) // eval side, train side
        val evalSh = sh.filter(col("source").isin(evalSources: _*))
          .select(col("doc_id"), col("ng"))
        val trainNg = sh.filter(!col("source").isin(evalSources: _*))
          .select(col("ng")).distinct()
        evalSh
          .join(trainNg.withColumn("seen", lit(1)), Seq("ng"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_ngrams"),
            sum(when(col("seen").isNotNull, 1L).otherwise(0L)).as("n_shared"))
          .withColumn("novelty",
            (col("n_ngrams") - col("n_shared")).cast("double") / col("n_ngrams"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source, string_split(lower(text), ' ') AS tk
             |  FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, source, array_to_string(tk[i:i+7], ' ') AS ng
             |  FROM t, LATERAL (SELECT unnest(generate_series(1,
             |         greatest(len(tk) - 7, 0))) AS i) g
             |  WHERE len(tk) >= 8),
             |ev AS (SELECT doc_id, ng FROM sh
             |       WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')),
             |tr AS (SELECT DISTINCT ng FROM sh
             |       WHERE source NOT IN ('src0', 'src1', 'src2', 'src3', 'src4')),
             |j AS (
             |  SELECT e.doc_id, count(*) AS n_ngrams,
             |    CAST(sum(CASE WHEN tr.ng IS NOT NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_shared
             |  FROM ev e LEFT JOIN tr ON e.ng = tr.ng
             |  GROUP BY e.doc_id)
             |SELECT doc_id, n_ngrams, n_shared,
             |  (n_ngrams - n_shared)::DOUBLE / n_ngrams AS novelty
             |FROM j ORDER BY doc_id""".stripMargin)),

    // Leave-one-out KNN label eval: predict each vector's label by
    // majority vote of its 10 nearest neighbors (ties → lexically
    // smallest label), report per-label accuracy — the label-quality /
    // embedding-quality eval for a labeled corpus. knnBatch keeps the
    // pair space bounded (<= k rows per query per partition).
    Entry("q166_knn_label_eval",
      (s, d) => {
        import graft.ops.Similarity
        val emb = Tables.embeddings(s, d)
        val q = emb.select(col("vec_id").as("q_id"),
          col("embedding").as("qvec"), col("label").as("true_label"))
        // round 14 (r13 verdict #6): self-pairs drop BEFORE the bounded
        // TopK aggregation (knnBatchLoo), so the top-10-excluding-self
        // comes straight out of the aggregator — the k=11 → drop-self →
        // row_number re-rank window (one exchange + a whole-relation
        // sort) is gone from the plan. Output identical (see knnBatchLoo).
        val nn = Similarity.knnBatchLoo(emb, q.select(col("q_id"), col("qvec")),
            "vec_id", "embedding", "q_id", "qvec", k = 10)
          .join(emb.select(col("vec_id"), col("label")), "vec_id")
        val votes = nn.groupBy(col("q_id"), col("label"))
          .agg(count(lit(1)).as("v"))
        val pred = votes.groupBy(col("q_id"))
          .agg(min_by(col("label"),
            struct((-col("v")).as("nv"), col("label").as("l"))).as("pred"))
        pred.join(q.select(col("q_id"), col("true_label")), "q_id")
          .groupBy(col("true_label"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("pred") === col("true_label"), 1L).otherwise(0L))
              .as("n_correct"))
          .withColumn("accuracy", col("n_correct").cast("double") / col("n"))
          .orderBy(col("true_label"))
      },
      Some(s"""WITH scored AS (
              |  SELECT q.vec_id AS q_id, q.label AS true_label,
              |    c.vec_id AS n_id, c.label AS n_label,
              |    ${OracleSql.cosine("c.embedding", "q.embedding")} AS s
              |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id),
              |topk AS (
              |  SELECT q_id, true_label, n_label FROM (
              |    SELECT *, row_number() OVER (PARTITION BY q_id
              |      ORDER BY s DESC, n_id) AS rn
              |    FROM scored)
              |  WHERE rn <= 10),
              |votes AS (
              |  SELECT q_id, true_label, n_label, count(*) AS v
              |  FROM topk GROUP BY 1, 2, 3),
              |pred AS (
              |  SELECT q_id, true_label, n_label AS pred FROM (
              |    SELECT *, row_number() OVER (PARTITION BY q_id
              |      ORDER BY v DESC, n_label) AS rn
              |    FROM votes)
              |  WHERE rn = 1)
              |SELECT true_label, count(*) AS n,
              |  CAST(sum(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_correct,
              |  sum(CASE WHEN pred = true_label THEN 1 ELSE 0 END)::DOUBLE
              |    / count(*) AS accuracy
              |FROM pred GROUP BY true_label ORDER BY true_label""".stripMargin)),

    // Video frame sampling: one frame every 700 ms up to the clip duration
    // (≥1 per clip), fanned out by flatMap without a shuffle; the stub
    // decoder's first feature component is reproduced in SQL from the same
    // sha-256, so the batch plumbing AND the deterministic decode contract
    // are both hash-checked.
    Entry("q118_frame_sample",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .map { case (id, text) =>
            Multimodal.MediaRow(s"media$id",
              Seq("image", "audio", "video")((id % 3).toInt),
              text.getBytes("UTF-8"),
              Multimodal.MediaMeta("application/octet-stream", 64, 48,
                1000L * (id % 10 + 1), 0))
          }
        Multimodal.sampleFrames(s, media, everyMs = 700L)
          .toDF()
          .select(col("media_id"), col("frame_index"), col("ts_ms"),
            element_at(col("features"), 1).as("f0"))
          .orderBy(col("media_id"), col("frame_index"))
      },
      Some {
        val hex = "strpos('0123456789abcdef', substr(h, 1, 1)) - 1"
        val hex2 = "strpos('0123456789abcdef', substr(h, 2, 1)) - 1"
        s"""WITH v AS (
           |  SELECT doc_id, text, 1000 * (doc_id % 10 + 1) AS dur
           |  FROM documents
           |  WHERE doc_id % 3 = 2
           |    AND octet_length(CAST(text AS BLOB)) > 0),
           |f AS (
           |  SELECT doc_id, text,
           |    unnest(generate_series(0, CAST(greatest(dur // 700, 1) AS INT) - 1)) AS i
           |  FROM v),
           |hashed AS (
           |  SELECT doc_id, i,
           |    sha256(text || CAST(i AS VARCHAR) || '0') AS h
           |  FROM f),
           |b AS (
           |  SELECT doc_id, i, ($hex) * 16 + ($hex2) AS byte0
           |  FROM hashed)
           |SELECT 'media' || CAST(doc_id AS VARCHAR) AS media_id,
           |  CAST(i AS INT) AS frame_index,
           |  CAST(i * 700 AS BIGINT) AS ts_ms,
           |  CAST((CASE WHEN byte0 >= 128 THEN byte0 - 256 ELSE byte0 END) / 128.0
           |       AS REAL) AS f0
           |FROM b ORDER BY media_id, frame_index""".stripMargin
      }),

    // Point-in-time (leakage-safe) feature join: each training example
    // (click event) picks the SCD2 user-state version valid AT example
    // time — the label-leakage guard every feature pipeline needs. SCD2
    // build + bin-bucketed range join, both existing operators; the open
    // version gets a far-future sentinel so it stays joinable.
    Entry("q120_point_in_time",
      (s, d) => {
        import graft.ops.Temporal
        val ev = Tables.events(s, d)
        // open-version sentinel = max(ts) + 1 day, NOT a far-future date:
        // rangeJoin explodes one bin row per day of interval span, so a
        // 2100 sentinel would fan every open version into ~27k bins (the
        // exact pathology rangeJoin's fan-out guard warns about). Computed
        // IN-PLAN (1-row aggregate cross-joined in) — a driver-side
        // head() here is both an action at plan-build time and fragile
        // across Spark's java.time/java.sql external-type settings.
        val sentinel = ev.agg(
          (max(col("ts")) + expr("INTERVAL 1 DAY")).as("__sentinel"))
        val dim = Temporal.scd2(ev, keyCol = "user_id", tsCol = "ts",
            orderCol = "event_id", attrCols = Seq("event_type"))
          .crossJoin(broadcast(sentinel))
          .select(col("user_id"), col("event_type").as("state_at_ts"),
            col("valid_from"),
            coalesce(col("valid_to"), col("__sentinel")).as("valid_to_c"))
        val examples = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        Temporal.rangeJoin(examples, "ts", dim, "valid_from", "valid_to_c",
            binWidthSec = 86400, keys = Seq("user_id"))
          .select(col("event_id"), col("user_id"), col("state_at_ts"),
            col("valid_from"))
          .orderBy(col("event_id"))
      },
      Some("""WITH ordered AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev_type,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS rn
             |  FROM events),
             |changed AS (
             |  SELECT user_id, ts, event_id, event_type FROM ordered
             |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type),
             |dim AS (
             |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS valid_from,
             |    CAST(coalesce(
             |      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
             |      (SELECT max(CAST(ts AS TIMESTAMP)) + INTERVAL 1 DAY FROM events))
             |      AS TIMESTAMP) AS valid_to
             |  FROM changed)
             |SELECT p.event_id, p.user_id, d.event_type AS state_at_ts,
             |  d.valid_from
             |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |      FROM events WHERE event_type = 'click') p
             |JOIN dim d ON d.user_id = p.user_id
             |  AND p.ts >= d.valid_from AND p.ts < d.valid_to
             |  AND d.valid_to > d.valid_from
             |ORDER BY p.event_id""".stripMargin)),

    // Training-sequence packing: concat-then-chop into 512-token
    // sequences, per source shard (each shard packs independently — no
    // global ordering anywhere). A document belongs to the sequence its
    // first token lands in.
    Entry("q121_sequence_packing",
      (s, d) => graft.ops.Packing.sequencePack(
        Tables.documents(s, d), "doc_id", "text", "source", seqLen = 512)
        .orderBy(col("source"), col("seq_id")),
      Some("""WITH t AS (
             |  SELECT source, doc_id,
             |    len(string_split(lower(text), ' ')) AS n
             |  FROM documents),
             |c AS (
             |  SELECT source, doc_id, n,
             |    sum(n) OVER (PARTITION BY source ORDER BY doc_id) AS cum
             |  FROM t)
             |SELECT source, CAST((cum - n) // 512 AS BIGINT) AS seq_id,
             |  count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
             |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Batch KNN: 5 query vectors against the corpus in ONE scan, per-query
    // top-5 via the bounded TopK aggregator (≤ k rows per query leave each
    // map partition — the batch-serving shape, not one scan per query and
    // not a window sort of the crossed relation).
    Entry("q122_batch_knn",
      (s, d) => {
        import graft.ops.Similarity
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id").between(1, 5))
          .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
        Similarity.knnBatch(emb.filter(col("vec_id") > 5), queries,
            "vec_id", "embedding", "q_id", "qvec", k = 5)
          .orderBy(col("q_id"), col("rank"))
      },
      Some(s"""WITH q AS (
              |  SELECT vec_id AS q_id, embedding AS qvec FROM embeddings
              |  WHERE vec_id BETWEEN 1 AND 5),
              |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 5),
              |scored AS (
              |  SELECT q.q_id, c.vec_id,
              |    ${OracleSql.cosine("c.embedding", "q.qvec")} AS score
              |  FROM c CROSS JOIN q),
              |ranked AS (
              |  SELECT q_id, vec_id, score,
              |    CAST(row_number() OVER (PARTITION BY q_id
              |      ORDER BY score DESC, vec_id) AS INT) AS rank
              |  FROM scored)
              |SELECT q_id, vec_id, score, rank FROM ranked
              |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Canonical survivor selection: near-dup clusters (exact jaccard pairs
    // → connected components) each keep their best-quality member — the
    // curation step that turns dedup PAIRS into a keep/drop decision.
    Entry("q123_canonical_selection",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import graft.ops.{Dedup, GraphAnalytics, TextAnalysis}
        val docs = Tables.documents(s, d)
        val clusters = GraphAnalytics.dedupClusters(
          Dedup.exactJaccardPairs(docs, "doc_id", "text", shingleK = 3, threshold = 0.5)
            .select(col("doc_a"), col("doc_b")))
        val quality = TextAnalysis.quality(docs, "doc_id", "text")
          .select(col("doc_id"), col("quality"))
        val w = Window.partitionBy(col("cluster"))
        clusters.join(quality, "doc_id")
          .withColumn("rn", row_number().over(
            w.orderBy(desc("quality"), col("doc_id"))))
          .withColumn("n_members", count(lit(1)).over(w))
          .filter(col("rn") === 1)
          .select(col("cluster"), col("doc_id").as("survivor"),
            col("quality"), col("n_members"))
          .orderBy(col("cluster"))
      },
      Some {
        val stop = graft.ops.TextAnalysis.langMarkers.values.flatten.toSeq
          .distinct.sorted.map(m => s"'$m'").mkString(", ")
        s"""WITH RECURSIVE toks AS (
           |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
           |sh AS (
           |  SELECT DISTINCT doc_id,
           |    unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
           |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
           |  FROM toks),
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
           |qual AS (
           |  SELECT doc_id,
           |    0.4 * least(1.0, CAST(len(t) AS BIGINT) / 64.0)
           |      + 0.3 * (len(list_distinct(t))::DOUBLE / len(t))
           |      + 0.3 * (1.0 - len(list_filter(t, x -> list_contains([$stop], x)))::DOUBLE / len(t))
           |      AS quality
           |  FROM toks),
           |ranked AS (
           |  SELECT c.cluster, c.doc_id, q.quality,
           |    row_number() OVER (PARTITION BY c.cluster
           |      ORDER BY q.quality DESC, c.doc_id) AS rn,
           |    count(*) OVER (PARTITION BY c.cluster) AS n_members
           |  FROM comp c JOIN qual q USING (doc_id))
           |SELECT cluster, doc_id AS survivor, quality, n_members
           |FROM ranked WHERE rn = 1 ORDER BY cluster""".stripMargin
      }),

    // ACL-scoped graph traversal (SURVEY §7.4.5): BOTH endpoints of every
    // traversed edge must be visible to the principal — owner matches OR
    // the read-grant array contains them. Deterministic visibility seeding
    // (ownership by key mod, grants on every 3rd/4th key) lets the oracle
    // recompute the visible subgraph relationally.
    Entry("q124_acl_graph",
      (s, d) => {
        import graft.ast.{GraphQuery, Pattern, Return}
        import graft.ops.Retrieval.Principal
        val emptyGrants = array().cast("array<string>")
        val cNodes = Tables.customer(s, d).select(
          concat(lit("c"), col("c_custkey")).as("node_id"),
          lit("Customer").as("label"), col("c_name").as("name"),
          map().cast("map<string,string>").as("properties"),
          concat(lit("u"), col("c_custkey") % 5).as("user_id"),
          when(col("c_custkey") % 3 === 0, array(lit("u0"), lit("u1")))
            .otherwise(emptyGrants).as("user_read_access"))
        val oNodes = Tables.orders(s, d).select(
          concat(lit("o"), col("o_orderkey")).as("node_id"),
          lit("Order").as("label"),
          concat(lit("order "), col("o_orderkey")).as("name"),
          map().cast("map<string,string>").as("properties"),
          concat(lit("u"), col("o_custkey") % 5).as("user_id"),
          when(col("o_orderkey") % 4 === 0, array(lit("u0"), lit("u1")))
            .otherwise(emptyGrants).as("user_read_access"))
        val edges = Tables.orders(s, d).select(
          concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("o"), col("o_orderkey")).as("dst"),
          lit("PLACED").as("rel_type"),
          map().cast("map<string,string>").as("properties"))
        val gq = GraphQuery(
          Pattern("Customer", Some("PLACED"), Some("Order")),
          Nil, Return(Seq("m" -> "id", "n" -> "id"), orderBy = None, limit = None))
        graft.ast.QueryCompiler.compile(gq, cNodes.unionByName(oNodes), edges,
            Principal("u1"))
          .orderBy(col("m_id"), col("n_id"))
      },
      Some("""WITH vis_c AS (
             |  SELECT c_custkey AS k FROM customer
             |  WHERE 'u' || CAST(c_custkey % 5 AS VARCHAR) = 'u1'
             |     OR c_custkey % 3 = 0),
             |vis_o AS (
             |  SELECT o_orderkey, o_custkey FROM orders
             |  WHERE 'u' || CAST(o_custkey % 5 AS VARCHAR) = 'u1'
             |     OR o_orderkey % 4 = 0)
             |SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS m_id,
             |  'o' || CAST(o.o_orderkey AS VARCHAR) AS n_id
             |FROM vis_o o JOIN vis_c c ON c.k = o.o_custkey
             |ORDER BY m_id, n_id""".stripMargin)),

    // Materialized-view maintenance: two disjoint batches fold through the
    // mergeable (cnt,sum,min,max) state and must equal the one-pass
    // aggregate — the refresh path that never rescans history at 100 TB.
    Entry("q125_incremental_rollup",
      (s, d) => {
        import graft.ops.IncrementalAgg
        val ev = Tables.events(s, d)
        val b1 = ev.filter(dayofmonth(col("ts")) <= 15)
        val b2 = ev.filter(dayofmonth(col("ts")) > 15)
        val state = IncrementalAgg.merge(
          IncrementalAgg.partial(b1, Seq("event_type"), "value"),
          IncrementalAgg.partial(b2, Seq("event_type"), "value"),
          Seq("event_type"))
        IncrementalAgg.finalized(state)
          .select(col("event_type"), col("cnt"),
            round(col("sm"), 2).as("sum_value"),
            col("mn"), col("mx"),
            round(col("avg"), 4).as("avg_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS cnt,
             |  round(sum(value), 2) AS sum_value,
             |  min(value) AS mn, max(value) AS mx,
             |  round(sum(value) / count(*), 4) AS avg_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // HLL rollup: daily distinct-user sketches union to per-type sketches
    // (raw data never re-read) whose estimates must land within 5% of the
    // exact distinct — the q54 boolean trick keeps the sketch in the
    // measured plan while staying SQL-expressible.
    Entry("q126_hll_rollup",
      (s, d) => {
        import graft.ops.Sketches
        val ev = Tables.events(s, d).withColumn("day", dayofmonth(col("ts")))
        val daily = Sketches.distinctSketch(ev, Seq("event_type", "day"), "user_id")
        val merged = Sketches.mergeSketches(daily.drop("day"), Seq("event_type"))
        val exact = Tables.events(s, d).groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_users"))
        Sketches.estimate(merged).join(exact, "event_type")
          .select(col("event_type"), col("exact_users"),
            (abs(col("approx_distinct") - col("exact_users")) <=
              col("exact_users") * 0.05).as("approx_ok"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |  TRUE AS approx_ok
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // KLL quantile-sketch rollup — the percentile member of the rollup
    // family: daily per-type sketches merge into per-type sketches WITHOUT
    // re-reading raw data, and the merged sketch must place the exact
    // median (computed independently, emitted float32 for cross-engine
    // hash parity) at normalized rank 0.5 within the KLL error bound.
    Entry("q128_quantile_rollup",
      (s, d) => {
        import graft.ops.Sketches
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("value"), dayofmonth(col("ts")).as("day"))
        val daily = Sketches.quantileSketch(ev, Seq("event_type", "day"), "value")
        val merged = Sketches.mergeQuantileSketches(daily.drop("day"), Seq("event_type"))
        val exact = ev.groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("exact_p50"),
            count(lit(1)).as("n"))
        merged.join(exact, "event_type")
          .select(col("event_type"), col("n"),
            col("exact_p50").cast("float").as("p50"),
            (abs(Sketches.rankOf(col("qsk"), col("exact_p50")) - 0.5) <= 0.05)
              .as("rank_ok"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(quantile_cont(value, 0.5) AS REAL) AS p50,
             |  TRUE AS rank_ok
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Theta-sketch set algebra — the segment-overlap member of the sketch
    // family HLL cannot express: per-day distinct-user sketches fold up
    // from (day, cohort) partials exactly like the HLL rollups, and then
    // any PAIR of stored ~KB sketches answers |A∩B| / |A∪B| / |A\B|
    // without re-shuffling raw ids (day-over-day retention at 100 TB).
    // Exact comparables are computed in-engine and by the oracle; the
    // sketch estimates must land within the theta error bound (exact-mode
    // at these cardinalities → equality in practice).
    Entry("q129_theta_overlap",
      (s, d) => {
        import graft.ops.Sketches
        val du = Tables.events(s, d)
          .filter(dayofmonth(col("ts")) <= 7)
          .select(dayofmonth(col("ts")).as("d"), col("user_id"), col("event_type"))
        // two-level fold: (day, cohort) partials → per-day sketches
        val partials = Sketches.thetaSketch(du, Seq("d", "event_type"), "user_id")
        val daily = Sketches.mergeThetaSketches(partials.drop("event_type"), Seq("d"))
        val dist = du.select("d", "user_id").distinct()
        val cnt = dist.groupBy("d").agg(count(lit(1)).as("c"))
        val ov = dist.as("a").join(dist.as("b"),
            col("a.user_id") === col("b.user_id") && col("a.d") < col("b.d"))
          .groupBy(col("a.d").as("day_a"), col("b.d").as("day_b"))
          .agg(count(lit(1)).as("overlap_users"))
        ov
          .join(cnt.select(col("d").as("day_a"), col("c").as("ca")), "day_a")
          .join(cnt.select(col("d").as("day_b"), col("c").as("cb")), "day_b")
          .join(daily.select(col("d").as("day_a"), col("tsk").as("ska")), "day_a")
          .join(daily.select(col("d").as("day_b"), col("tsk").as("skb")), "day_b")
          .select(
            col("day_a"), col("day_b"), col("overlap_users"),
            (col("ca") + col("cb") - col("overlap_users")).as("union_users"),
            (col("ca") - col("overlap_users")).as("only_a_users"),
            (Sketches.thetaOk(
                Sketches.thetaEstimate(Sketches.thetaIntersect(col("ska"), col("skb"))),
                col("overlap_users")) &&
             Sketches.thetaOk(
                Sketches.thetaEstimate(Sketches.thetaUnion(col("ska"), col("skb"))),
                col("ca") + col("cb") - col("overlap_users")) &&
             Sketches.thetaOk(
                Sketches.thetaEstimate(Sketches.thetaANotB(col("ska"), col("skb"))),
                col("ca") - col("overlap_users"))).as("theta_ok"))
          .orderBy(col("day_a"), col("day_b"))
      },
      Some("""WITH du AS (SELECT DISTINCT dayofmonth(ts) AS d, user_id
             |  FROM events WHERE dayofmonth(ts) <= 7),
             |cnt AS (SELECT d, count(*) AS c FROM du GROUP BY 1),
             |ov AS (SELECT a.d AS day_a, b.d AS day_b, count(*) AS overlap_users
             |  FROM du a JOIN du b ON a.user_id = b.user_id AND a.d < b.d
             |  GROUP BY 1, 2)
             |SELECT ov.day_a, ov.day_b, ov.overlap_users,
             |  ca.c + cb.c - ov.overlap_users AS union_users,
             |  ca.c - ov.overlap_users AS only_a_users,
             |  TRUE AS theta_ok
             |FROM ov JOIN cnt ca ON ca.d = ov.day_a
             |  JOIN cnt cb ON cb.d = ov.day_b
             |ORDER BY 1, 2""".stripMargin)),

    // Audio windowing: 900 ms windows per clip with per-window RMS/peak
    // over the stub pseudo-PCM — the third modality next to q50 (image
    // features) and q118 (video frames). All arithmetic is exactly
    // representable (samples are byte/128 dyadic rationals), so rms/peak
    // hash-match the sha-256 SQL oracle bit for bit.
    Entry("q136_audio_windows",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .map { case (id, text) =>
            Multimodal.MediaRow(s"media$id",
              Seq("image", "audio", "video")((id % 3).toInt),
              text.getBytes("UTF-8"),
              Multimodal.MediaMeta("application/octet-stream", 0, 0,
                1000L * (id % 10 + 1), 16000))
          }
        Multimodal.audioWindows(s, media, windowMs = 900L)
          .toDF()
          .select(col("media_id"), col("window_index"), col("start_ms"),
            col("end_ms"), col("rms"), col("peak"))
          .orderBy(col("media_id"), col("window_index"))
      },
      Some {
        val byteJ =
          """(strpos('0123456789abcdef', substr(h, 2*j - 1, 1)) - 1) * 16
            | + strpos('0123456789abcdef', substr(h, 2*j, 1)) - 1""".stripMargin
        s"""WITH a AS (
           |  SELECT doc_id, text, 1000 * (doc_id % 10 + 1) AS dur
           |  FROM documents
           |  WHERE doc_id % 3 = 1
           |    AND octet_length(CAST(text AS BLOB)) > 0),
           |w AS (
           |  SELECT doc_id, text, dur,
           |    unnest(generate_series(0, CAST(greatest(dur // 900, 1) AS INT) - 1)) AS i
           |  FROM a),
           |hashed AS (
           |  SELECT doc_id, dur, i,
           |    sha256(text || 'w' || CAST(i AS VARCHAR) || '0') AS h
           |  FROM w),
           |samples AS (
           |  SELECT doc_id, dur, i,
           |    list_transform(generate_series(1, 32), j ->
           |      ($byteJ)) AS bytes
           |  FROM hashed),
           |xs AS (
           |  SELECT doc_id, dur, i,
           |    list_transform(bytes, b ->
           |      (CASE WHEN b >= 128 THEN b - 256 ELSE b END) / 128.0) AS x
           |  FROM samples)
           |SELECT 'media' || CAST(doc_id AS VARCHAR) AS media_id,
           |  CAST(i AS INT) AS window_index,
           |  CAST(i * 900 AS BIGINT) AS start_ms,
           |  CAST(least((i + 1) * 900, dur) AS BIGINT) AS end_ms,
           |  sqrt(list_sum(list_transform(x, v -> v * v)) / 32.0) AS rms,
           |  CAST(list_max(list_transform(x, v -> abs(v))) AS REAL) AS peak
           |FROM xs ORDER BY media_id, window_index""".stripMargin
      }),

    // Retrieval-quality evaluation: recall@10 and reciprocal rank of the
    // 16-dim Matryoshka prefix ranking against exact full-dim gold, per
    // query — the eval harness a serving stack runs after every index
    // build. Both rankings are one batched corpus scan (bounded TopK);
    // metrics are rational arithmetic (|∩|/k, 1/rank) so rows hash-match
    // the oracle exactly.
    Entry("q141_ann_recall",
      (s, d) => {
        import graft.ops.Similarity
        import graft.functions.VectorFunctions._
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id").between(1, 10))
          .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
        def run(c: org.apache.spark.sql.DataFrame,
                q: org.apache.spark.sql.DataFrame) = Similarity.knnBatch(
          c, q, "vec_id", "embedding", "q_id", "qvec", k = 10)
        val corpus = emb.filter(col("vec_id") > 10)
        val gold = run(corpus, queries)
        val sys = run(
          corpus.withColumn("embedding", slice(col("embedding"), 1, 16)),
          queries.withColumn("qvec", slice(col("qvec"), 1, 16)))
        val goldTop1 = gold.filter(col("rank") === 1)
          .select(col("q_id"), col("vec_id").as("top1"))
        val hits = gold.select(col("q_id"), col("vec_id"))
          .join(sys.select(col("q_id"), col("vec_id"), col("rank")), Seq("q_id", "vec_id"))
        // every query keeps a row — a zero-overlap query reports recall 0,
        // it must not silently vanish from the eval report
        val recall = queries.select(col("q_id"))
          .join(hits.groupBy(col("q_id"))
            .agg((count(lit(1)) / 10.0).as("r")), Seq("q_id"), "left")
          .select(col("q_id"), coalesce(col("r"), lit(0.0)).as("recall_at_10"))
        val sysR = sys.select(col("q_id").as("s_qid"),
          col("vec_id").as("s_vid"), col("rank"))
        val rr = sysR.join(goldTop1,
            col("s_qid") === col("q_id") && col("s_vid") === col("top1"))
          .select(col("q_id"), (lit(1.0) / col("rank")).as("rr"))
        recall.join(rr, Seq("q_id"), "left")
          .select(col("q_id"), col("recall_at_10"),
            coalesce(col("rr"), lit(0.0)).as("rr"))
          .orderBy(col("q_id"))
      },
      Some {
        def ranked(scoreExpr: String) =
          s"""SELECT q_id, vec_id, rank FROM (
             |  SELECT q_id, vec_id,
             |    CAST(row_number() OVER (PARTITION BY q_id
             |      ORDER BY s DESC, vec_id) AS INT) AS rank
             |  FROM (SELECT q.q_id, c.vec_id, $scoreExpr AS s
             |        FROM c CROSS JOIN q)) WHERE rank <= 10"""
            .stripMargin
        s"""WITH q AS (
           |  SELECT vec_id AS q_id, embedding AS qvec FROM embeddings
           |  WHERE vec_id BETWEEN 1 AND 10),
           |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 10),
           |gold AS MATERIALIZED (
           |${ranked(OracleSql.cosine("c.embedding", "q.qvec"))}),
           |sys AS MATERIALIZED (
           |${ranked(OracleSql.cosine("c.embedding[1:16]", "q.qvec[1:16]"))}),
           |hits AS (
           |  SELECT g.q_id, count(*) / 10.0::DOUBLE AS r
           |  FROM gold g JOIN sys s ON s.q_id = g.q_id AND s.vec_id = g.vec_id
           |  GROUP BY g.q_id),
           |recall AS (
           |  SELECT q.q_id, coalesce(h.r, 0.0::DOUBLE) AS recall_at_10
           |  FROM q LEFT JOIN hits h ON h.q_id = q.q_id),
           |rr AS (
           |  SELECT g.q_id, 1.0::DOUBLE / s.rank AS rr
           |  FROM gold g JOIN sys s ON s.q_id = g.q_id AND s.vec_id = g.vec_id
           |  WHERE g.rank = 1)
           |SELECT r.q_id, r.recall_at_10, coalesce(rr.rr, 0.0::DOUBLE) AS rr
           |FROM recall r LEFT JOIN rr ON rr.q_id = r.q_id
           |ORDER BY r.q_id""".stripMargin
      }),

    // Hard-negative mining: per anchor, the 5 most-similar corpus vectors
    // with a DIFFERENT label, capped at 0.99 similarity (the semi-hard
    // band) — the contrastive-training curation step. Same one-scan
    // bounded-TopK plan as q122.
    Entry("q134_hard_negatives",
      (s, d) => {
        import graft.ops.Similarity
        val emb = Tables.embeddings(s, d)
        val anchors = emb.filter(col("vec_id").between(1, 5))
          .select(col("vec_id").as("q_id"), col("embedding").as("qvec"),
            col("label").as("q_label"))
        Similarity.hardNegatives(emb.filter(col("vec_id") > 5), anchors,
            "vec_id", "embedding", "label", "q_id", "qvec", "q_label",
            k = 5, maxSim = 0.99)
          .orderBy(col("q_id"), col("rank"))
      },
      Some(s"""WITH q AS (
              |  SELECT vec_id AS q_id, embedding AS qvec, label AS q_label
              |  FROM embeddings WHERE vec_id BETWEEN 1 AND 5),
              |c AS (SELECT vec_id, embedding, label FROM embeddings
              |      WHERE vec_id > 5),
              |scored AS (
              |  SELECT q.q_id, c.vec_id,
              |    ${OracleSql.cosine("c.embedding", "q.qvec")} AS score
              |  FROM c CROSS JOIN q
              |  WHERE c.label <> q.q_label),
              |ranked AS (
              |  SELECT q_id, vec_id, score,
              |    CAST(row_number() OVER (PARTITION BY q_id
              |      ORDER BY score DESC, vec_id) AS INT) AS rank
              |  FROM scored WHERE score <= 0.99)
              |SELECT q_id, vec_id, score, rank FROM ranked
              |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Matryoshka prefix prune → exact rescore: rank the corpus by cosine
    // over the FIRST 16 dims only (4× fewer bytes per scan row — the MRL
    // serving trick), keep 20 candidates, rescore those at full dimension
    // and return the top 5. Same prune-then-rescore shape as the PQ path
    // (q79), with dimension truncation as the cheap stage.
    Entry("q135_matryoshka_rescore",
      (s, d) => {
        import graft.functions.VectorFunctions._
        val emb = Tables.embeddings(s, d)
        val q = emb.filter(col("vec_id") === 1)
          .select(col("embedding").as("qvec"))
        emb.filter(col("vec_id") > 1)
          .crossJoin(broadcast(q))
          .withColumn("pre_score",
            cosineSim(slice(col("embedding"), 1, 16), slice(col("qvec"), 1, 16)))
          .orderBy(desc("pre_score"), col("vec_id"))
          .limit(20)
          .withColumn("score", cosineSim(col("embedding"), col("qvec")))
          .select(col("vec_id"), col("pre_score"), col("score"))
          .orderBy(desc("score"), col("vec_id"))
          .limit(5)
      },
      Some(s"""WITH q AS (
              |  SELECT embedding AS qvec FROM embeddings WHERE vec_id = 1),
              |pruned AS (
              |  SELECT vec_id, embedding, qvec,
              |    ${OracleSql.cosine("embedding[1:16]", "qvec[1:16]")} AS pre_score
              |  FROM embeddings CROSS JOIN q
              |  WHERE vec_id > 1
              |  ORDER BY pre_score DESC, vec_id LIMIT 20)
              |SELECT vec_id, pre_score,
              |  ${OracleSql.cosine("embedding", "qvec")} AS score
              |FROM pruned
              |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin)),

    // Scene-cut detection: L1 distance between CONSECUTIVE frame feature
    // vectors per clip, cuts = distance above threshold — the shot-
    // boundary stage of a video training pipeline, built on q118's frame
    // sampler. Every feature component is a dyadic rational (byte/128),
    // so |x−y| sums are EXACT in double at any fold order — the whole
    // row hash-matches without any float32 absorption. One lag window
    // per clip (frames never leave their media_id partition).
    Entry("q164_scene_cuts",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val media = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .map { case (id, text) =>
            Multimodal.MediaRow(s"media$id",
              Seq("image", "audio", "video")((id % 3).toInt),
              text.getBytes("UTF-8"),
              Multimodal.MediaMeta("application/octet-stream", 64, 48,
                1000L * (id % 10 + 1), 0))
          }
        val w = Window.partitionBy(col("media_id")).orderBy(col("frame_index"))
        Multimodal.sampleFrames(s, media, everyMs = 700L).toDF()
          .withColumn("prev", lag(col("features"), 1).over(w))
          .filter(col("prev").isNotNull)
          .withColumn("dist", expr(
            """aggregate(zip_with(features, prev,
              |  (x, y) -> cast(abs(x - y) as double)),
              |cast(0.0 as double), (a, v) -> a + v)""".stripMargin))
          .select(col("media_id"), col("frame_index"), col("ts_ms"),
            col("dist"), (col("dist") > 22.0).as("is_cut"))
          .orderBy(col("media_id"), col("frame_index"))
      },
      Some {
        def byteCol(j: Int) = {
          val p = 2 * j
          val b = s"((strpos('0123456789abcdef', substr(h, ${p + 1}, 1)) - 1) * 16" +
            s" + strpos('0123456789abcdef', substr(h, ${p + 2}, 1)) - 1)"
          s"CAST((CASE WHEN $b >= 128 THEN $b - 256 ELSE $b END) / 128.0 AS REAL) AS b$j"
        }
        val cols = (0 until 32).map(byteCol).mkString(",\n    ")
        val dist = (0 until 32)
          .map(j => s"abs(a.b$j::DOUBLE - p.b$j::DOUBLE)").mkString(" + ")
        s"""WITH v AS (
           |  SELECT doc_id, text, 1000 * (doc_id % 10 + 1) AS dur
           |  FROM documents
           |  WHERE doc_id % 3 = 2
           |    AND octet_length(CAST(text AS BLOB)) > 0),
           |f AS (
           |  SELECT doc_id, text,
           |    unnest(generate_series(0, CAST(greatest(dur // 700, 1) AS INT) - 1)) AS i
           |  FROM v),
           |hashed AS (
           |  SELECT doc_id, i, sha256(text || CAST(i AS VARCHAR) || '0') AS h
           |  FROM f),
           |feat AS (
           |  SELECT 'media' || CAST(doc_id AS VARCHAR) AS media_id,
           |    CAST(i AS INT) AS frame_index, CAST(i * 700 AS BIGINT) AS ts_ms,
           |    $cols
           |  FROM hashed)
           |SELECT a.media_id, a.frame_index, a.ts_ms,
           |  ($dist) AS dist,
           |  ($dist) > 22.0 AS is_cut
           |FROM feat a JOIN feat p
           |  ON p.media_id = a.media_id AND p.frame_index = a.frame_index - 1
           |ORDER BY a.media_id, a.frame_index""".stripMargin
      }),

    // Intra-list similarity (ILS): mean pairwise cosine within each
    // query's top-10 — the diversity eval that complements q141's
    // recall/MRR (and the metric q130's MMR diversifier optimizes).
    // Per-query pair count is k(k−1)/2 = 45, bounded by construction —
    // the self-join is keyed on q_id over k-row lists, never the corpus.
    Entry("q160_ils_diversity",
      (s, d) => {
        import graft.ops.Similarity
        import graft.functions.VectorFunctions.cosineSim
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id").between(1, 10))
          .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
        val corpus = emb.filter(col("vec_id") > 10)
        val topk = Similarity.knnBatch(corpus, queries, "vec_id", "embedding",
            "q_id", "qvec", k = 10)
          .select(col("q_id"), col("vec_id"))
          .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
          .localCheckpoint(true) // both sides of the bounded pair join
        topk.as("a")
          .join(topk.as("b"),
            col("a.q_id") === col("b.q_id") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.q_id").as("q_id"),
            cosineSim(col("a.embedding"), col("b.embedding")).as("sim"))
          .groupBy(col("q_id"))
          .agg(count(lit(1)).as("n_pairs"),
            avg(col("sim")).cast("float").as("ils"))
          .orderBy(col("q_id"))
      },
      Some(s"""WITH q AS (
              |  SELECT vec_id AS q_id, embedding AS qvec
              |  FROM embeddings WHERE vec_id BETWEEN 1 AND 10),
              |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 10),
              |scored AS (
              |  SELECT q_id, vec_id, embedding,
              |    ${OracleSql.cosine("embedding", "qvec")} AS s
              |  FROM c CROSS JOIN q),
              |topk AS (
              |  SELECT q_id, vec_id, embedding FROM (
              |    SELECT *, row_number() OVER (PARTITION BY q_id
              |      ORDER BY s DESC, vec_id) AS rn
              |    FROM scored)
              |  WHERE rn <= 10),
              |prs AS (
              |  SELECT a.q_id,
              |    ${OracleSql.cosine("a.embedding", "b.embedding")} AS sim
              |  FROM topk a JOIN topk b
              |    ON a.q_id = b.q_id AND a.vec_id < b.vec_id)
              |SELECT q_id, count(*) AS n_pairs, CAST(avg(sim) AS REAL) AS ils
              |FROM prs GROUP BY q_id ORDER BY q_id""".stripMargin)),

    // Fellegi–Sunter record-linkage scoring: log-likelihood-ratio weights
    // over a field-agreement pattern, nation-blocked candidate pairs.
    // The weights are computed once in Scala and injected as IDENTICAL
    // literals into both plans, so the score is a fixed left-associated
    // sum of constants — bit-exact across engines.
    Entry("q151_fellegi_sunter",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .withColumn("bal_bucket",
            floor(col("c_acctbal") / 1000.0).cast("long"))
          .withColumn("name_sfx", substring(col("c_name"), -2, 2))
        graft.ops.RecordLinkage.fellegiSunter(cust, "c_custkey",
          "c_nationkey", Seq("bal_bucket", "c_mktsegment", "name_sfx"),
          fsPriors, cutoff = 0.5)
      },
      Some {
        val Seq((wa1, wd1), (wa2, wd2), (wa3, wd3)) =
          graft.ops.RecordLinkage.weights(fsPriors)
        s"""WITH f AS (
           |  SELECT c_custkey AS id, c_nationkey AS blk,
           |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS f1,
           |    c_mktsegment AS f2,
           |    substr(c_name, length(c_name) - 1, 2) AS f3
           |  FROM customer),
           |scored AS (
           |  SELECT a.id AS id_a, b.id AS id_b,
           |    ((CASE WHEN a.f1 = b.f1 THEN $wa1::DOUBLE ELSE $wd1::DOUBLE END
           |      + CASE WHEN a.f2 = b.f2 THEN $wa2::DOUBLE ELSE $wd2::DOUBLE END)
           |      + CASE WHEN a.f3 = b.f3 THEN $wa3::DOUBLE ELSE $wd3::DOUBLE END) AS score
           |  FROM f a JOIN f b ON a.blk = b.blk AND a.id < b.id)
           |SELECT id_a, id_b, score FROM scored
           |WHERE score >= 0.5 ORDER BY id_a, id_b""".stripMargin
      }))

  // q151's field priors (m_i, u_i): agreement probability among true
  // matches vs non-matches, per comparison field.
  private val fsPriors: Seq[(Double, Double)] =
    Seq((0.9, 0.1), (0.8, 0.2), (0.95, 0.05))
}
