package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables
import graft.ast._
import graft.domain.Schemas.{Memory, Message}
import graft.engine.{HashEmbedder, Ingest, Search}
import graft.engine.Search.SearchRequest
import graft.multimodal.Multimodal
import graft.ops.Retrieval.Principal
import graft.streaming.Sessions

/** End-to-end domain-pipeline queries over the driver tables: the flagship
  * search composition, session batch analysis, the entity-resolution
  * cascade, multimodal feature extraction, and the AST compiler. The AST
  * query is DuckDB-oracle-checked; the rest are deterministic but not
  * SQL-expressible (hash embeddings, stateful folds) → rows-only checks.
  */
object DomainPipelineQueries {

  private val fixedTs = Timestamp.valueOf("2024-01-01 00:00:00")

  /** documents → Memory rows (title/tenant/ACL synthesized). */
  private def docMemories(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        Memory(s"m$id", "text", text, s"doc $id", "u0", "ws0", "org0", "ns0",
          Seq(lang), Nil, "conv0", "user", "work", "explicit", "none",
          Nil, Seq("ws0"), Nil, Seq("org0"), Nil, Map("lang" -> lang),
          fixedTs, fixedTs)
      }
  }

  def entries: Seq[Entry] = Seq(

    // §3.1 composed: chunk → embed → ACL → KNN ×3 oversample → rollup →
    // hydrate → top-k → lexical rerank, end to end on the documents table.
    Entry("q47_domain_search",
      (s, d) => {
        val mems = docMemories(s, d)
        val chunks = Ingest.chunk(s, mems, windowTokens = 12)
        Search.search(s, chunks.toDF(), mems.toDF(),
          SearchRequest("spark table join merge sort window", Principal("u0"),
            topK = 10, rerank = true))
          .select(col("memory_id"), col("score"), col("rr_score"))
      },
      None),

    // T2/T3: per-session batch-of-15 analysis with rolling summaries,
    // batch twin of the streaming query (flatMapGroupsWithState).
    Entry("q48_session_batches",
      (s, d) => {
        import s.implicits._
        val msgs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("source"))
          .as[(Long, String, String)]
          .map { case (id, text, src) =>
            Message(f"msg$id%05d", src, s"u${id % 5}",
              if (id % 2 == 0) "user" else "assistant", text,
              new Timestamp(fixedTs.getTime + id * 60000))
          }
        val summarizer = new Sessions.ConcatSummarizer(400)
        val classifier = new Sessions.LengthClassifier(5)
        msgs.groupByKey(_.session_id)
          .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
            (sid: String, it: Iterator[Message], st: GroupState[Sessions.SessionState]) =>
              Sessions.processGroup(sid, it, st, summarizer, classifier))
          .toDF()
          .select(col("session_id"), col("batch_index"),
            size(col("memory_candidates")).as("n_candidates"),
            length(col("long_summary")).as("summary_len"))
          .orderBy(col("session_id"), col("batch_index"))
      },
      // The stateful fold is deterministic: batches are row_number()/15
      // windows in (ts, message_id) order = doc_id order; the rolling long
      // summary (prev + ' | ' + digest, keep last 400 chars) is a recursive
      // CTE over batch_index; worthiness = even doc_id (user role) with ≥ 5
      // whitespace tokens.
      Some("""WITH RECURSIVE msgs AS (
             |  SELECT source AS session_id, doc_id, text,
             |    (doc_id % 2 = 0) AS is_user,
             |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
             |  FROM documents),
             |bm AS (
             |  SELECT session_id, CAST((rn - 1) // 15 AS INT) AS batch_index,
             |    doc_id, text, is_user,
             |    count(*) OVER (PARTITION BY session_id, (rn - 1) // 15) AS bsize
             |  FROM msgs),
             |dig AS (
             |  SELECT session_id, batch_index,
             |    string_agg(
             |      array_to_string(list_slice(string_split_regex(text, '\s+'), 1, 3), ' '),
             |      '; ' ORDER BY doc_id) AS digest,
             |    CAST(sum(CASE WHEN is_user
             |          AND len(string_split_regex(text, '\s+')) >= 5
             |        THEN 1 ELSE 0 END) AS INT) AS n_candidates
             |  FROM bm WHERE bsize = 15 GROUP BY 1, 2),
             |fold(session_id, batch_index, n_candidates, longsum) AS (
             |  SELECT session_id, batch_index, n_candidates, right(digest, 400)
             |  FROM dig WHERE batch_index = 0
             |  UNION ALL
             |  SELECT d.session_id, d.batch_index, d.n_candidates,
             |    right(f.longsum || ' | ' || d.digest, 400)
             |  FROM fold f JOIN dig d
             |    ON d.session_id = f.session_id AND d.batch_index = f.batch_index + 1)
             |SELECT session_id, batch_index, n_candidates,
             |  CAST(length(longsum) AS INT) AS summary_len
             |FROM fold ORDER BY session_id, batch_index""".stripMargin)),

    // Entity-resolution cascade over distinct part names. The existing graph
    // holds, per name-hash bucket: the identical name (→ exact), the
    // word-reversed name (same token set, cosine 1.0 → semantic), a
    // "deluxe edition" superstring (→ fuzzy contains), or nothing (→ create)
    // — so one run exercises every branch of the cascade.
    Entry("q49_entity_resolution",
      (s, d) => {
        import graft.functions.Fns.hash60
        val names = Tables.part(s, d).select(col("p_name").as("name")).distinct()
          .withColumn("bucket", hash60(col("name")) % 4)
        val candidates = names.select(
          concat(lit("cand_"), col("name")).as("node_id"),
          lit("Part").as("label"), col("name"))
        val existing = names.filter(col("bucket") =!= 3).select(
          concat(lit("node_"), col("name")).as("node_id"),
          lit("Part").as("label"),
          when(col("bucket") === 0, col("name"))
            .when(col("bucket") === 1, concat_ws(" ", reverse(split(col("name"), " "))))
            .otherwise(concat(col("name"), lit(" deluxe edition limited run")))
            .as("name"))
        val embedder = new HashEmbedder(32)
        val embedUdf = udf((t: String) => embedder.embed(t))
        val existingProps = existing.select(
          concat(lit("np_"), col("node_id")).as("point_id"),
          col("node_id"), col("label").as("node_label"),
          lit("name").as("property_name"), col("name").as("property_value"),
          embedUdf(col("name")).as("embedding"), lit("u0").as("user_id"))
        Ingest.resolveEntities(candidates, existing, existingProps, embedder)
          .groupBy(col("resolution")).agg(count(lit(1)).as("n"))
          .orderBy(col("resolution"))
      },
      None),

    // Multimodal: documents bytes as opaque blobs → partition-wise feature
    // extraction (decode stub, real batch plumbing).
    Entry("q50_multimodal_features",
      (s, d) => {
        import s.implicits._
        val media = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .map { case (id, text) =>
            Multimodal.MediaRow(s"media$id", Seq("image", "audio", "video")((id % 3).toInt),
              text.getBytes("UTF-8"),
              Multimodal.MediaMeta("application/octet-stream", 64, 48, 1000L * (id % 10 + 1), 0))
          }
        Multimodal.extractFeatures(s, media)
          .toDF()
          .select(col("media_id"), col("kind"), col("feature_dim"), col("decode_ok"))
          .orderBy(col("media_id"))
      },
      // The decode stub is deterministic on the byte payload: decode_ok ⇔
      // non-empty bytes, feature_dim is the decoder's fixed 32 either way —
      // so the plumbing contract (schema, per-kind routing, failure rows
      // kept) is oracle-checkable even with the codec stubbed.
      Some("""SELECT 'media' || CAST(doc_id AS VARCHAR) AS media_id,
             |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
             |       WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             |  CAST(32 AS INT) AS feature_dim,
             |  octet_length(CAST(text AS BLOB)) > 0 AS decode_ok
             |FROM documents ORDER BY media_id""".stripMargin)),

    // §2.11: the constrained query AST compiled to a DataFrame plan —
    // (m:Customer)-[r:PLACED]->(n:Order) WHERE n.status='O' RETURN ids.
    // Oracle = the equivalent relational join, so the COMPILER itself is
    // hash-checked against DuckDB.
    Entry("q51_ast_compile",
      (s, d) => {
        val nodes = Tables.customer(s, d)
          .select(concat(lit("c"), col("c_custkey")).as("node_id"),
            lit("Customer").as("label"), col("c_name").as("name"),
            map(lit("segment"), col("c_mktsegment")).as("properties"))
          .unionByName(Tables.orders(s, d)
            .select(concat(lit("o"), col("o_orderkey")).as("node_id"),
              lit("Order").as("label"), concat(lit("order "), col("o_orderkey")).as("name"),
              map(lit("status"), col("o_orderstatus")).as("properties")))
        val edges = Tables.orders(s, d)
          .select(concat(lit("c"), col("o_custkey")).as("src"),
            concat(lit("o"), col("o_orderkey")).as("dst"),
            lit("PLACED").as("rel_type"),
            map(lit("k"), lit("v")).as("properties"))
        val q = GraphQuery(
          Pattern("Customer", Some("PLACED"), Some("Order")),
          Seq(Where("n", "status", CompOp.Eq, Some("O")),
            Where("m", "segment", CompOp.In, Some(Seq("BUILDING", "MACHINERY")))),
          Return(Seq("m" -> "id", "n" -> "id"), orderBy = None, limit = None))
        QueryCompiler.compile(q, nodes, edges)
          .orderBy(col("m_id"), col("n_id"))
      },
      Some("""SELECT 'c' || CAST(o_custkey AS VARCHAR) AS m_id,
             |  'o' || CAST(o_orderkey AS VARCHAR) AS n_id
             |FROM orders JOIN customer ON c_custkey = o_custkey
             |WHERE o_orderstatus = 'O' AND c_mktsegment IN ('BUILDING', 'MACHINERY')
             |ORDER BY m_id, n_id""".stripMargin)),

    // V4: property-vector search — semantic entity lookup over the secondary
    // node_properties space (property_indexing_service.py:61-1279): embed
    // every distinct part name, KNN against an embedded query string.
    Entry("q52_property_search",
      (s, d) => {
        import graft.functions.VectorFunctions._
        import s.implicits._
        val embedder = new HashEmbedder(32)
        val embedUdf = udf((t: String) => embedder.embed(t))
        val props = Tables.part(s, d).select(col("p_name").as("name")).distinct()
          .withColumn("embedding", embedUdf(col("name")))
        val qvec = Seq(Tuple1(embedder.embed("small shiny widget"))).toDF("qvec")
        props.crossJoin(broadcast(qvec))
          .withColumn("score", round(cosineSim(col("embedding"), col("qvec")), 4))
          .select(col("name"), col("score"))
          .orderBy(desc("score"), col("name"))
          .limit(10)
      },
      None),

    // A9 (beyond parity, free via Catalyst): ROLLUP aggregation with
    // subtotal rows — grouping-set machinery at scale.
    Entry("q53_rollup_agg",
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // A9: sketch-based distinct (HLL++) next to the exact count — the 100 TB
    // cardinality path. The raw sketch estimate is engine-specific, so the
    // oracle-compared output carries the exact count plus a BOOLEAN asserting
    // the sketch landed within 5× its configured rsd (1%) — the sketch stays
    // in the measured plan and the check is SQL-expressible (always TRUE).
    Entry("q54_approx_distinct",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("approx_ok"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
             |  TRUE AS approx_ok
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)))
}
