package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns

/** Round-4 continuation set: corpus-statistics diagnostics and the
  * remaining training-data-pipeline operators (bitext mining, blocklist
  * gating, packing efficiency, agreement metrics, retractable-aggregate
  * IVM). Every entry is DuckDB-oracle-checked.
  */
object PipelineQueries {

  def entries: Seq[Entry] = Seq(

    // Zipf's-law fit over the token frequency distribution: OLS of
    // ln(freq) on ln(rank) across the top-200 vocabulary. The standard
    // corpus-health diagnostic (natural text fits slope ≈ −1; template or
    // machine-generated text flattens or steepens it — compare per-source
    // to catch synthetic contamination). One explode + one map-side-combined
    // count; the regression runs on a 200-row relation, so the OLS sums are
    // a single partial-aggregable pass. Slope/intercept/r² emitted float32
    // (ln low bits and partition sum order are engine-dependent).
    Entry("q229_zipf_fit",
      (s, d) => {
        val tf = Tables.documents(s, d)
          .select(explode(Fns.tokens(col("text"))).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        tf.withColumn("rank",
            row_number().over(Window.orderBy(desc("cnt"), col("w"))))
          .filter(col("rank") <= 200)
          .agg(
            count(lit(1)).as("n_terms"),
            expr("regr_slope(ln(cnt), ln(rank))").cast("float").as("zipf_slope"),
            expr("regr_intercept(ln(cnt), ln(rank))").cast("float")
              .as("zipf_intercept"),
            expr("regr_r2(ln(cnt), ln(rank))").cast("float").as("r2"))
      },
      Some("""WITH tf AS (
             |  SELECT w, count(*) AS cnt FROM (
             |    SELECT unnest(string_split(lower(text), ' ')) AS w
             |    FROM documents)
             |  WHERE length(w) > 0 GROUP BY w),
             |ranked AS (
             |  SELECT cnt, rank FROM (
             |    SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rank
             |    FROM tf)
             |  WHERE rank <= 200)
             |SELECT count(*) AS n_terms,
             |  CAST(regr_slope(ln(cnt), ln(rank)) AS REAL) AS zipf_slope,
             |  CAST(regr_intercept(ln(cnt), ln(rank)) AS REAL) AS zipf_intercept,
             |  CAST(regr_r2(ln(cnt), ln(rank)) AS REAL) AS r2
             |FROM ranked""".stripMargin)),

    // Margin-based bitext mining (Artetxe & Schwenk): split the embedding
    // space into two "languages" (vec_id parity), and for each source
    // vector keep its best cross-side neighbor scored by
    // margin = cos(a,b) / mean(avg-kNN(a), avg-kNN(b)) — the ratio form
    // that suppresses hubness. Both directions are ONE corpus scan each
    // with the query side broadcast and a bounded TopK aggregation (≤ k
    // rows per query per partition leave the map side), i.e. the q122
    // batch-KNN plan twice; at 100 TB the query side is the smaller corpus
    // (or IVF-routed via AnnRewrite). Raw cosines are bit-exact across
    // engines (fixed-order double fold); margin divides two k-term
    // averages, so it is emitted float32.
    Entry("q230_margin_bitext",
      (s, d) => {
        import graft.ops.Similarity
        val emb = Tables.embeddings(s, d)
        val a = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
          .select(col("vec_id").as("a_id"), col("embedding"))
        val b = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
          .select(col("vec_id").as("b_id"), col("embedding"))
        val fwd = Similarity.knnBatch(b,
            a.select(col("a_id"), col("embedding").as("qvec")),
            "b_id", "embedding", "a_id", "qvec", k = 4)
          .localCheckpoint(true)
        val avgA = fwd.groupBy(col("a_id")).agg(avg(col("score")).as("avg_a"))
        val best = fwd.filter(col("rank") === 1)
          .select(col("a_id"), col("b_id"), col("score").as("cos"))
        val avgB = Similarity.knnBatch(a,
            b.select(col("b_id"), col("embedding").as("qvec")),
            "a_id", "embedding", "b_id", "qvec", k = 4)
          .groupBy(col("b_id")).agg(avg(col("score")).as("avg_b"))
        best.join(avgA, "a_id").join(avgB, "b_id")
          .withColumn("margin",
            col("cos") / ((col("avg_a") + col("avg_b")) / 2))
          .filter(col("margin") >= 1.02)
          .select(col("a_id"), col("b_id"), col("cos"),
            col("margin").cast("float").as("margin"))
          .orderBy(col("a_id"))
      },
      Some {
        val cos = OracleSql.cosine("a.embedding", "b.embedding")
        s"""WITH a AS (
           |  SELECT vec_id AS a_id, embedding FROM embeddings
           |  WHERE vec_id % 2 = 0),
           |b AS (
           |  SELECT vec_id AS b_id, embedding FROM embeddings
           |  WHERE vec_id % 2 = 1),
           |ab AS MATERIALIZED (
           |  SELECT a_id, b_id, $cos AS s
           |  FROM a CROSS JOIN b),
           |fr AS (
           |  SELECT a_id, b_id, s,
           |    row_number() OVER (PARTITION BY a_id ORDER BY s DESC, b_id)
           |      AS rk
           |  FROM ab),
           |avga AS (
           |  SELECT a_id, avg(s) AS avg_a FROM fr WHERE rk <= 4 GROUP BY 1),
           |best AS (SELECT a_id, b_id, s AS cos FROM fr WHERE rk = 1),
           |rr AS (
           |  SELECT a_id, b_id, s,
           |    row_number() OVER (PARTITION BY b_id ORDER BY s DESC, a_id)
           |      AS rk
           |  FROM ab),
           |avgb AS (
           |  SELECT b_id, avg(s) AS avg_b FROM rr WHERE rk <= 4 GROUP BY 1)
           |SELECT best.a_id, best.b_id, cos,
           |  CAST(cos / ((avg_a + avg_b) / 2) AS REAL) AS margin
           |FROM best
           |JOIN avga USING (a_id)
           |JOIN avgb USING (b_id)
           |WHERE cos / ((avg_a + avg_b) / 2) >= 1.02
           |ORDER BY a_id""".stripMargin
      }),

    // Blocklist gating report (the wordlist-filter step every web-scale
    // curation pipeline runs before training): per source, how many docs
    // contain a blocklisted term, total hit occurrences, and the flag
    // rate. One token scan, map-side array intersection, one combinable
    // aggregation — no shuffle beyond the per-source rollup. Rates are
    // single divisions of exact integers (bit-identical across engines,
    // per the no-rounding discipline).
    Entry("q231_blocklist_rate",
      (s, d) => {
        val blocked = Seq("slow", "drop", "stale")
        val toks = Fns.tokens(col("text"))
        Tables.documents(s, d)
          .withColumn("n_hits",
            size(filter(toks, t =>
              array_contains(array(blocked.map(lit): _*), t))).cast("long"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(col("n_hits") > 0, 1L).otherwise(0L)).as("n_flagged"),
            sum(col("n_hits")).as("total_hits"))
          .withColumn("flag_rate", col("n_flagged") / col("n_docs"))
          .orderBy(col("source"))
      },
      Some("""WITH f AS (
             |  SELECT source,
             |    CAST(len(list_filter(string_split(lower(text), ' '),
             |      t -> list_contains(['slow', 'drop', 'stale'], t)))
             |      AS BIGINT) AS n_hits
             |  FROM documents)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_flagged,
             |  CAST(sum(n_hits) AS BIGINT) AS total_hits,
             |  CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    ::DOUBLE / count(*) AS flag_rate
             |FROM f GROUP BY source ORDER BY source""".stripMargin)),

    // Packing-efficiency report: run the q121 greedy sequence packer
    // (per-shard cumsum bin assignment at seqLen=512) and report per shard
    // how well the bins fill — sequence count, fill rate against capacity,
    // overflow bins (a single doc longer than seqLen), and the largest
    // bin. The metric that tells you whether packing wastes training
    // FLOPs; one window + two combinable aggregations.
    Entry("q232_packing_efficiency",
      (s, d) => {
        val seqLen = 512
        val packed = graft.ops.Packing.sequencePack(
          Tables.documents(s, d), "doc_id", "text", "lang", seqLen)
        packed.groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_seqs"),
            sum(col("n_docs")).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            sum(when(col("n_tokens") > seqLen, 1L).otherwise(0L))
              .as("n_overflow"),
            max(col("n_tokens")).as("max_seq_tokens"))
          .withColumn("fill_rate",
            col("total_tokens") / (col("n_seqs") * seqLen))
          .orderBy(col("lang"))
      },
      Some("""WITH t AS (
             |  SELECT lang, doc_id,
             |    CAST(len(string_split(lower(text), ' ')) AS BIGINT)
             |      AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT lang, n_tokens,
             |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
             |      AS cum
             |  FROM t),
             |seqs AS (
             |  -- floor, not bare CAST: DuckDB's double->BIGINT cast rounds
             |  -- to nearest while Spark's truncates
             |  SELECT lang, CAST(floor((cum - n_tokens) / 512) AS BIGINT)
             |      AS seq_id,
             |    count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
             |  FROM c GROUP BY 1, 2)
             |SELECT lang, count(*) AS n_seqs,
             |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |  CAST(sum(CASE WHEN n_tokens > 512 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_overflow,
             |  max(n_tokens) AS max_seq_tokens,
             |  CAST(sum(n_tokens) AS BIGINT)::DOUBLE / (count(*) * 512)
             |    AS fill_rate
             |FROM seqs GROUP BY lang ORDER BY lang""".stripMargin))
  )
}
