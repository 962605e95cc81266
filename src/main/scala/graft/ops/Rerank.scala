package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns._

/** W5 — pluggable rerank stage (`memory/memory_graph.py:6931-7113`). In
  * production the reference calls Cohere rerank-v3.5 or a per-passage LLM
  * scorer; the engine treats reranking as a trait so those become drop-in
  * implementations. The built-in deterministic implementation is a lexical
  * token-overlap scorer (the same role the tests' difflib scorer plays in
  * `tests/calculate_query_scores.py:18`), expressed entirely in codegen'd
  * column functions so it runs distributed.
  */
trait Reranker {
  /** Attach `rr_score` to candidates given the query text. */
  def score(candidates: DataFrame, textCol: String, query: String): DataFrame
}

object LexicalReranker extends Reranker {
  /** rr_score = |tokens(query) ∩ tokens(doc)| / |tokens(query)| — a ratio of
    * small integers, left unrounded for cross-engine bit-stability. */
  def score(candidates: DataFrame, textCol: String, query: String): DataFrame = {
    // split on runs of whitespace and drop empties: "foo  bar".split(" ")
    // keeps a "" token, inflating the denominator and letting unrelated
    // docs intersect on the phantom empty string
    val qTokens = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.sorted
    val qArr = array(qTokens.toIndexedSeq.map(lit): _*)
    candidates.withColumn("rr_score",
      size(array_intersect(array_distinct(tokens(col(textCol))), qArr)) /
        lit(qTokens.length.toDouble))
  }
}

object Rerank {
  /** Rerank candidates: score then re-sort, keep top-k (deterministic). */
  def rerank(candidates: DataFrame, textCol: String, idCol: String,
             query: String, k: Int, reranker: Reranker = LexicalReranker): DataFrame =
    reranker.score(candidates, textCol, query)
      .orderBy(desc("rr_score"), col(idCol))
      .limit(k)

  /** Greedy MMR (maximal marginal relevance) diversification — the
    * diversity-aware member of the rerank family: pick k results maximizing
    * `λ·relevance − (1−λ)·max cosine to the already-picked set`, so two
    * near-duplicate top hits can't crowd out a distinct third (the failure
    * mode a pure score sort has on deduplicated-but-similar corpora).
    *
    * The greedy chain is inherently sequential, and the INPUT CONTRACT is
    * the rerank stage's: a bounded candidate set (≤ oversample·topK rows,
    * never the corpus) — so it runs lazily in ONE task over the coalesced
    * candidates (no driver collect; same bounded-input posture as TOON).
    * `relCol` should be on the cosine scale (the retrieval score) for λ to
    * mean what it says. Deterministic: ties break (score desc, id asc).
    * Output = input columns + `mmr_rank` (1-based pick order). */
  def mmr(candidates: DataFrame, vecCol: String, idCol: String, relCol: String,
          k: Int, lambda: Double = 0.7, simRound: Int = -1): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.IntegerType
    val outSchema = candidates.schema.add("mmr_rank", IntegerType)
    val vIdx = candidates.schema.fieldIndex(vecCol)
    val rIdx = candidates.schema.fieldIndex(relCol)
    val iIdx = candidates.schema.fieldIndex(idCol)
    // simRound ≥ 0 rounds each pairwise cosine to that many decimals before
    // the argmax — the same trick ivfAssign uses (round(dist, 6)) so an
    // independent engine replaying the greedy makes identical picks even
    // when a final ulp differs.
    val pow10 = if (simRound >= 0) math.pow(10, simRound) else 0.0
    candidates.coalesce(1).mapPartitions { it =>
      val rows = it.toArray
      def vec(r: Row): Array[Float] = r.getSeq[Float](vIdx).toArray
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val c = if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
        if (simRound >= 0) math.rint(c * pow10) / pow10 else c
      }
      // null/NaN relevance ranks LAST (−∞), never crashes the batch — one
      // bad score in a bounded candidate set must not kill the query
      val rel = rows.map { r =>
        val v = r.get(rIdx)
        if (v == null) Double.NegativeInfinity
        else {
          val d = v.toString.toDouble
          if (d.isNaN) Double.NegativeInfinity else d
        }
      }
      val ids = rows.map(r => r.get(iIdx))
      // ties break by the id column under ITS OWN ordering (numeric ids
      // numerically — an independent SQL replay orders vec_id that way,
      // not lexicographically)
      def idLt(x: Any, y: Any): Boolean = (x, y) match {
        case (a: Long, b: Long)     => a < b
        case (a: Int, b: Int)       => a < b
        case (a: Number, b: Number) => a.doubleValue < b.doubleValue
        case (a, b)                 => a.toString < b.toString
      }
      val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
      val maxSim = Array.fill(rows.length)(0.0) // max cos to picked set, maintained incrementally
      val taken = Array.fill(rows.length)(false)
      while (picked.length < math.min(k, rows.length)) {
        var best = -1
        var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < rows.length) {
          if (!taken(i)) {
            val s = lambda * rel(i) - (1 - lambda) * (if (picked.isEmpty) 0.0 else maxSim(i))
            // best == -1 seeds from the first untaken row, so an all-(-∞)
            // remainder still picks deterministically (smallest id wins via
            // the tie branch) instead of indexing taken(-1)
            if (best == -1 || s > bestScore ||
                (s == bestScore && idLt(ids(i), ids(best)))) {
              best = i; bestScore = s
            }
          }
          i += 1
        }
        taken(best) = true
        picked += best
        val bv = vec(rows(best))
        var j = 0
        while (j < rows.length) {
          if (!taken(j)) maxSim(j) = math.max(maxSim(j), cos(vec(rows(j)), bv))
          j += 1
        }
      }
      picked.iterator.zipWithIndex.map { case (idx, rank) =>
        Row.fromSeq(rows(idx).toSeq :+ (rank + 1))
      }
    }(Encoders.row(outSchema))
  }
}
