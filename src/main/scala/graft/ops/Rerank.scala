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
}
