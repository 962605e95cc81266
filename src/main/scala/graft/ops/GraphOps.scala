package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph traversal over `nodes(node_id, label, …)` / `edges(src, dst,
  * rel_type, …)` tables as relational self-joins — the Spark re-expression of
  * the reference's Neo4j branch (1–2-hop Cypher patterns,
  * `api_handlers/chat_gpt_completion.py:5743-5886`).
  *
  * A 1-hop pattern is `nodes ⋈ edges ⋈ nodes`; 2-hop chains a second edge
  * join; variable 1..2-hop is the union. Endpoint predicates (incl. ACL on
  * BOTH endpoints — the reference explicitly patched the dst side,
  * `chat_gpt_completion.py:2404-2406`) are pushed below the joins by
  * Catalyst. `nodes` is typically the broadcast side after label filtering.
  */
object GraphOps {

  /** 1-hop: (src:L1)-[rel]->(dst:L2) with optional per-leg predicates. */
  def oneHop(nodes: DataFrame, edges: DataFrame,
             srcPred: Column, relPred: Column, dstPred: Column): DataFrame = {
    val src = nodes.filter(srcPred)
      .select(col("node_id").as("src_id"), col("label").as("src_label"))
    val dst = nodes.filter(dstPred)
      .select(col("node_id").as("dst_id"), col("label").as("dst_label"))
    edges.filter(relPred)
      .select(col("src").as("src_id"), col("dst").as("dst_id"), col("rel_type"))
      .join(src, "src_id").join(dst, "dst_id")
      .select(col("src_id"), col("src_label"), col("rel_type"),
        col("dst_id"), col("dst_label"))
  }

  /** 2-hop: (src)-[r1]->(mid)-[r2]->(dst); mid must also pass its predicate. */
  def twoHop(nodes: DataFrame, edges: DataFrame,
             srcPred: Column, rel1Pred: Column, midPred: Column,
             rel2Pred: Column, dstPred: Column): DataFrame = {
    val hop1 = oneHop(nodes, edges, srcPred, rel1Pred, midPred)
      .select(col("src_id"), col("src_label"), col("rel_type").as("rel1"),
        col("dst_id").as("mid_id"), col("dst_label").as("mid_label"))
    val hop2 = oneHop(nodes, edges, midPred, rel2Pred, dstPred)
      .select(col("src_id").as("mid_id"), col("rel_type").as("rel2"),
        col("dst_id"), col("dst_label"))
    hop1.join(hop2, "mid_id")
      .select(col("src_id"), col("src_label"), col("rel1"), col("mid_id"),
        col("mid_label"), col("rel2"), col("dst_id"), col("dst_label"))
  }

  /** A7 — pattern discovery: distinct (src_label, rel_type, dst_label)
    * triples with counts (`memory_graph.py:5049-5136`). */
  def patternCounts(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val labels = nodes.select(col("node_id"), col("label"))
    edges
      .join(labels.withColumnRenamed("node_id", "src").withColumnRenamed("label", "src_label"), "src")
      .join(labels.withColumnRenamed("node_id", "dst").withColumnRenamed("label", "dst_label"), "dst")
      .groupBy(col("src_label"), col("rel_type"), col("dst_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("src_label"), col("rel_type"), col("dst_label"))
  }
}
