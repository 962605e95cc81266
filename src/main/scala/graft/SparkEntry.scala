package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the reference's open-source search path (§3.1, `skip_neo`, qwen-only —
    * memory_graph.py:6048-6063) re-expressed: embed-space KNN top-k →
    * hydration join to the document table → ranked results. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, d)
    val hits = Similarity.knnCosine(
      emb.filter(col("vec_id") =!= 0),
      emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec")),
      "vec_id", "embedding", k = 20, threshold = -1.0)
    hits.join(Tables.documents(spark, d), col("vec_id") === col("doc_id"))
      .select(col("vec_id"), col("score"), col("lang"), col("text"))
      .orderBy(desc("score"), col("vec_id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
