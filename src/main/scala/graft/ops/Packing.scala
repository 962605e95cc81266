package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Training-sequence packing — the concat-then-chop step that turns a
  * document corpus into fixed-length pretraining sequences: documents
  * stream in stable id order, token offsets accumulate, and a document
  * belongs to the sequence its FIRST token lands in (documents may span a
  * boundary; the chop is by token position, not document).
  *
  * Scale shape: ONE window cumsum partitioned by the shard column — each
  * shard (source, date, …) packs independently, so no global single-task
  * ordering exists anywhere; a 100 TB corpus packs as thousands of
  * parallel shard scans. Deterministic: ordering is (idCol), never
  * partition layout.
  */
object Packing {

  /** Per (shard, sequence): how many documents start there and their total
    * token mass. `seqLen` is the training context length. */
  def sequencePack(docs: DataFrame, idCol: String, textCol: String,
                   shardCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
    docs
      .select(col(shardCol), col(idCol),
        size(Fns.tokens(col(textCol))).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("seq_id",
        ((col("cum") - col("n_tokens")) / seqLen).cast("long"))
      .groupBy(col(shardCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
  }
}
