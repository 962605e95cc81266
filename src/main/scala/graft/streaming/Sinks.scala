package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.sources.Writers

/** Streaming sinks built from the batch writers.
  *
  * Structured Streaming's delivery contract to foreachBatch is
  * at-least-once: after a failure the SAME micro-batch can be re-run.
  * A sink therefore has to be idempotent per (batchId, rows) to make
  * end-to-end results effectively exactly-once. Keyed upsert has that
  * property for free — re-merging identical rows onto the same keys is a
  * no-op — as long as the swap to the new snapshot is atomic, which
  * `Writers.swapWrite` provides (write tmp → rename): readers never see a
  * half-written snapshot, and a crash between write and rename just
  * leaves the old snapshot for the replay to redo.
  *
  * This is the reference's upsert-on-write path (S4/S5 sinks) lifted onto
  * a stream; the session pipeline (T2–T4) feeds it summarized rows.
  */
object Sinks {

  /** foreachBatch body: merge the micro-batch into the keyed parquet
    * snapshot at `path`. Use as
    * `.writeStream.foreachBatch(Sinks.keyedUpsert(path, "k") _)`. */
  def keyedUpsert(path: String, key: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // one row per key within the batch (later micro-batch rows for the same
    // key win via the upsert; intra-batch ties are collapsed here)
    val incoming = batch.dropDuplicates(Seq(key))
    val existing =
      try spark.read.schema(batch.schema).parquet(path)
      catch { case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          batch.schema)
      }
    // upsert is lazy over `existing`; swapWrite materializes to a tmp dir
    // BEFORE touching `path`, so read-then-replace is safe.
    Writers.swapWrite(Writers.upsert(existing, incoming, key), path)
  }
}
