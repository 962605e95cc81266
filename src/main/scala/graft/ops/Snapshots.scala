package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: classify every key as added / removed / changed
  * between two versions of a table — the audit step behind incremental
  * ingest (did the CDC feed do what the batch says?) and the cheap
  * building block for emitting a changelog from full snapshots.
  *
  * One full-outer join on the key, comparing the tracked columns as a
  * null-safe struct: a single shuffle per side, no row ever compared twice,
  * and unchanged keys are dropped before anything downstream sees them —
  * at 100 TB the output is proportional to the churn, not the table. */
object Snapshots {

  /** Diff `newDf` against `oldDf` by `keyCols`, comparing `compareCols`.
    * Output: key columns + `change_type` ∈ {added, removed, changed}. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    require(compareCols.nonEmpty, "diff needs at least one compared column")
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__old_present", lit(true))
      .withColumnsRenamed(compareCols.map(c => c -> s"__old_$c").toMap)
    val n = newDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__new_present", lit(true))
    val oldAttrs = struct(compareCols.map(c => col(s"__old_$c")): _*)
    val newAttrs = struct(compareCols.map(col): _*)
    n.join(o, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__old_present").isNull, lit("added"))
          .when(col("__new_present").isNull, lit("removed"))
          .when(!(oldAttrs <=> newAttrs), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select((keyCols.map(col) :+ col("change_type")): _*)
  }
}
