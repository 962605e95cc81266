package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Line-oriented ingest sources (JSONL / CSV) with quarantine semantics —
  * the shape a 100 TB training-data ingest needs: a malformed line must
  * neither fail the job (FAILFAST) nor silently vanish (DROPMALFORMED);
  * it lands in a `bad` side-channel for audit and replay.
  *
  * Deliberately NOT the DataFrameReader corrupt-column path: filtering the
  * json/csv datasource's `_corrupt_record` requires caching the raw scan
  * (Spark refuses the query otherwise), which is exactly what a 100 TB read
  * cannot do. Instead lines are read as text and parsed with
  * `from_json`/`from_csv` carrying an inline corrupt-capture column — one
  * streaming pass, no cache, splittable, and the same expression works in
  * Structured Streaming (`readStream.text`).
  *
  * The reference ingests documents as JSON bodies (FastAPI models —
  * `memory/models.py`); this generalizes that boundary to bulk files.
  */
object Readers {

  val CorruptCol = "_graft_corrupt"

  /** Shared quarantine split: a parser yields a null struct for an
    * unparseable line and fills the capture column for a partially-valid
    * one — both are quarantine cases. */
  private def split(lines: DataFrame, schema: StructType,
                    parse: (org.apache.spark.sql.Column, StructType) => org.apache.spark.sql.Column)
      : (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not contain reserved column $CorruptCol")
    val parsed = lines.select(
      parse(col("value"), schema.add(CorruptCol, StringType)).as("rec"),
      col("value"))
    val bad = parsed
      .filter(col("rec").isNull || col(s"rec.$CorruptCol").isNotNull)
      .select(col("value").as("raw_line"))
    val good = parsed
      .filter(col("rec").isNotNull && col(s"rec.$CorruptCol").isNull)
      .select(schema.fieldNames.map(f => col(s"rec.$f").as(f)).toSeq: _*)
    (good, bad)
  }

  /** Split parsed lines into (good, bad). `lines` must have a string
    * `value` column (what `spark.read.text` / `readStream.text` yield).
    * Good rows carry the schema's columns; bad rows carry the raw line. */
  def parseJsonLines(lines: DataFrame, schema: StructType): (DataFrame, DataFrame) =
    split(lines, schema, (c, s) => from_json(c, s,
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)))

  /** Same contract for CSV lines (no header handling — headers are metadata,
    * strip the first line upstream or pass real files to `csvFiles`). */
  def parseCsvLines(lines: DataFrame, schema: StructType, sep: String = ","): (DataFrame, DataFrame) =
    split(lines, schema, (c, s) => from_csv(c, s,
      Map("mode" -> "PERMISSIVE", "sep" -> sep,
          "columnNameOfCorruptRecord" -> CorruptCol)))

  /** File-path entry points: text scan → parse. Splittable parallel read. */
  def jsonlFiles(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) =
    parseJsonLines(spark.read.text(path), schema)

  def csvFiles(spark: SparkSession, path: String, schema: StructType,
               sep: String = ","): (DataFrame, DataFrame) =
    parseCsvLines(spark.read.text(path), schema, sep)

  /** Read a table maintained by the partition-scoped write path
    * ([[Writers.upsertPartitioned]] / [[Writers.deletePartitioned]] and
    * the `mergePartitioned`-core sinks), HEALING first — the read-side
    * half of that path's crash contract.
    *
    * A crash between a partition's retire and promote renames leaves its
    * last complete contents under the sibling `path + ".upsert.retired"`
    * root; the WRITERS heal it on their next call, but a plain
    * `spark.read.parquet(path)` in the crash-to-next-merge window would
    * silently miss the whole partition. Reading through here promotes
    * any orphaned partitions first ([[Writers.healPartitions]] — a no-op
    * unless a crash actually happened, one existence probe otherwise), so
    * readers always see every partition's last complete snapshot.
    *
    * Pass `schema` for tables whose partition-column types matter
    * (inference reads a string tenant "0" back as int) — same pinning
    * rule as the writers themselves.
    *
    * CONCURRENCY: the partition heal inherits the write path's
    * single-writer contract (`Writers.mergePartitioned`) — do not call
    * while a MERGE is LIVE on the same table, since a heal observing the
    * retire-to-promote window would promote the retired copy back under
    * the writer. Concurrent readers healing the same crash orphan are safe
    * (tolerant rename). The SWAP discipline is handled without renames:
    * a missing primary falls back to reading the retired `.swap.old`
    * copy in place (`Writers.swapReadPath`), so a serving session racing
    * a live swapWrite can never abort the writer's promote (ADVICE r11) —
    * all swap renames stay with the single writer. */
  def table(spark: SparkSession, path: String,
            schema: Option[StructType] = None): DataFrame = {
    Writers.healPartitions(spark, path)
    // swap-maintained (unpartitioned) tables have the analogous crash
    // window: primary retired to `.swap.old`, promote never ran — read
    // the retired copy NON-DESTRUCTIVELY (the writer heals on its next
    // swap), so ONE reader entry point covers both write disciplines
    // (no-op existence probes otherwise)
    val resolved = Writers.swapReadPath(spark, path)
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).parquet(resolved)
  }

  /** [[table]] WITHOUT the partition crash-heal — the read a long-lived
    * SERVING session uses when it refreshes its cached handle on a
    * generation bump ([[Writers.Generation]]). The heal renames retired
    * partition directories, which is only safe when no merge is live;
    * a serving refresh cannot know that, so it must never rename — all
    * renames stay with the single writer (the same non-destructive
    * discipline as `swapReadPath`, ADVICE r11). Since refreshes are
    * triggered by a POST-completion generation bump, the state read here
    * is a complete promoted snapshot; a crashed writer never bumps, so
    * the session keeps serving its previous pinned state until recovery
    * (exactly the last-complete-snapshot contract). */
  def servingSnapshot(spark: SparkSession, path: String,
                      schema: Option[StructType] = None): DataFrame = {
    val resolved = Writers.swapReadPath(spark, path)
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).parquet(resolved)
  }
}
