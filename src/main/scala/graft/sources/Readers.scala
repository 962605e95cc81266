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

  /** Split parsed lines into (good, bad). `lines` must have a string
    * `value` column (what `spark.read.text` / `readStream.text` yield).
    * Good rows carry the schema's columns; bad rows carry the raw line. */
  def parseJsonLines(lines: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not contain reserved column $CorruptCol")
    val withCapture = schema.add(CorruptCol, StringType)
    val parsed = lines.select(
      from_json(col("value"), withCapture,
        Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol)).as("rec"),
      col("value"))
    // from_json yields a null struct for non-JSON input and fills the
    // capture column for partially-valid JSON — both are quarantine cases.
    val bad = parsed
      .filter(col("rec").isNull || col(s"rec.$CorruptCol").isNotNull)
      .select(col("value").as("raw_line"))
    val good = parsed
      .filter(col("rec").isNotNull && col(s"rec.$CorruptCol").isNull)
      .select(schema.fieldNames.map(f => col(s"rec.$f").as(f)).toSeq: _*)
    (good, bad)
  }

  /** Same contract for CSV lines (no header handling — headers are metadata,
    * strip the first line upstream or pass real files to `csvFiles`). */
  def parseCsvLines(lines: DataFrame, schema: StructType, sep: String = ","): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not contain reserved column $CorruptCol")
    val withCapture = schema.add(CorruptCol, StringType)
    val parsed = lines.select(
      from_csv(col("value"), withCapture,
        Map("mode" -> "PERMISSIVE", "sep" -> sep,
            "columnNameOfCorruptRecord" -> CorruptCol)).as("rec"),
      col("value"))
    val bad = parsed
      .filter(col("rec").isNull || col(s"rec.$CorruptCol").isNotNull)
      .select(col("value").as("raw_line"))
    val good = parsed
      .filter(col("rec").isNotNull && col(s"rec.$CorruptCol").isNull)
      .select(schema.fieldNames.map(f => col(s"rec.$f").as(f)).toSeq: _*)
    (good, bad)
  }

  /** File-path entry points: text scan → parse. Splittable parallel read. */
  def jsonlFiles(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) =
    parseJsonLines(spark.read.text(path), schema)

  def csvFiles(spark: SparkSession, path: String, schema: StructType,
               sep: String = ","): (DataFrame, DataFrame) =
    parseCsvLines(spark.read.text(path), schema, sep)
}
