package graft.ops

import org.apache.spark.sql.DataFrame

/** TOON (token-oriented) response rendering — the reference's
  * `response_format=toon` (`models/memory_models.py:29-37`, search route
  * doc `memory_routes_v1.py:2236-2247`): field names are hoisted into one
  * header instead of repeating per row, cutting the token cost of feeding
  * results back to an LLM versus JSON.
  *
  *   results[3]{memory_id,score,title}:
  *     m1,0.91,some title
  *     m2,0.88,"quoted, because comma"
  *     m3,0.71,
  *
  * This is an API-EDGE formatter, not an engine operator: it collects, so
  * call it only on bounded results (a top-k) — the guard enforces that.
  * Cells are CSV-escaped (quotes doubled) so the format round-trips;
  * nulls render empty. */
object Toon {

  def format(df: DataFrame, name: String = "results", maxRows: Int = 1000): String = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"TOON formatting is for bounded results — got more than $maxRows rows")
    val cols = df.columns
    def cell(v: Any): String = v match {
      case null => ""
      case s: String if s.exists(c => c == ',' || c == '\n' || c == '"') =>
        "\"" + s.replace("\"", "\"\"") + "\""
      case other => other.toString
    }
    val header = s"$name[${rows.length}]{${cols.mkString(",")}}:"
    (header +: rows.toSeq.map(r =>
      "  " + cols.indices.map(i => cell(r.get(i))).mkString(","))).mkString("\n")
  }
}
