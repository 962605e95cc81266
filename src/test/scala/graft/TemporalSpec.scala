package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofLatest: greatest right ts <= left ts per key; equal ts matches; no-match is null") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),  // between r1 and r2
      (2L, "a", ts("2024-01-01 11:00:00")),  // EQUAL to r2 → matches r2 (≤)
      (3L, "a", ts("2024-01-01 08:00:00")),  // before all → null
      (4L, "b", ts("2024-01-01 12:00:00")),  // other key: only b's rows count
      (5L, "c", ts("2024-01-01 12:00:00"))   // key with no right rows → null
    ).toDF("event_id", "user", "ts")
    val right = Seq(
      ("a", ts("2024-01-01 09:00:00")),
      ("a", ts("2024-01-01 11:00:00")),
      ("a", ts("2024-01-01 11:30:00")),
      ("b", ts("2024-01-01 09:30:00"))
    ).toDF("user", "ts")

    val out = Temporal.asofLatest(left, right, "user", "ts", "event_id")
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(3))).toMap
    assert(out(1L) === Some(ts("2024-01-01 09:00:00")))
    assert(out(2L) === Some(ts("2024-01-01 11:00:00")))
    assert(out(3L) === None)
    assert(out(4L) === Some(ts("2024-01-01 09:30:00")))
    assert(out(5L) === None)
  }

  test("asofLatest: NULL keys never match (join semantics, not window-partition semantics)") {
    val left = Seq((1L, Option.empty[String], ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user", "ts")
    val right = Seq((Option.empty[String], ts("2024-01-01 09:00:00")),
        (Some("a"), ts("2024-01-01 09:00:00")))
      .toDF("user", "ts")
    val out = Temporal.asofLatest(left, right, "user", "ts", "event_id").collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(3)) // NULL = NULL is not a match
  }
}
