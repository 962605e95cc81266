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

  test("rangeJoin: half-open [start,end), per key, bins only add candidates") {
    val points = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),  // == start → IN
      (2L, "u1", ts("2024-01-01 10:09:59")),  // inside → IN
      (3L, "u1", ts("2024-01-01 10:10:00")),  // == end → OUT (half-open)
      (4L, "u1", ts("2024-01-01 09:59:59")),  // before → OUT
      (5L, "u2", ts("2024-01-01 10:05:00")),  // other key, no interval → OUT
      (6L, "u1", ts("2024-01-02 03:07:00"))   // second interval, mid-bin → IN
    ).toDF("point_id", "user", "ts")
    val intervals = Seq(
      ("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), "w1"),
      // deliberately NOT bin-aligned and spanning multiple 600s bins
      ("u1", ts("2024-01-02 03:04:05"), ts("2024-01-02 03:24:05"), "w2"),
      ("u1", ts("2024-01-03 00:00:00"), ts("2024-01-02 00:00:00"), "neg") // end<start → dropped
    ).toDF("user", "w_start", "w_end", "w_name")

    val out = Temporal.rangeJoin(points, "ts", intervals,
        "w_start", "w_end", binWidthSec = 600, keys = Seq("user"))
      .select("point_id", "w_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set((1L, "w1"), (2L, "w1"), (6L, "w2")))
  }

  test("rangeJoin matches the naive inequality join on random data") {
    val rnd = new scala.util.Random(7)
    val base = ts("2024-01-01 00:00:00").getTime
    val points = (1 to 300).map { i =>
      (i.toLong, s"u${rnd.nextInt(5)}", new Timestamp(base + rnd.nextInt(86400) * 1000L))
    }.toDF("point_id", "user", "ts")
    val intervals = (1 to 60).map { i =>
      val s = base + rnd.nextInt(86400) * 1000L
      (s"u${rnd.nextInt(5)}", new Timestamp(s),
        new Timestamp(s + (60 + rnd.nextInt(7200)) * 1000L), i.toLong)
    }.toDF("user", "w_start", "w_end", "w_id")

    val got = Temporal.rangeJoin(points, "ts", intervals,
        "w_start", "w_end", binWidthSec = 900, keys = Seq("user"))
      .select("point_id", "w_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.join(intervals, Seq("user"))
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("point_id", "w_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("scd2: versions per attribute change, no-op updates collapse, open version current") {
    val log = Seq(
      (1L, "u1", ts("2024-01-01 09:00:00"), "bronze"),
      (2L, "u1", ts("2024-01-02 09:00:00"), "bronze"), // no-op → collapses
      (3L, "u1", ts("2024-01-03 09:00:00"), "gold"),
      (4L, "u1", ts("2024-01-04 09:00:00"), "bronze"), // back again → NEW version
      (5L, "u2", ts("2024-01-01 12:00:00"), "silver")
    ).toDF("event_id", "user", "ts", "tier")
    val out = Temporal.scd2(log, "user", "ts", "event_id", Seq("tier"))
      .orderBy(col("user"), col("valid_from")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      ("u1", "bronze", ts("2024-01-01 09:00:00"), Some(ts("2024-01-03 09:00:00")), false),
      ("u1", "gold", ts("2024-01-03 09:00:00"), Some(ts("2024-01-04 09:00:00")), false),
      ("u1", "bronze", ts("2024-01-04 09:00:00"), None, true),
      ("u2", "silver", ts("2024-01-01 12:00:00"), None, true)))
  }

  test("scd2: null attribute values compare null-safely") {
    val log = Seq(
      (1L, "u1", ts("2024-01-01 09:00:00"), Option.empty[String]),
      (2L, "u1", ts("2024-01-02 09:00:00"), Option.empty[String]), // null==null → no-op
      (3L, "u1", ts("2024-01-03 09:00:00"), Some("x"))
    ).toDF("event_id", "user", "ts", "tier")
    val out = Temporal.scd2(log, "user", "ts", "event_id", Seq("tier")).collect()
    assert(out.length === 2)
  }

  test("scd2 plan: change-detect and validity windows share ONE shuffle") {
    val log = Seq((1L, "u1", ts("2024-01-01 09:00:00"), "a"))
      .toDF("event_id", "user", "ts", "tier")
    val p = Temporal.scd2(log, "user", "ts", "event_id", Seq("tier"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected one key shuffle, got $exchanges:\n$p")
  }

  test("rangeJoin: a runaway interval fails fast instead of exploding the task") {
    val points = Seq((1L, ts("2024-01-01 00:00:30"))).toDF("point_id", "ts")
    val intervals = Seq(
      (ts("2024-01-01 00:00:00"), ts("9999-12-31 00:00:00"), 1L)
    ).toDF("w_start", "w_end", "w_id")
    val e = intercept[Exception] {
      Temporal.rangeJoin(points, "ts", intervals, "w_start", "w_end",
        binWidthSec = 600, maxBinsPerInterval = 1000).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("rangeJoin"),
      s"expected the fan-out guard, got: $e")
  }

  test("rangeJoin with no keys: pure bin equi-join, still exact") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:30")),
      (2L, ts("2024-01-01 05:00:00"))).toDF("point_id", "ts")
    val intervals = Seq(
      (ts("2024-01-01 00:00:00"), ts("2024-01-01 00:01:00"), 10L)).toDF("w_start", "w_end", "w_id")
    val out = Temporal.rangeJoin(points, "ts", intervals,
        "w_start", "w_end", binWidthSec = 60)
      .select("point_id", "w_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 10L)))
  }
}
