package graft

import org.apache.spark.sql.functions._
import graft.ops.Snapshots

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed and drops unchanged") {
    val oldDf = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "status", "price")
    val newDf = Seq(
      (1L, "a", 10.0),   // unchanged → dropped
      (2L, "b", 25.0),   // changed (price)
      (4L, "x", 40.0),   // changed (status)
      (5L, "e", 50.0)    // added
    ).toDF("k", "status", "price") // 3 removed
    val out = Snapshots.diff(oldDf, newDf, Seq("k"), Seq("status", "price"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(2L -> "changed", 3L -> "removed", 4L -> "changed", 5L -> "added"))
  }

  test("diff: null attribute values compare null-safely") {
    val oldDf = Seq((1L, Option.empty[String]), (2L, Some("v"))).toDF("k", "status")
    val newDf = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "status")
    val out = Snapshots.diff(oldDf, newDf, Seq("k"), Seq("status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(2L -> "changed")) // null == null is NOT a change
  }

  test("diff with composite keys") {
    val oldDf = Seq((1L, "p1", 5.0)).toDF("k", "part", "v")
    val newDf = Seq((1L, "p1", 5.0), (1L, "p2", 6.0)).toDF("k", "part", "v")
    val out = Snapshots.diff(oldDf, newDf, Seq("k", "part"), Seq("v")).collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === "p2" && out.head.getString(2) === "added")
  }
}
