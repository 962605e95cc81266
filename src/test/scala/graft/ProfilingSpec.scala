package graft

import graft.ops.Profiling

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, nulls, distincts, min/max per column from one pass") {
    val df = Seq(
      (1L, Some("a"), Some(10)),
      (2L, Some("b"), None),
      (3L, Some("a"), Some(30)),
      (4L, None, Some(30))
    ).toDF("id", "s", "v")
    val out = Profiling.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), Option(r.getString(5))))).toMap
    assert(out("id") === ((4L, 0L, 4L, Some("1"), Some("4"))))
    assert(out("s") === ((4L, 1L, 2L, Some("a"), Some("b"))))
    assert(out("v") === ((4L, 1L, 2L, Some("10"), Some("30"))))
  }

  test("profile of an all-null column reports zero distincts and null extrema") {
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "s")
    val out = Profiling.profile(df, Seq("s")).collect().head
    assert(out.getLong(1) === 2L && out.getLong(2) === 2L && out.getLong(3) === 0L)
    assert(out.isNullAt(4) && out.isNullAt(5))
  }
}
