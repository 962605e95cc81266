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

  test("sequenceGaps: in-bucket, boundary-straddling, and empty-bucket gaps") {
    import spark.implicits._
    import graft.ops.Profiling
    // bucketSize=10: keys 1-8 (gap 4-5 in bucket 0), 12 (boundary gap 9-11),
    // then nothing in buckets 2-3, resuming at 41 (gap 13-40 spans whole
    // empty buckets); duplicate keys must not fabricate gaps
    val keys = Seq(1L, 2L, 3L, 6L, 7L, 8L, 8L, 12L, 41L, 42L).toDF("k")
    val out = Profiling.sequenceGaps(keys, "k", bucketSize = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq((4L, 5L, 2L), (9L, 11L, 3L), (13L, 40L, 28L)))
    // dense sequence: no gaps at all
    assert(Profiling.sequenceGaps(spark.range(5, 25).toDF("k"), "k", 7L).count() === 0L)
  }
}
