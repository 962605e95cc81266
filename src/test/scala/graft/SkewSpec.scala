package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Salted/selective skew joins must be result-identical to plain joins —
  * salting may only change row routing, never the answer. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // zipfian-ish left: key 1 is hot (60 rows), keys 2..20 have 2 rows each
  private def leftDf() =
    ((1 to 60).map(i => (1L, s"hot_$i")) ++
      (2L to 20L).flatMap(k => Seq((k, s"a_$k"), (k, s"b_$k"))))
      .toDF("k", "payload")

  // right covers keys 1..15 (so 16..20 are unmatched), two rows for key 3
  private def rightDf() =
    ((1L to 15L).map(k => (k, s"dim_$k")) :+ (3L, "dim_3b"))
      .toDF("rk", "dim")

  private def plain(joinType: String) =
    leftDf().join(rightDf(), col("k") === col("rk"), joinType)
      .select("k", "payload", "rk", "dim")
      .collect().map(_.toString).sorted.toSeq

  test("saltedJoin inner == plain inner (incl. one-to-many right keys)") {
    val out = Skew.saltedJoin(leftDf(), rightDf(), "k", "rk", saltFactor = 7)
      .select("k", "payload", "rk", "dim")
      .collect().map(_.toString).sorted.toSeq
    assert(out === plain("inner"))
  }

  test("saltedJoin left keeps unmatched left rows exactly once") {
    val out = Skew.saltedJoin(leftDf(), rightDf(), "k", "rk",
        saltFactor = 5, joinType = "left")
      .select("k", "payload", "rk", "dim")
      .collect().map(_.toString).sorted.toSeq
    assert(out === plain("left"))
  }

  test("skewJoin: heavy key salted, tail plain, union == plain join") {
    for (joinType <- Seq("inner", "left")) {
      val out = Skew.skewJoin(leftDf(), rightDf(), "k", "rk",
          saltFactor = 4, heavyThreshold = 10, joinType = joinType)
        .select("k", "payload", "rk", "dim")
        .collect().map(_.toString).sorted.toSeq
      assert(out === plain(joinType), s"joinType=$joinType")
    }
  }

  test("skewJoin with no key over threshold degenerates to the plain join") {
    val out = Skew.skewJoin(leftDf(), rightDf(), "k", "rk",
        saltFactor = 4, heavyThreshold = 1000)
      .select("k", "payload", "rk", "dim")
      .collect().map(_.toString).sorted.toSeq
    assert(out === plain("inner"))
  }

  test("shared non-key column names survive (plain joins allow them; so must we)") {
    val l = Seq((1L, "t1", "p1"), (2L, "t2", "p2")).toDF("k", "ts", "payload")
    val r = Seq((1L, "t9", "d1")).toDF("rk", "ts", "dim")
    val out = Skew.skewJoin(l, r, "k", "rk", saltFactor = 3, heavyThreshold = 0)
      .collect().map(_.toSeq).toSeq
    assert(out === Seq(Seq(1L, "t1", "p1", 1L, "t9", "d1")))
  }

  test("exact-duplicate hot-key rows spread across salt shards") {
    // 200 identical rows in >1 input partitions: content-only hashing would
    // put them all in one shard; partition-id mixing must not
    val dup = spark.range(200).repartition(8)
      .selectExpr("CAST(1 AS LONG) AS k", "'same' AS payload")
    val r = Seq((1L, "dim")).toDF("rk", "dim")
    val joined = Skew.saltedJoin(dup, r, "k", "rk", saltFactor = 8)
    assert(joined.count() === 200)
    // observe the spread through the same salt function the join uses: at
    // least two distinct salts must appear for rows spanning partitions
    val distinctSalts = dup.select(Skew.rowSalt(dup, 8).as("salt"))
      .distinct().count()
    assert(distinctSalts >= 2,
      s"identical rows all landed on one salt shard ($distinctSalts)")
  }

  test("null left keys: dropped on inner, kept once on left") {
    val l = Seq((Some(1L), "x"), (None, "n1"), (None, "n2")).toDF("k", "payload")
    val r = Seq((1L, "dim_1")).toDF("rk", "dim")
    val inner = Skew.saltedJoin(l, r, "k", "rk", saltFactor = 3).collect()
    assert(inner.length === 1 && inner.head.getString(1) === "x")
    val leftJ = Skew.skewJoin(l, r, "k", "rk", saltFactor = 3,
        heavyThreshold = 1, joinType = "left")
      .collect().map(r => (r.isNullAt(0), r.getString(1))).sorted
    assert(leftJ.toSeq === Seq((false, "x"), (true, "n1"), (true, "n2")))
  }
}
