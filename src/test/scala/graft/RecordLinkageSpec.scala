package graft

import graft.ops.RecordLinkage

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private val priors = Seq((0.9, 0.1), (0.8, 0.2))

  test("fellegiSunter: scores are the exact literal-weight sums; blocking " +
    "bounds the pair space; cutoff filters") {
    val recs = Seq(
      // block 1: (1,2) agree on both fields, (1,3)/(2,3) agree on f1 only
      (1L, 1, "x", "p"),
      (2L, 1, "x", "p"),
      (3L, 1, "x", "q"),
      // block 2: never compared against block 1
      (4L, 2, "x", "p")
    ).toDF("id", "blk", "f1", "f2")
    val Seq((wa1, wd1), (wa2, wd2)) = RecordLinkage.weights(priors)
    val all = RecordLinkage.fellegiSunter(recs, "id", "blk",
      Seq("f1", "f2"), priors, cutoff = Double.MinValue).collect()
    // 3 within-block pairs, zero cross-block
    assert(all.length === 3)
    val scores = all.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(scores((1L, 2L)) === wa1 + wa2)           // full agreement
    assert(scores((1L, 3L)) === wa1 + wd2)           // f1 only
    assert(scores((2L, 3L)) === wa1 + wd2)
    // cutoff keeps only the full-agreement pair
    val linked = RecordLinkage.fellegiSunter(recs, "id", "blk",
      Seq("f1", "f2"), priors, cutoff = wa1 + wa2 - 1e-9)
    assert(linked.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 2L)))
  }

  test("fellegiSunter: nulls never agree") {
    val recs = Seq(
      (1L, 1, Option.empty[String]),
      (2L, 1, Option.empty[String]),
      (3L, 1, Some("v"))
    ).toDF("id", "blk", "f1")
    val Seq((_, wd)) = RecordLinkage.weights(Seq((0.9, 0.1)))
    val out = RecordLinkage.fellegiSunter(recs, "id", "blk", Seq("f1"),
      Seq((0.9, 0.1)), cutoff = Double.MinValue).collect()
    assert(out.length === 3)
    assert(out.forall(_.getDouble(2) === wd))        // null = null disagrees
  }
}
