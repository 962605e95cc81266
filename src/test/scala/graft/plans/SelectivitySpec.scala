package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.engine.IvfIndex

/** Unit pins for [[AnnRewrite.estimateSelectivity]] — the measured-stats
  * formulas and the textbook fallbacks, independent of the escalation
  * integration tests (which pin probe counts, not the arithmetic). */
class SelectivitySpec extends graft.SparkSpec {
  import spark.implicits._

  private lazy val df = Seq((1L, "x", Seq("g1", "g2")))
    .toDF("id", "grp", "acl").localCheckpoint(true)

  private val stats = Some(IvfIndex.IndexStats(1000, Map.empty, Map(
    "grp" -> IvfIndex.ColStats(20, 1.0),
    "acl" -> IvfIndex.ColStats(500, 2.5))))

  private def sel(c: Column, st: Option[IvfIndex.IndexStats]): Double =
    AnnRewrite.estimateSelectivity(df.filter(c).queryExecution.analyzed, st)

  test("measured: equality 1/NDV, IN n/NDV, membership probes*avgLen/elemNDV") {
    assert(sel($"grp" === "x", stats) === 1.0 / 20)
    assert(sel(lit("x") === $"grp", stats) === 1.0 / 20)
    assert(sel($"grp".isin("a", "b", "c"), stats) === 3.0 / 20)
    assert(math.abs(sel(array_contains($"acl", "g1"), stats) - 2.5 / 500) < 1e-12)
    assert(math.abs(
      sel(arrays_overlap($"acl", array(lit("g1"), lit("g2"))), stats)
        - 2 * 2.5 / 500) < 1e-12)
    // AND multiplies
    assert(math.abs(
      sel($"grp" === "x" && array_contains($"acl", "g1"), stats)
        - (1.0 / 20) * (2.5 / 500)) < 1e-12)
    // measured numbers never exceed 1 (degenerate NDV=1)
    val one = Some(IvfIndex.IndexStats(10, Map.empty,
      Map("grp" -> IvfIndex.ColStats(1, 1.0))))
    assert(sel($"grp".isin("a", "b"), one) === 1.0)
  }

  test("no stats: textbook fallbacks unchanged") {
    assert(sel($"grp" === "x", None) === 0.1)
    assert(math.abs(sel($"grp".isin("a", "b", "c"), None) - 0.3) < 1e-12)
    assert(sel(arrays_overlap($"acl", array(lit("g1"))), None) === 0.33)
    assert(sel(array_contains($"acl", "g1"), None) === 0.33)
    // range predicates claim nothing, with or without stats
    assert(sel($"id" > 5, None) === 1.0)
    assert(sel($"id" > 5, stats) === 1.0)
  }

  test("stats for unlisted columns fall back per-predicate, not per-plan") {
    // grp has stats, id does not: equality on id uses the constant
    assert(math.abs(
      sel($"grp" === "x" && $"id" === 7L, stats) - (1.0 / 20) * 0.1) < 1e-12)
  }

  test("anchored stats never leak onto a same-named column from another relation") {
    val dim = Seq((1L, "x"), (2L, "y")).toDF("did", "grp").localCheckpoint(true)
    val joined = df.join(dim, df("id") === dim("did"))
    def plan(c: Column) = joined.filter(c).queryExecution.analyzed
    def anchorOf(name: String) = plan(lit(true)).collectLeaves()
      .flatMap(_.output).find(_.name == name).get.exprId
    val anchor = Some(anchorOf("acl")) // acl lives on the index-side leaf
    // filter on the INDEX table's grp: measured 1/20
    assert(AnnRewrite.estimateSelectivity(
      plan(df("grp") === "x"), stats, anchor) === 1.0 / 20)
    // filter on the DIM table's same-named grp: textbook 0.1, never 1/20
    assert(AnnRewrite.estimateSelectivity(
      plan(dim("grp") === "x"), stats, anchor) === 0.1)
  }
}
