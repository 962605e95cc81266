package graft

import graft.ops.GraphAnalytics

class GraphAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: two chains and an isolate pair") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),    // comp 1
      (10L, 11L),                      // comp 10
      (20L, 21L), (21L, 22L)           // comp 20
    ).toDF("src", "dst")
    val cc = GraphAnalytics.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components converge on a cycle") {
    val edges = Seq((5L, 6L), (6L, 7L), (7L, 5L)).toDF("src", "dst")
    val cc = GraphAnalytics.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet === Set(5L))
  }

  test("star CC == min-label CC == union-find on a random graph, all paths") {
    // long chains (worst case for min-label), a big cycle, isolates via
    // self-referencing pairs, and random cross links — deterministic seed
    val rnd = new scala.util.Random(42)
    val chain = (0L until 40L).map(i => (i, i + 1))                   // diameter 40
    val cycle = (1000L until 1100L).map(i => (i, 1000L + (i - 999L) % 100L))
    val random = (1 to 200).map(_ => (2000L + rnd.nextInt(150), 2000L + rnd.nextInt(150)))
    val edges = (chain ++ cycle ++ random).toDF("src", "dst")

    val minLabel = GraphAnalytics.connectedComponentsMinLabel(edges, maxIter = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // force the distributed star path (threshold 0 disables union-find)
    val star = GraphAnalytics.connectedComponents(edges, smallGraphEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unionFind = GraphAnalytics.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(star === minLabel)
    assert(unionFind === minLabel)
    assert(star(40L) === 0L)    // chain collapsed to its min in O(log n) rounds
  }

  test("star CC: fixpoint reached exactly at round maxIter succeeds via the confirm round") {
    // chain 0-1-2: round 1 already yields the stable star {(1,0),(2,0)} but
    // that differs from the initial orientation, so with maxIter=1 the loop
    // exits "unconverged" and only the confirmation round proves the fixpoint
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val cc = GraphAnalytics.connectedComponents(edges, maxIter = 1, smallGraphEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("star CC: genuinely unconverged at maxIter fails loudly instead of emitting garbage") {
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      GraphAnalytics.connectedComponents(chain, maxIter = 1, smallGraphEdges = 0).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("pageRank: sink of a star graph outranks its sources") {
    val edges = Seq(("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"))
      .toDF("src", "dst")
    val pr = GraphAnalytics.pageRank(edges, iterations = 15)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr("hub") > pr("b"))
    assert(pr("hub") > pr("c"))
    assert(pr("a") > pr("b"))         // 'a' gets the hub's rank back
    // ranks are a probability-ish distribution: all positive
    assert(pr.values.forall(_ > 0))
  }

  test("dedupClusters picks min doc id as representative") {
    val pairs = Seq((3L, 7L), (7L, 9L), (20L, 30L)).toDF("doc_a", "doc_b")
    val out = GraphAnalytics.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(3L -> 3L, 7L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L))
  }
}
