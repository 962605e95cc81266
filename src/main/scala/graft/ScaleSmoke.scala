package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.GraphAnalytics

/** Scale smoke for the distributed connected-components path (not part of
  * `sbt test` — run manually: `sbt "runMain graft.ScaleSmoke [nRandomEdges]"`).
  *
  * Builds a graph no driver-side path could cheat through: 100 chains of
  * 1000 vertices (diameter 999 — the min-label worst case; the star
  * algorithm must collapse them in O(log n) alternations) plus a random
  * hash-generated component soup, then checks the two defining invariants
  * distributedly instead of against a second implementation:
  *   1. edge consistency — both endpoints of every edge share a component;
  *   2. label minimality — each component's label equals its min member id.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nRandom = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 100 chains of length 1000: vertices [0, 100000), edge i→i+1 within a chain
    val chains = spark.range(0, 100000)
      .filter(col("id") % 1000 =!= 999)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    // random soup over vertices [1000000, 1200000)
    val random = spark.range(0, nRandom).select(
      (pmod(xxhash64(col("id")), lit(200000)) + 1000000L).as("src"),
      (pmod(xxhash64(col("id") * 7 + 13), lit(200000)) + 1000000L).as("dst"))
    val edges = chains.union(random)

    val t0 = System.nanoTime()
    val cc = GraphAnalytics.connectedComponents(edges, maxIter = 30,
      smallGraphEdges = 0).persist()
    val nVerts = cc.count()
    val secs = (System.nanoTime() - t0) / 1e9

    val lab = cc.select(col("id"), col("comp"))
    val badEdges = edges
      .join(lab.withColumnRenamed("id", "src").withColumnRenamed("comp", "c1"), "src")
      .join(lab.withColumnRenamed("id", "dst").withColumnRenamed("comp", "c2"), "dst")
      .filter(col("c1") =!= col("c2")).count()
    val badLabels = cc.groupBy(col("comp")).agg(min(col("id")).as("mn"))
      .filter(col("comp") =!= col("mn")).count()
    val nComps = cc.select(col("comp")).distinct().count()
    val chainComps = cc.filter(col("id") < 100000)
      .select(col("comp")).distinct().count()

    println(f"[scale-smoke] vertices=$nVerts components=$nComps " +
      f"chainComponents=$chainComps ccSeconds=$secs%.1f " +
      f"edgeViolations=$badEdges labelViolations=$badLabels")
    assert(badEdges == 0, "edge endpoints in different components")
    assert(badLabels == 0, "component label is not the min member")
    assert(chainComps == 100, s"expected 100 chain components, got $chainComps")
    println("[scale-smoke] PASS")
    spark.stop()
  }
}
