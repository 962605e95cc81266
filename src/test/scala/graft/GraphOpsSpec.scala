package graft

import org.apache.spark.sql.functions._
import graft.ops.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def nodes = Seq(
    ("p1", "Person"), ("p2", "Person"),
    ("c1", "Company"), ("t1", "Task")
  ).toDF("node_id", "label")

  private def edges = Seq(
    ("p1", "c1", "WORKS_AT"),
    ("p2", "c1", "WORKS_AT"),
    ("p1", "t1", "ASSIGNED_TO"),
    ("t1", "c1", "BELONGS_TO")
  ).toDF("src", "dst", "rel_type")

  test("oneHop matches typed pattern with endpoint predicates") {
    val out = GraphOps.oneHop(nodes, edges,
      col("label") === "Person", col("rel_type") === "WORKS_AT", col("label") === "Company")
      .collect().map(r => (r.getString(0), r.getString(3)))
    assert(out.toSet === Set(("p1", "c1"), ("p2", "c1")))
  }

  test("twoHop chains two edges through the mid node") {
    val out = GraphOps.twoHop(nodes, edges,
      col("label") === "Person", col("rel_type") === "ASSIGNED_TO",
      col("label") === "Task", col("rel_type") === "BELONGS_TO",
      col("label") === "Company")
      .collect().map(r => (r.getString(0), r.getString(3), r.getString(6)))
    assert(out.toSet === Set(("p1", "t1", "c1")))
  }

  test("patternCounts discovers label/rel/label triples") {
    val out = GraphOps.patternCounts(nodes, edges)
      .collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toMap
    assert(out(("Person", "WORKS_AT", "Company")) === 2L)
    assert(out(("Person", "ASSIGNED_TO", "Task")) === 1L)
    assert(out(("Task", "BELONGS_TO", "Company")) === 1L)
  }
}
