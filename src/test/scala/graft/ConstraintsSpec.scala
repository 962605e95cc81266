package graft

import org.apache.spark.sql.functions._
import graft.engine.Constraints
import graft.engine.Constraints._

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  // simulated resolveEntities output: every cascade stage's hit is visible
  private def resolved = Seq(
    // cand_id, label, name, exact, sem, fuzzy, props
    ("c1", "Person", "alice", Some("e1"), Some("s1"), Some("f1"), Map("score" -> "9")),
    ("c2", "Person", "bob", None, Some("s2"), Some("f2"), Map("score" -> "2")),
    ("c3", "Person", "carol", None, None, Some("f3"), Map("score" -> "5")),
    ("c4", "Person", "dave", None, None, None, Map("score" -> "5")),
    ("c5", "Task", "task x", None, Some("s5"), None, Map[String, String]())
  ).toDF("cand_id", "cand_label", "cand_name", "exact_id", "sem_id", "fuzzy_id", "cand_props")

  test("searchModes mask disabled stages but keep priority order") {
    val policy = MemoryPolicy(perLabel = Map(
      "Person" -> NodeConstraint("Person", searchModes = Set(ExactMode, FuzzyMode))))
    val out = Constraints.applyNodeConstraints(resolved, policy)
      .collect().map(r => r.getAs[String]("cand_id") ->
        ((r.getAs[String]("action"), r.getAs[String]("constrained_resolved_id")))).toMap
    assert(out("c1") === (("merge", "e1")))   // exact still wins
    assert(out("c2") === (("merge", "f2")))   // semantic disabled → fuzzy
    assert(out("c3") === (("merge", "f3")))
    assert(out("c4") === (("create", null)))
  }

  test("create=never turns unresolved candidates into skip") {
    val policy = MemoryPolicy(perLabel = Map(
      "Person" -> NodeConstraint("Person", create = CreateNever,
        searchModes = Set(ExactMode))))
    val out = Constraints.applyNodeConstraints(resolved, policy)
      .collect().map(r => r.getAs[String]("cand_id") -> r.getAs[String]("action")).toMap
    assert(out("c1") === "merge")
    assert(out("c2") === "skip")   // only exact allowed, none → never-create
    assert(out("c4") === "skip")
    assert(out("c5") === "merge")  // Task uses default policy (all modes)
  }

  test("when clause gates the constraint: non-matching rows get defaults") {
    val policy = MemoryPolicy(perLabel = Map(
      "Person" -> NodeConstraint("Person", create = CreateNever,
        searchModes = Set(ExactMode),
        when = Seq(WhenClause("score", WhenOp.Gte, 5)))))
    val out = Constraints.applyNodeConstraints(resolved, policy)
      .collect().map(r => r.getAs[String]("cand_id") ->
        ((r.getAs[String]("action"), r.getAs[String]("constrained_resolved_id")))).toMap
    // c2 has score 2 → constraint does not apply → default cascade (semantic)
    assert(out("c2") === (("merge", "s2")))
    // c3 score 5 → constraint applies → exact-only, none → skip
    assert(out("c3")._1 === "skip")
  }

  test("edge constraints drop edges with disallowed endpoint labels") {
    val nodes = Seq(
      ("p1", "Person"), ("c1", "Company"), ("t1", "Task")
    ).toDF("node_id", "label")
    val edges = Seq(
      ("p1", "c1", "WORKS_AT"),   // ok
      ("t1", "c1", "WORKS_AT"),   // bad src
      ("p1", "t1", "WORKS_AT"),   // bad dst
      ("t1", "c1", "BELONGS_TO")  // unconstrained type passes
    ).toDF("src", "dst", "rel_type")
    val out = Constraints.applyEdgeConstraints(edges, nodes, Seq(
      EdgeConstraint("WORKS_AT", Set("Person"), Set("Company"))))
      .collect().map(r => (r.getAs[String]("src"), r.getAs[String]("dst"), r.getAs[String]("rel_type")))
    assert(out.toSet === Set(("p1", "c1", "WORKS_AT"), ("t1", "c1", "BELONGS_TO")))
  }
}
