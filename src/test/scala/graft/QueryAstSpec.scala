package graft

import org.apache.spark.sql.functions._
import graft.ast._
import graft.domain.Fixtures

class QueryAstSpec extends SparkSpec {

  private lazy val nodes = Fixtures.nodes(spark).toDF()
  private lazy val edges = Fixtures.edges(spark).toDF()

  test("1-hop pattern with rel type and where on dst property") {
    val q = GraphQuery(
      Pattern("Person", Some("WORKS_AT"), Some("Company")),
      Seq(Where("n", "industry", CompOp.Eq, Some("tech"))),
      Return(Seq("m" -> "name", "n" -> "name"),
        orderBy = Some(("m", "name", false))))
    val out = QueryCompiler.compile(q, nodes, edges).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.forall(_._2 == "acme"))
    assert(out.nonEmpty)
    assert(out.map(_._1).sorted.toSeq === out.map(_._1).toSeq) // ordered
  }

  test("2-hop *1..2 pattern unions direct and chained matches") {
    // untyped rel: 1-hop = WORKS_AT only; 2-hop adds ASSIGNED_TO→BELONGS_TO
    // (person → task → company) pairs on top.
    val q1 = GraphQuery(
      Pattern("Person", None, Some("Company"), maxHops = 1),
      Nil, Return(Seq("m" -> "name", "n" -> "name")))
    val q2 = q1.copy(pattern = q1.pattern.copy(maxHops = 2))
    val direct = QueryCompiler.compile(q1, nodes, edges).count()
    val upTo2 = QueryCompiler.compile(q2, nodes, edges).count()
    assert(direct > 0)
    assert(upTo2 > direct)
  }

  test("operators: contains, in, comparisons on properties") {
    val q = GraphQuery(
      Pattern("Person", Some("WORKS_AT"), Some("Company")),
      Seq(
        Where("m", "name", CompOp.Contains, Some("LI")),   // alice — case-insensitive
        Where("m", "seniority", CompOp.Ge, Some(1))),
      Return(Seq("m" -> "name")))
    val out = QueryCompiler.compile(q, nodes, edges).collect().map(_.getString(0))
    assert(out.toSeq === Seq("alice"))
  }

  test("validation rejects bad alias, missing value, bad hops") {
    val base = GraphQuery(Pattern("Person"), Nil, Return(Seq("m" -> "name")))
    intercept[AstValidationException] {
      QueryCompiler.validate(base.copy(wheres = Seq(Where("x", "p", CompOp.Eq, Some(1)))))
    }
    intercept[AstValidationException] {
      QueryCompiler.validate(base.copy(wheres = Seq(Where("m", "p", CompOp.Eq, None))))
    }
    intercept[AstValidationException] {
      QueryCompiler.validate(base.copy(pattern = Pattern("Person", maxHops = 3)))
    }
    intercept[AstValidationException] {
      QueryCompiler.validate(base.copy(ret = Return(Nil)))
    }
  }

  test("IsNull / IsNotNull need no value; properties fall back to map") {
    val q = GraphQuery(
      Pattern("Person", Some("WORKS_AT"), Some("Company")),
      Seq(Where("m", "nonexistent_prop", CompOp.IsNull)),
      Return(Seq("m" -> "name")))
    assert(QueryCompiler.compile(q, nodes, edges).count() > 0)
  }
}
