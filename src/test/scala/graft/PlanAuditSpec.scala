package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** The plan-budget machinery itself: the collector must SEE the three
  * structural shapes it meters (else the EntrySpec ratchet is blind), and
  * the budget file must roundtrip. */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  test("collector counts exchanges, global sorts and cartesians of a known plan") {
    val label = new java.util.concurrent.atomic.AtomicReference[String]("probe")
    val audit = PlanAudit.start(spark, () => label.get())
    val df = (1 to 100).toDF("x")
    // one groupBy exchange + one global sort (collect, not count — an
    // aggregate on top would let the optimizer erase the sort)
    df.groupBy(($"x" % 10).as("k")).agg(sum($"x").as("s")).orderBy($"k").collect()
    // one cartesian (non-equi broadcast nested loop)
    df.as("a").join((1 to 5).toDF("y").as("b"), $"a.x" > $"b.y").count()
    val counts = audit.stop()("probe")
    assert(counts.exchanges >= 1, s"no exchange seen: $counts")
    assert(counts.globalSorts >= 1, s"no global sort seen: $counts")
    assert(counts.cartesians >= 1, s"no cartesian seen: $counts")
  }

  test("attribution follows the label across a drain") {
    val label = new java.util.concurrent.atomic.AtomicReference[String]("first")
    val audit = PlanAudit.start(spark, () => label.get())
    val df = (1 to 100).toDF("x")
    df.groupBy(($"x" % 10).as("k")).count().count()
    ColumnBridge.drainListenerBus(spark)
    label.set("second")
    df.orderBy($"x".desc).limit(3).collect()
    val counts = audit.stop()
    assert(counts("first").exchanges >= 1)
    // TakeOrdered, not a global sort — second must not inherit first's work
    assert(counts.get("second").forall(_.exchanges == 0))
  }

  test("budget file roundtrips and fitsIn is per-metric") {
    val dir = java.nio.file.Files.createTempDirectory("planbudget").toString
    val m = Map(
      "q01_a" -> PlanAudit.Counts(3, 0, 1),
      "q02_b" -> PlanAudit.Counts(0, 2, 0))
    PlanAudit.write(s"$dir/b.json", m)
    assert(PlanAudit.read(s"$dir/b.json") === m)
    assert(PlanAudit.Counts(3, 0, 1).fitsIn(m("q01_a")))
    assert(!PlanAudit.Counts(4, 0, 1).fitsIn(m("q01_a")))
    assert(!PlanAudit.Counts(3, 0, 2).fitsIn(m("q01_a")))
    assert(!PlanAudit.Counts(3, 1, 1).fitsIn(m("q01_a")))
  }
}
