package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import graft.ops.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("every true heavy hitter (freq > n/k) survives the one-pass summary") {
    // 3000 'hot' + 2000 'warm' + 5000 singletons: n = 10000, k = 10 → any
    // item above 1000 occurrences MUST be present
    val rows = Seq.fill(3000)("hot") ++ Seq.fill(2000)("warm") ++
      (0 until 5000).map(i => s"rare$i")
    val df = rows.toDF("tok").repartition(8)
    val out = HeavyHitters.summary(df, "tok", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.contains("hot"), s"hot missing from $out")
    assert(out.contains("warm"), s"warm missing from $out")
    assert(out.size <= 9, "summary must hold at most k-1 items")
    // counts are lower bounds with undercount <= n/k (error adds over the
    // partition merges: p partials + final merge → <= 2·n/k here)
    assert(out("hot") <= 3000 && out("hot") >= 3000 - 2 * 1000)
  }

  test("exactTop: two-phase counts are exact for the surviving candidates") {
    val rows = Seq.fill(500)("a") ++ Seq.fill(300)("b") ++ Seq.fill(10)("c") ++
      (0 until 800).map(i => s"noise$i")
    val out = HeavyHitters.exactTop(rows.toDF("tok").repartition(5), "tok",
        k = 8, topN = 2)
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("a", 500L), ("b", 300L)))
  }

  test("property: MG guarantee holds for random streams and partitionings") {
    def check(prop: Prop): Unit = {
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(20).withWorkers(1), prop)
      assert(res.passed, res.status.toString)
    }
    val gen = for {
      n <- Gen.choose(50, 400)
      // zipf-ish: small alphabet with skewed draws
      items <- Gen.listOfN(n, Gen.frequency(
        (8, Gen.const("h1")), (4, Gen.const("h2")), (2, Gen.const("m1")),
        (1, Gen.alphaLowerStr.map(s => "r" + s.take(4)))))
      k <- Gen.choose(4, 12)
      parts <- Gen.choose(1, 6)
    } yield (items, k, parts)
    check(forAll(gen) { case (items, k, parts) =>
      val out = HeavyHitters.summary(items.toDF("tok").repartition(parts), "tok", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val true_ = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toLong
      val threshold = n.toDouble / k
      // guarantee 1: true heavy hitters survive
      val survived = true_.filter(_._2 > threshold).keySet.forall(out.contains)
      // guarantee 2: stored counts never exceed true counts (lower bounds)
      val lower = out.forall { case (it, c) => c <= true_.getOrElse(it, 0L) }
      survived && lower && out.size <= k - 1
    })
  }
}
