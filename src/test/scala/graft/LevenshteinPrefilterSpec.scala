package graft

import org.apache.spark.sql.functions._
import graft.plans.LevenshteinPrefilter

class LevenshteinPrefilterSpec extends SparkSpec {
  import spark.implicits._

  private def armed[A](f: => A): A = {
    val before = spark.experimental.extraOptimizations
    GraftExtensions.armOptimizations(spark)
    try f finally spark.experimental.extraOptimizations = before
  }

  test("threshold-variant contract the rewrite relies on") {
    // levenshtein(a,b,k) returns the distance when <= k, -1 past it
    val r = spark.sql(
      """SELECT levenshtein('kitten', 'sitting', 2) AS over,
        |       levenshtein('kitten', 'sitting', 3) AS at,
        |       levenshtein('same', 'same', 0) AS zero""".stripMargin).head()
    assert(r.getInt(0) === -1)
    assert(r.getInt(1) === 3)
    assert(r.getInt(2) === 0)
  }

  test("rewrite fires: length guard + banded DP in the optimized plan") {
    armed {
      // parallelize-backed input: ConvertToLocalRelation would otherwise
      // fold a filtered literal LocalRelation to a result before we can
      // inspect the rewritten predicate
      val df = spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(("abc", "abd"), ("abc", "abcdefghij"))))
        .toDF("a", "b")
        .filter(levenshtein(col("a"), col("b")) <= 2)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("Some(2)) >= 0"), s"banded threshold call missing:\n$plan")
      assert(plan.contains("abs((length("), s"length guard missing:\n$plan")
      assert(df.collect().map(r => r.getString(1)).toSeq === Seq("abd"))
    }
  }

  test("rewritten predicate is result-identical, including nulls and NOT") {
    val rnd = new scala.util.Random(11)
    def word() = (0 until 3 + rnd.nextInt(6))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val rows = (1 to 200).map { i =>
      (i.toLong,
        if (i % 17 == 0) null else word(),
        if (i % 23 == 0) null else word())
    }
    val df = rows.toDF("id", "a", "b")
    val pred = levenshtein(col("a"), col("b")) <= 2
    val base = df.filter(pred).select("id").collect().map(_.getLong(0)).toSet
    val baseNot = df.filter(!pred).select("id").collect().map(_.getLong(0)).toSet
    armed {
      val got = df.filter(pred).select("id").collect().map(_.getLong(0)).toSet
      val gotNot = df.filter(!pred).select("id").collect().map(_.getLong(0)).toSet
      assert(got === base)
      assert(gotNot === baseNot)
    }
  }

  test("strict < and long-cast comparisons rewrite too; negative bounds don't") {
    armed {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(("ab", "ax")))).toDF("a", "b")
      val strict = df.filter(levenshtein(col("a"), col("b")) < 2)
      assert(strict.queryExecution.optimizedPlan.toString.contains("Some(1)) >= 0"))
      assert(strict.count() === 1)
      val casted = df.filter(levenshtein(col("a"), col("b")).cast("long") <= 1L)
      assert(casted.queryExecution.optimizedPlan.toString.contains("Some(1)) >= 0"))
      assert(casted.count() === 1)
      val negative = df.filter(levenshtein(col("a"), col("b")) <= -1)
      assert(!negative.queryExecution.optimizedPlan.toString.contains(">= 0"))
      assert(negative.count() === 0)
    }
  }

  test("join conditions rewrite as well") {
    armed {
      val a = Seq((1L, "alpha")).toDF("ka", "na")
      val b = Seq((2L, "alphq"), (3L, "omega")).toDF("kb", "nb")
      val j = a.join(b, levenshtein(col("na"), col("nb")) <= 1)
      assert(j.queryExecution.optimizedPlan.toString.contains("Some(1)) >= 0"))
      assert(j.collect().map(_.getString(3)).toSeq === Seq("alphq"))
    }
  }

  test("rule object is directly idempotent") {
    val df = Seq(("x", "y")).toDF("a", "b")
      .filter(levenshtein(col("a"), col("b")) <= 1)
    val once = LevenshteinPrefilter(df.queryExecution.analyzed)
    val twice = LevenshteinPrefilter(once)
    assert(once.toString === twice.toString)
  }
}
