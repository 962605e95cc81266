package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Retrieval
import graft.ops.Retrieval._

class RetrievalSpec extends SparkSpec {

  test("rrfFuse: rank-based fusion, absent-in-one-space handled, deterministic") {
    import spark.implicits._
    import graft.ops.Retrieval
    // space A ranks: x(1), y(2), z(3); space B ranks: y(1), x(2) — z absent
    val a = Seq(("x", 0.9), ("y", 0.8), ("z", 0.7)).toDF("id", "score")
    val b = Seq(("y", 5.0), ("x", 4.0)).toDF("id", "score")
    val out = Retrieval.rrfFuse(Seq(a, b), "id", kConst = 60)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("x") - (1.0 / 61 + 1.0 / 62)) < 1e-15)
    assert(math.abs(out("y") - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(out("z") - 1.0 / 63) < 1e-15) // missing space contributes 0
    // x and y tie exactly (same rank multiset) — bit-identical sums
    assert(out("x") === out("y"))
  }
  import spark.implicits._

  test("aclPredicate: OR across access arrays, reference F1 semantics") {
    val rows = Seq(
      // (id, owner, user_read, ws_read, role_read, org_read, ns_read)
      (1L, "alice", Seq[String](), Seq[String](), Seq[String](), Seq[String](), Seq[String]()),
      (2L, "bob", Seq("alice"), Seq[String](), Seq[String](), Seq[String](), Seq[String]()),
      (3L, "bob", Seq[String](), Seq("ws1"), Seq[String](), Seq[String](), Seq[String]()),
      (4L, "bob", Seq[String](), Seq[String](), Seq("admin"), Seq[String](), Seq[String]()),
      (5L, "bob", Seq[String](), Seq[String](), Seq[String](), Seq("org1"), Seq[String]()),
      (6L, "bob", Seq[String](), Seq[String](), Seq[String](), Seq[String](), Seq("ns1")),
      (7L, "bob", Seq("carol"), Seq("ws9"), Seq("dev"), Seq("org9"), Seq("ns9"))
    ).toDF("id", "user_id", "user_read_access", "workspace_read_access",
      "role_read_access", "organization_read_access", "namespace_read_access")
    val p = Principal("alice", Seq("ws1"), Seq("admin"), Seq("org1"), Seq("ns1"))
    val got = rows.filter(Retrieval.aclPredicate(p)).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("metaFilter: bare numeric means >= lower bound (F4)") {
    val rows = Seq(
      (1L, Map("score" -> "10", "tag" -> "x")),
      (2L, Map("score" -> "50", "tag" -> "x")),
      (3L, Map("score" -> "90", "tag" -> "y")),
      (4L, Map("tag" -> "x"))
    ).toDF("id", "meta")
    val got = rows.filter(Retrieval.metaFilter($"meta", Map("score" -> MetaAtLeast(50))))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(2L, 3L))
    val both = rows.filter(Retrieval.metaFilter($"meta",
      Map("score" -> MetaAtLeast(50), "tag" -> MetaEq("x"))))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(both === Set(2L))
    val range = rows.filter(Retrieval.metaFilter($"meta",
      Map("score" -> MetaRange(gte = Some(10), lt = Some(90)))))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(range === Set(1L, 2L))
    val anyOf = rows.filter(Retrieval.metaFilter($"meta",
      Map("tag" -> MetaAnyOf(Seq("y", "z")))))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(anyOf === Set(3L))
  }

  test("chunkRollup maps chunk hits to base memory with max score") {
    val hits = Seq(
      ("mem1_0", 0.9), ("mem1_1", 0.7), ("mem2_0", 0.5)
    ).toDF("chunk_id", "score")
    val m = Retrieval.chunkRollup(hits, "chunk_id", "score").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(m("mem1") === ((0.9, 2L)))
    assert(m("mem2") === ((0.5, 1L)))
  }

  test("fuseScores: default 0.7 for null scores, best wins per id") {
    val vector = Seq(("a", Some(0.9)), ("b", Some(0.4))).toDF("id", "score")
    val graph = Seq(("b", Option.empty[Double]), ("c", Option.empty[Double])).toDF("id", "score")
    val out = Retrieval.fuseScores(Seq("vector" -> vector, "graph" -> graph), "id", "score")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(out("a") === ((0.9, "vector")))
    assert(out("b") === ((0.7, "graph"))) // graph default 0.7 beats vector 0.4
    assert(out("c") === ((0.7, "graph")))
  }

  test("fuseScores lastSourceWins: reference dict-update semantics") {
    val vector = Seq(("a", Some(0.9))).toDF("id", "score")
    val graph = Seq(("a", Some(0.1))).toDF("id", "score")
    val out = Retrieval.fuseScores(Seq("vector" -> vector, "graph" -> graph),
      "id", "score", lastSourceWins = true)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(out("a") === ((0.1, "graph"))) // later source overwrites better score
  }

  test("stratifiedSample respects per-source quotas") {
    val df = (1 to 20).map(i => ("s1", i.toLong, i.toDouble)) ++
      (1 to 20).map(i => ("s2", (100 + i).toLong, i.toDouble))
    val out = Retrieval.stratifiedSample(df.toDF("source", "id", "score"),
      "source", "score", "id", Map("s1" -> 3), defaultQuota = 5)
    val bySource = out.collect().groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(bySource === Map("s1" -> 3, "s2" -> 5))
  }

  test("decayedCounters: 30-day half-life decay-at-read") {
    val now = lit("2024-03-01").cast("timestamp")
    val ev = Seq(
      ("m1", Timestamp.valueOf("2024-03-01 00:00:00"), 1.0),  // weight 1
      ("m1", Timestamp.valueOf("2024-01-31 00:00:00"), 1.0),  // 30d → 0.5
      ("m2", Timestamp.valueOf("2023-12-02 00:00:00"), 4.0)   // 90d → 0.5^3
    ).toDF("memory_id", "ts", "conf")
    val out = Retrieval.decayedCounters(ev, "memory_id", "ts", "conf", now, 30.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("m1") - 1.5) < 1e-9)
    assert(math.abs(out("m2") - 0.5) < 1e-9)
  }

  test("tier1 score formula and citation blend") {
    val df = Seq((0L, 0.0, 0.0)).toDF("hits", "ema", "conf")
    val zero = df.select(Retrieval.tier1Score($"hits", $"ema", $"conf")).head.getDouble(0)
    assert(zero === 0.0)
    val blended = df.select(Retrieval.tier1Blend(lit(1.0), lit(2.0))).head.getDouble(0)
    assert(math.abs(blended - (0.7 * 2.0 + 0.3 * 1.0)) < 1e-12)
    val noCite = df.select(Retrieval.tier1Blend(lit(1.0), lit(null).cast("double"))).head.getDouble(0)
    assert(noCite === 1.0)
  }

  test("bm25: term-dense doc outranks sparse; zero-hit docs filtered; rare term outweighs common") {
    val docs = Seq(
      (1L, "spark spark spark engine"),     // tf(spark)=3, short
      (2L, "spark engine engine engine"),   // tf(spark)=1
      (3L, "engine engine engine engine"),  // no query terms
      (4L, "rare spark"),                   // rare term + spark
      (5L, "engine plan cost")
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
        queryTerms = Seq("spark", "rare"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val ids = out.map(_._1)
    assert(!ids.contains(3L) && !ids.contains(5L)) // score>0 filter
    val score = out.toMap
    assert(score(1L) > score(2L))   // higher tf wins at equal df
    // doc 4 carries 'rare' (df=1) — idf dwarfs the common term's
    assert(score(4L) > score(1L))
  }

  test("weightedSample: deterministic, bounded by k, biased toward heavy weights") {
    val rows = (0 until 200).flatMap { g =>
      Seq((s"g$g-heavy", Some(50.0), s"g$g"), (s"g$g-light", Some(1.0), s"g$g"),
        (s"g$g-zero", Some(0.0), s"g$g"), (s"g$g-null", Option.empty[Double], s"g$g"))
    }
    val df = rows.toDF("id", "w", "grp")
    val got = Retrieval.weightedSample(df, "id", "w", "grp", k = 1)
      .collect().map(_.getString(0))
    assert(got.length === 200) // one winner per stratum
    assert(!got.exists(_.endsWith("zero")) && !got.exists(_.endsWith("null")),
      "zero/null weights must carry no mass")
    val heavyWins = got.count(_.endsWith("heavy"))
    // P(heavy) = 50/51 per stratum → binomial(200, .98); <170 is astronomically unlikely
    assert(heavyWins > 170, s"weighting ignored: heavy won only $heavyWins/200")
    // deterministic replay: the identical sample, not a fresh draw
    val again = Retrieval.weightedSample(df, "id", "w", "grp", k = 1)
      .collect().map(_.getString(0))
    assert(got.toSet === again.toSet)
  }
}
