package graft

import org.apache.spark.sql.functions._
import graft.ops.{BoundedCollect, Dedup, GraphAnalytics}
import graft.ops.BoundedCollect.boundedCollectList

/** The hot-bucket memory valve: bounded_collect_list semantics and the
  * stop-bucket behavior of every posting-list pair consumer. */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("bounded_collect_list: groups within cap equal collect_list; over cap → null") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 10L), ("b", 11L),
      ("c", 20L), ("c", 21L), ("c", 22L), ("c", 23L) // over cap=3
    ).toDF("k", "v")
    val out = df.groupBy($"k")
      .agg(boundedCollectList($"v", 3).as("bs"), collect_list($"v").as("cs"))
      .collect().map(r => r.getString(0) ->
        (Option(r.getSeq[Long](1)).map(_.sorted), r.getSeq[Long](2).sorted)).toMap
    assert(out("a")._1 === Some(Seq(1L, 2L, 3L)))
    assert(out("a")._1.get === out("a")._2)
    assert(out("b")._1 === Some(Seq(10L, 11L)))
    assert(out("c")._1 === None) // overflowed: dropped deterministically
  }

  test("bounded_collect_list skips nulls and handles string/struct elements") {
    val strs = Seq(("g", Some("x")), ("g", None), ("g", Some("y")))
      .toDF("k", "v")
      .groupBy($"k").agg(boundedCollectList($"v", 5).as("bs"))
      .head().getSeq[String](1).sorted
    assert(strs === Seq("x", "y")) // null skipped, not counted toward cap
    val structs = Seq((1L, 7L), (1L, 8L)).toDF("k", "v")
      .groupBy($"k")
      .agg(boundedCollectList(struct($"v", ($"v" * 2).as("w")), 5).as("bs"))
      .head().getSeq[org.apache.spark.sql.Row](1).map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(structs === Seq((7L, 14L), (8L, 16L)))
  }

  test("bounded_collect_list survives the partial→final shuffle (many partitions)") {
    // 8 partitions force real serialize/merge traffic through the typed
    // aggregate's wire format; one key overflows, one stays exact.
    val df = spark.range(0, 1000).repartition(8)
      .select(when($"id" < 990, lit("hot")).otherwise(lit("cold")).as("k"), $"id")
    val out = df.groupBy($"k").agg(boundedCollectList($"id", 100).as("bs"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out("hot") === None)
    assert(out("cold").get.sorted === (990L until 1000L))
  }

  test("candidatePairs drops a hot band bucket as a stop-bucket, keeps the rest") {
    // bucket A: 3 docs (at cap) → C(3,2)=3 pairs; bucket B: 4 docs over
    // cap=3 → dropped; docs 101/102 also share bucket C → that pair
    // survives via the second band even though B was dropped.
    val bands = (
      (1L to 3L).map(d => (0, "A", d)) ++
      Seq(101L, 102L, 103L, 104L).map(d => (1, "B", d)) ++
      Seq((2, "C", 101L), (2, "C", 102L))
    ).toDF("band_idx", "band_key", "doc_id")
    val capped = Dedup.candidatePairs(bands, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((1L, 2L), (1L, 3L), (2L, 3L), (101L, 102L))
    assert(capped === expected)
    // default cap (far above fixture df): identical to the uncapped join form
    val all = Dedup.candidatePairs(bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all === expected ++
      (for { a <- Seq(101L, 102L, 103L, 104L); b <- Seq(101L, 102L, 103L, 104L) if a < b } yield (a, b)))
  }

  test("coOccurrenceEdges drops a stop-container, unchanged under the default cap") {
    val rel = (
      Seq((1L, 10L), (1L, 11L), (1L, 12L),
          (2L, 10L), (2L, 11L)) ++
      (1L to 6L).map(i => (99L, 100L + i)) // degenerate container: 6 items
    ).toDF("container", "item")
    val capped = GraphAnalytics.coOccurrenceEdges(rel, "container", "item",
        minCount = 1, maxContainerItems = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped === Set((10L, 11L, 2L), (10L, 12L, 1L), (11L, 12L, 1L)))
    val full = GraphAnalytics.coOccurrenceEdges(rel, "container", "item", minCount = 1)
    assert(full.count() === 3 + 15) // default cap keeps the 6-item container
  }

  test("exactJaccardPairs: saturated-measurement corner regroups and stays exact") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words entirely here now"),
      (4L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val expected = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // postingCap=2: shared shingles have df=3 → the bounded measurement
    // saturates, the gate still reads exact counts, and the cheap branch
    // must take the regroup path — output identical to the pure shape
    val viaRegroup = Dedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.5,
        postingCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaRegroup === expected)
    // default cap: nothing saturates, postings consumed directly
    val direct = Dedup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(direct === expected)
  }

  test("appendLshBands delta join drops standing stop-buckets (streaming twin of the cap)") {
    // four identical docs → every band bucket holds all of them; folding a
    // fifth copy makes each bucket df=5. With maxDf=3 the delta join must
    // drop every (saturated) bucket; with the default cap it pairs the new
    // doc against all four standing docs.
    val base = (1L to 4L).map(d => (d, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Dedup.bands(Dedup.minhashSignatures(
        Dedup.shingleRaw(base.limit(0), "doc_id", "text", 3), 16), 16, 4).schema)
    val (state, _) = Dedup.appendLshBands(empty, base, "doc_id", "text", 3, 16, 4)
    val newDoc = Seq((99L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val (_, capped) = Dedup.appendLshBands(state, newDoc, "doc_id", "text", 3, 16, 4, maxDf = 3)
    assert(capped.count() === 0, "saturated standing buckets must drop from the delta")
    val (_, full) = Dedup.appendLshBands(state, newDoc, "doc_id", "text", 3, 16, 4)
    assert(full.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === (1L to 4L).map(d => (d, 99L)).toSet)
  }

  test("simhashPairs banded path is unchanged by the stop-bucket cap at fixture scale") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five six")
    ).toDF("doc_id", "text")
    // force the banded branch (broadcastDocs = 0) and compare to broadcast
    val banded = Dedup.simhashPairs(docs, "doc_id", "text", 16, 6, broadcastDocs = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bcast = Dedup.simhashPairs(docs, "doc_id", "text", 16, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === bcast)
  }
}
