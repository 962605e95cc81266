package graft

import org.apache.spark.sql.functions._
import graft.domain.Fixtures
import graft.engine.{HashEmbedder, Ingest}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val mems = Fixtures.memories(spark, n = 10)

  test("chunker: fixed windows, suffix ids, full coverage") {
    val chunks = Ingest.chunk(spark, mems, windowTokens = 6).collect()
    val byMem = chunks.groupBy(_.memory_id)
    assert(byMem.keySet === mems.collect().map(_.memory_id).toSet)
    chunks.foreach { c =>
      assert(c.chunk_id === s"${c.memory_id}_${c.seq}")
      assert(c.text.split(" ").length <= 6)
      assert(c.embedding.length === 64)
    }
    // concatenating chunks (no overlap) restores the content
    val m0 = mems.collect().head
    val restored = byMem(m0.memory_id).sortBy(_.seq).map(_.text).mkString(" ")
    assert(restored === m0.content)
  }

  test("chunker with overlap repeats boundary tokens") {
    val chunks = Ingest.chunk(spark, mems, windowTokens = 6, overlap = 2).collect()
    val m0 = mems.collect().head
    val c = chunks.filter(_.memory_id == m0.memory_id).sortBy(_.seq)
    if (c.length > 1) {
      val firstTail = c(0).text.split(" ").takeRight(2).toSeq
      val secondHead = c(1).text.split(" ").take(2).toSeq
      assert(firstTail === secondHead)
    }
  }

  test("dictionary extractor emits Memory node + entities + REFERENCES edges") {
    val ex = new Ingest.DictionaryExtractor(Map("person" -> "Person", "project" -> "Project"))
    val (nodes, edges) = Ingest.extractGraph(spark, mems, ex)
    val n = nodes.collect(); val e = edges.collect()
    assert(n.count(_.label == "Memory") === 10)
    assert(e.forall(_.rel_type == "REFERENCES"))
    // every edge src is a memory, dst is an extracted entity
    val entityIds = n.filter(_.label != "Memory").map(_.node_id).toSet
    assert(e.forall(x => entityIds.contains(x.dst)))
  }

  test("entity resolution cascade: exact > semantic > fuzzy > create") {
    val embedder = new HashEmbedder(64)
    val existing = Seq(
      ("person_alice", "Person", "alice"),
      ("person_robert", "Person", "robert jr"),
      ("company_acme", "Company", "acme")
    ).toDF("node_id", "label", "name")
    val existingProps = existing.collect().map { r =>
      (s"np_${r.getString(0)}", r.getString(0), r.getString(1), "name",
        r.getString(2), embedder.embed(r.getString(2)), "u0")
    }.toSeq.toDF("point_id", "node_id", "node_label", "property_name",
      "property_value", "embedding", "user_id")

    val candidates = Seq(
      ("c1", "Person", "alice"),     // exact
      ("c2", "Person", "robert"),    // fuzzy (contained in "robert jr")
      ("c3", "Person", "zelda"),     // create
      ("c4", "Company", "acme")      // exact
    ).toDF("node_id", "label", "name")

    val out = Ingest.resolveEntities(candidates, existing, existingProps, embedder)
      .collect().map(r => r.getAs[String]("cand_id") ->
        ((r.getAs[String]("resolution"), r.getAs[String]("resolved_id")))).toMap

    assert(out("c1") === (("exact", "person_alice")))
    assert(out("c4") === (("exact", "company_acme")))
    assert(out("c2")._1 === "fuzzy")
    assert(out("c2")._2 === "person_robert")
    assert(out("c3") === (("create", null)))
  }

  test("semantic resolution matches near-identical names above 0.85") {
    val embedder = new HashEmbedder(64)
    val existing = Seq(("n1", "Person", "john maynard keynes smith"))
      .toDF("node_id", "label", "name")
    val existingProps = Seq(
      ("np1", "n1", "Person", "name", "john maynard keynes smith",
        embedder.embed("john maynard keynes smith"), "u0"))
      .toDF("point_id", "node_id", "node_label", "property_name",
        "property_value", "embedding", "user_id")
    // same tokens, different order → cosine 1.0 but not exact/fuzzy-equal
    val candidates = Seq(("c1", "Person", "maynard john smith keynes"))
      .toDF("node_id", "label", "name")
    val out = Ingest.resolveEntities(candidates, existing, existingProps, embedder)
      .collect().head
    assert(out.getAs[String]("resolution") === "semantic")
    assert(out.getAs[String]("resolved_id") === "n1")
  }

  test("semantic scale path: IVF probe over all clusters equals the broadcast " +
    "path, and the property corpus is never the broadcast side") {
    val embedder = new HashEmbedder(64)
    // 40 token-disjoint names + one candidate that permutes n3's tokens
    // (bag-of-tokens embedding ⇒ cosine 1.0, but neither exact nor fuzzy)
    val names = (0 until 40).map(i => s"alpha$i beta$i gamma$i delta$i")
    val existing = names.zipWithIndex.map { case (nm, i) => (s"n$i", "Person", nm) }
      .toDF("node_id", "label", "name")
    val existingProps = names.zipWithIndex.map { case (nm, i) =>
      (s"np$i", s"n$i", "Person", "name", nm, embedder.embed(nm), "u0")
    }.toDF("point_id", "node_id", "node_label", "property_name",
      "property_value", "embedding", "user_id")
    val candidates = Seq(
      ("c1", "Person", "gamma3 alpha3 delta3 beta3"),  // semantic → n3
      ("c2", "Person", "zzz completely unrelated")     // create
    ).toDF("node_id", "label", "name")

    def run(threshold: Long) = Ingest.resolveEntities(
      candidates, existing, existingProps, embedder,
      semanticFullScanThreshold = threshold,
      semanticNCentroids = 8, semanticNProbe = 8)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("cand_id"), r.getAs[String]("resolution"),
        r.getAs[String]("resolved_id"))).toSet

    val viaBroadcast = rows(run(threshold = 1000000L))
    val viaIvf = rows(run(threshold = 0L))   // force the IVF path
    // nProbe = nCentroids probes EVERY cluster: the ANN path at its exact
    // end must equal the broadcast path bit-for-bit (same tie-break)
    assert(viaIvf === viaBroadcast)
    assert(viaIvf.contains(("c1", "semantic", "n3")))
    assert(viaIvf.contains(("c2", "create", null)))

    // Broadcast-side pin: in the IVF regime the corpus (carrying ex_vec)
    // must NEVER sit under a BroadcastExchange — only centroids, probes
    // and the ≤1-row-per-candidate pair results may broadcast. AQE off so
    // the plan tree is inspectable without query-stage wrappers.
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def broadcastCols(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
        df.queryExecution.executedPlan.collect {
          case b: BroadcastExchangeExec => b.output.map(_.name).toSeq
        }
      val ivfB = broadcastCols(run(threshold = 0L))
      assert(ivfB.nonEmpty)
      assert(ivfB.forall(cols => !cols.contains("ex_vec")),
        s"property corpus broadcast in the IVF regime: $ivfB")
      // exact/fuzzy stages hold the same discipline in EVERY regime: the
      // existing graph (carrying ex_name_lower / exact_id pre-reduction)
      // streams; only candidate-derived relations broadcast
      assert(ivfB.forall(cols => !cols.contains("ex_name_lower")),
        s"existing-name table broadcast in the fuzzy stage: $ivfB")
      // sanity that the pin bites: the small regime DOES broadcast the corpus
      val smallB = broadcastCols(run(threshold = 1000000L))
      assert(smallB.exists(_.contains("ex_vec")))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("dedupeMemories splits survivors and deletions per (user, content)") {
    val df = Seq(
      ("m1", "u0", "same text"), ("m2", "u0", "same text"),
      ("m3", "u1", "same text"), ("m4", "u0", "other")
    ).toDF("memory_id", "user_id", "content")
    val (keep, drop) = Ingest.dedupeMemories(df)
    assert(keep.count() === 3)
    assert(drop.collect().map(_.getString(0)).toSeq === Seq("m2"))
  }

  test("upsert: incoming wins on key, others preserved") {
    val existing = Seq(("a", 1), ("b", 2)).toDF("id", "v")
    val incoming = Seq(("b", 20), ("c", 30)).toDF("id", "v")
    val merged = Ingest.upsert(existing, incoming, "id")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(merged === Map("a" -> 1, "b" -> 20, "c" -> 30))
  }
}
