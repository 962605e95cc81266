package graft

import org.apache.spark.sql.functions._
import graft.engine.{HashEmbedder, Ingest, PropertyIndexing, SchemaRegistry}
import graft.engine.SchemaRegistry._

/** The schema → classifier → property-corpus → entity-resolution loop
  * (property_indexing_service.py:66-252 feeding
  * memory_graph.py:10816's semantic lookup), closed end to end. */
class PropertyIndexingSpec extends SparkSpec {
  import spark.implicits._

  private val schema = transition(register(UserSchema("s1", "people",
    nodeTypes = Map(
      "Person" -> NodeTypeDef(
        Map("name" -> PropertyDef("string", required = true),
          "badge" -> PropertyDef("string", required = true),   // values numeric → dropped
          "note" -> PropertyDef("string")),                    // not required → not indexable
        requiredProperties = Seq("name", "badge")),
      "Org" -> NodeTypeDef(
        Map("name" -> PropertyDef("string", required = true)),
        requiredProperties = Seq("name"))))), Status.Active)

  private def nodes = Seq(
    ("p1", "Person", Map("name" -> "ada lovelace", "badge" -> "1815", "note" -> "x")),
    ("p2", "Person", Map("name" -> "9f8a0c1e-3a44-4b55-8c66-7d8899aabbcc", "badge" -> "2")),
    ("o1", "Org", Map("name" -> "analytical engines ltd")),
    ("z1", "Undeclared", Map("name" -> "ghost label"))
  ).toDF("node_id", "label", "properties")

  test("corpus: schema half picks (type, prop); value half drops deterministic values") {
    val corpus = PropertyIndexing.buildPropertyCorpus(
      spark, nodes, Seq(schema), new HashEmbedder(16))
    val rows = corpus.collect().map(r => (r.getAs[String]("node_id"),
      r.getAs[String]("property_name"), r.getAs[String]("property_value"))).toSet
    // p1.badge (numeric), p2.name (UUID), p1.note (not indexable),
    // z1 (undeclared label) all dropped
    assert(rows === Set(
      ("p1", "name", "ada lovelace"),
      ("o1", "name", "analytical engines ltd")))
    val emb = corpus.filter(col("node_id") === "p1").select("embedding")
      .head().getSeq[Float](0)
    assert(emb.length === 16 && math.abs(emb.map(x => x * x).sum - 1.0) < 1e-5)
    assert(corpus.filter(col("point_id") === "np_p1_name").count() === 1)
  }

  test("the built corpus drives resolveEntities' semantic stage") {
    val embedder = new HashEmbedder(16)
    val corpus = PropertyIndexing.buildPropertyCorpus(spark, nodes, Seq(schema), embedder)
    // candidate with the same token multiset reordered → cosine ≈ 1 → semantic
    val candidates = Seq(("c1", "Person", "lovelace ada")).toDF("node_id", "label", "name")
    val existing = nodes.select(col("node_id"), col("label"),
      element_at(col("properties"), "name").as("name"))
    val out = Ingest.resolveEntities(candidates, existing, corpus, embedder)
      .collect().map(r => (r.getAs[String]("resolution"), r.getAs[String]("resolved_id"))).head
    assert(out === (("semantic", "p1")))
  }
}
