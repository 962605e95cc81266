package graft

import org.apache.spark.sql.functions._
import graft.domain.Fixtures
import graft.engine.{IvfIndex, Search}
import graft.engine.Search.SearchRequest
import graft.ops.Retrieval.Principal

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val memsSeq = Fixtures.memories(spark).collect().toSeq
  private lazy val memories = Fixtures.memories(spark).toDF()
  private lazy val chunks = Fixtures.chunks(spark, memsSeq).toDF()

  test("build: every chunk assigned to exactly one centroid") {
    val idx = IvfIndex.build(chunks, "chunk_id", "embedding", nCentroids = 8)
    assert(idx.centroids.count() === 8)
    assert(idx.assigned.count() === chunks.count())
    assert(idx.assigned.select("chunk_id").distinct().count() === chunks.count())
    // clusters are non-trivial: more than one centroid actually used
    assert(idx.assigned.select("centroid_id").distinct().count() > 1)
  }

  test("probe: nProbe nearest clusters, pruned corpus is a subset") {
    val idx = IvfIndex.build(chunks, "chunk_id", "embedding", nCentroids = 8)
    val q = Seq(Tuple1(memsSeq.head.content)).toDF("t")
      .select(udf((t: String) => new graft.engine.HashEmbedder(64).embed(t)).apply($"t").as("qvec"))
    val pruned = IvfIndex.prunedCorpus(idx, q, nProbe = 2)
    assert(pruned.count() > 0)
    assert(pruned.count() < chunks.count())
  }

  test("searchIndexed finds the query's own memory (self-retrieval recall)") {
    val idx = IvfIndex.build(chunks, "chunk_id", "embedding", nCentroids = 8)
    val target = memsSeq.find(_.user_id == "u0").get
    val out = Search.searchIndexed(spark, idx, memories,
      SearchRequest(target.content, Principal("u0"), topK = 5), nProbe = 3)
      .collect()
    assert(out.nonEmpty)
    // the exact-content memory must surface (its own chunks dominate a probe)
    assert(out.map(_.getAs[String]("memory_id")).contains(target.memory_id))
  }
}
