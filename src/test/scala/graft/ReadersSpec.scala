package graft

import org.apache.spark.sql.types.StructType
import graft.sources.Readers

class ReadersSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("id", "long").add("name", "string").add("score", "double")

  test("jsonl: good rows parse, malformed and type-broken lines quarantine") {
    val lines = Seq(
      """{"id": 1, "name": "alpha", "score": 0.5}""",
      """{"id": 2, "name": "beta"}""",                  // missing field → null col, still good
      """{"id": "not-a-number", "name": "gamma"}""",    // type mismatch → corrupt
      """not json at all""",                            // unparseable → corrupt
      """{"id": 4, "name": "delta", "score": 1.25, "extra": true}""" // extra field ok
    ).toDF("value")
    val (good, bad) = Readers.parseJsonLines(lines, schema)
    val g = good.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(g === Set((1L, "alpha"), (2L, "beta"), (4L, "delta")))
    val b = bad.collect().map(_.getString(0)).toSet
    assert(b === Set("""{"id": "not-a-number", "name": "gamma"}""", "not json at all"))
  }

  test("jsonl: quarantine preserves the raw line byte-for-byte for replay") {
    val raw = """{"id": broken"""
    val (_, bad) = Readers.parseJsonLines(Seq(raw).toDF("value"), schema)
    assert(bad.collect().map(_.getString(0)).toSeq === Seq(raw))
  }

  test("csv: good/bad split with type enforcement") {
    val lines = Seq(
      "1,alpha,0.5",
      "2,beta,oops",     // double column unparseable → corrupt
      "3,gamma,2.5"
    ).toDF("value")
    val (good, bad) = Readers.parseCsvLines(lines, schema)
    assert(good.collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    assert(bad.collect().map(_.getString(0)).toSeq === Seq("2,beta,oops"))
  }

  test("file entry point reads splittable text and parses") {
    val dir = java.nio.file.Files.createTempDirectory("readers").toFile
    val f = new java.io.File(dir, "part-0.jsonl")
    val pw = new java.io.PrintWriter(f)
    pw.println("""{"id": 10, "name": "x", "score": 1.0}""")
    pw.println("""garbage""")
    pw.close()
    try {
      val (good, bad) = Readers.jsonlFiles(spark, f.getPath, schema)
      assert(good.count() === 1 && bad.count() === 1)
    } finally {
      f.delete(); dir.delete()
    }
  }

  test("reserved capture column is rejected") {
    intercept[IllegalArgumentException] {
      Readers.parseJsonLines(Seq("{}").toDF("value"),
        new StructType().add(Readers.CorruptCol, "string"))
    }
  }
}
