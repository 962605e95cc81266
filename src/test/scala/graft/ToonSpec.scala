package graft

import graft.ops.Toon

class ToonSpec extends SparkSpec {
  import spark.implicits._

  test("toon format: hoisted header, csv-escaped cells, null renders empty") {
    val df = Seq(
      ("m1", 0.91, Some("some title")),
      ("m2", 0.88, Some("quoted, because comma")),
      ("m3", 0.71, None: Option[String])
    ).toDF("memory_id", "score", "title")
    val out = Toon.format(df.orderBy("memory_id"), name = "results")
    assert(out ===
      """results[3]{memory_id,score,title}:
        |  m1,0.91,some title
        |  m2,0.88,"quoted, because comma"
        |  m3,0.71,""".stripMargin)
  }

  test("toon format: embedded quotes double, guard rejects unbounded input") {
    val df = Seq(Tuple1("""say "hi"""")).toDF("t")
    assert(Toon.format(df) === "results[1]{t}:\n  \"say \"\"hi\"\"\"")
    val big = spark.range(0, 50).toDF("id")
    val ex = intercept[IllegalArgumentException] { Toon.format(big, maxRows = 10) }
    assert(ex.getMessage.contains("bounded"))
  }
}
