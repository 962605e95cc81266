package graft

/** The SQL surface: vector kernels registered on a live session. */
class ExtensionsSpec extends SparkSpec {

  test("vec_cosine / vec_dot / vec_l2sq callable from SQL after register()") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  vec_cosine(array(cast(1.0 as float), cast(0.0 as float)),
        |             array(cast(1.0 as float), cast(0.0 as float))) AS c,
        |  vec_dot(array(cast(3.0 as float), cast(4.0 as float)),
        |          array(cast(4.0 as float), cast(3.0 as float))) AS d,
        |  vec_l2sq(array(cast(1.0 as float)), array(cast(4.0 as float))) AS l
        |""".stripMargin).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) === 24.0)
    assert(r.getDouble(2) === 9.0)
  }

  test("registered functions appear in the catalog") {
    GraftExtensions.register(spark)
    val fns = spark.sql("SHOW FUNCTIONS LIKE 'vec_*'")
      .collect().map(_.getString(0)).toSet
    assert(fns === Set("vec_cosine", "vec_dot", "vec_l2sq",
      "vec_int8_quantize", "vec_int8_scale", "vec_int8_cosine"))
  }

  test("text kernels callable from SQL; widths must be literals") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  hash60('hello world') AS h,
        |  space_tokens('A  b c') AS t,
        |  shingle_strings(space_tokens('a b c d'), 2) AS sh,
        |  shingle_hash60(space_tokens('a b c d'), 2) AS shh,
        |  simhash(space_tokens('a b c'), 16) AS sig
        |""".stripMargin).collect().head
    assert(r.getLong(0) ===
      graft.functions.TextHash.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
    assert(r.getSeq[String](1) === Seq("a", "", "b", "c"))
    assert(r.getSeq[String](2) === Seq("a b", "b c", "c d"))
    assert(r.getSeq[Long](3).length === 3)
    assert(r.getLong(4) >= 0L && r.getLong(4) < (1L << 16))
    val e = intercept[Exception] {
      spark.sql("SELECT simhash(space_tokens(text), n_chars) " +
        s"FROM parquet.`$sfDir/documents.parquet`").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("bounded_collect_list callable from SQL: within-cap groups collect, over-cap null") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L), ("b", 3L))
      .toDF("k", "v").createOrReplaceTempView("bcl_t")
    val r = spark.sql(
      "SELECT k, bounded_collect_list(v, 2) AS bs FROM bcl_t GROUP BY k")
      .collect().map(row => row.getString(0) ->
        Option(row.getSeq[Long](1)).map(_.sorted)).toMap
    assert(r("a") === Some(Seq(1L, 2L)))
    assert(r("b") === None)
  }

  test("type mismatch is rejected at analysis, not at runtime") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_cosine(array(1.0d), array(1.0d))").collect()
    }
    assert(e.getMessage.contains("array<float>"))
  }
}
