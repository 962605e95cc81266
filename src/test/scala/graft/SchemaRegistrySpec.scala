package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.{HashEmbedder, Ingest, SchemaRegistry}
import graft.engine.SchemaRegistry._

/** Dynamic schema registry (SURVEY §2.11; user_schemas.py:299-427,
  * cipher_ast.py:66-135): registration limits, lifecycle, generated
  * StructType validation, indexability classification, and the
  * unique-identifier wiring into the entity-resolution cascade — the shapes
  * `tests/test_code_schema_end_to_end.py` exercises over the HTTP API,
  * driven here directly against the engine. */
class SchemaRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def nt(props: (String, PropertyDef)*) = NodeTypeDef(props.toMap)

  test("register enforces the pydantic limits") {
    intercept[IllegalArgumentException] {   // no node types
      register(UserSchema("s", "empty", nodeTypes = Map.empty))
    }
    intercept[IllegalArgumentException] {   // >10 node types
      register(UserSchema("s", "wide", nodeTypes =
        (1 to 11).map(i => s"T$i" -> nt("a" -> PropertyDef())).toMap))
    }
    intercept[IllegalArgumentException] {   // required prop not declared
      register(UserSchema("s", "bad", nodeTypes = Map("T" ->
        NodeTypeDef(Map("a" -> PropertyDef()), requiredProperties = Seq("ghost")))))
    }
    intercept[IllegalArgumentException] {   // unique id not declared
      register(UserSchema("s", "bad", nodeTypes = Map("T" ->
        NodeTypeDef(Map("a" -> PropertyDef()), uniqueIdentifiers = Seq("ghost")))))
    }
    intercept[IllegalArgumentException] {   // rel type naming convention
      register(UserSchema("s", "rel", nodeTypes = Map("T" -> nt("a" -> PropertyDef())),
        relTypes = Map("lowerCase" -> RelTypeDef(Seq("T"), Seq("T")))))
    }
    intercept[IllegalArgumentException] {   // bad semver
      register(UserSchema("s", "v", version = "1.0",
        nodeTypes = Map("T" -> nt("a" -> PropertyDef()))))
    }
  }

  test("lifecycle: draft -> active -> deprecated -> archived, no shortcuts back") {
    val s0 = register(UserSchema("s", "life", nodeTypes = Map("T" -> nt("a" -> PropertyDef()))))
    assert(s0.status === Status.Draft)
    val s1 = transition(s0, Status.Active)
    val s2 = transition(s1, Status.Deprecated)
    val s3 = transition(s2, Status.Archived)
    assert(s3.status === Status.Archived)
    intercept[IllegalArgumentException](transition(s0, Status.Deprecated))
    intercept[IllegalArgumentException](transition(s3, Status.Active))
    intercept[IllegalArgumentException](transition(s2, Status.Active))
  }

  test("catalog table flattens to one row per (schema, type, property)") {
    val s = transition(register(UserSchema("s1", "cat", nodeTypes = Map("T" ->
      NodeTypeDef(
        Map("a" -> PropertyDef("integer", required = true), "b" -> PropertyDef()),
        requiredProperties = Seq("a"), uniqueIdentifiers = Seq("a"))))), Status.Active)
    val cat = catalog(spark, Seq(s)).collect()
    assert(cat.length === 3)   // node_type marker + 2 property rows
    val a = cat.find(_.getAs[String]("property") == "a").get
    assert(a.getAs[String]("ptype") === "integer")
    assert(a.getAs[Boolean]("required"))
    assert(a.getAs[Boolean]("unique_id"))
    assert(a.getAs[String]("status") === "active")
  }

  test("generated StructType mirrors create_dynamic_property_class") {
    val t = structTypeFor(NodeTypeDef(
      Map("age" -> PropertyDef("integer", required = true),
        "score" -> PropertyDef("float"),
        "done" -> PropertyDef("boolean"),
        "when" -> PropertyDef("datetime"),
        "tags" -> PropertyDef("array")),
      requiredProperties = Seq("age")))
    assert(t.fieldNames.head === "id")
    assert(t("age").dataType === LongType && !t("age").nullable)
    assert(t("score").dataType === DoubleType && t("score").nullable)
    assert(t("done").dataType === BooleanType)
    assert(t("when").dataType === TimestampType)
    assert(t("tags").dataType === ArrayType(StringType))
  }

  test("typedNodes: try_cast projection — malformed values become NULL, never throw") {
    val nodes = Seq(
      ("n1", "T", Map("age" -> "41", "done" -> "TRUE")),
      ("n2", "T", Map("age" -> "forty-one", "done" -> "yes")),
      ("n3", "Other", Map("age" -> "1", "done" -> "false"))
    ).toDF("node_id", "label", "properties")
    val typed = typedNodes(nodes, "T",
      NodeTypeDef(Map("age" -> PropertyDef("integer"), "done" -> PropertyDef("boolean"))))
      .orderBy("id").collect()
    assert(typed.length === 2)
    assert(typed(0).getAs[Long]("age") === 41L && typed(0).getAs[Boolean]("done"))
    assert(typed(1).isNullAt(typed(1).fieldIndex("age")))
    assert(typed(1).isNullAt(typed(1).fieldIndex("done")))   // 'yes' is not a boolean word
  }

  test("validate flags each violation class once and ignores non-active schemas") {
    val schema = transition(register(UserSchema("s1", "v", nodeTypes = Map("T" ->
      NodeTypeDef(
        Map("name" -> PropertyDef("string", required = true),
          "size" -> PropertyDef("integer", required = true),
          "state" -> PropertyDef("string", enumValues = Seq("on", "off"))),
        requiredProperties = Seq("name", "size"),
        uniqueIdentifiers = Seq("name"))))), Status.Active)
    val draft = register(UserSchema("s2", "strict", nodeTypes = Map("T" ->
      NodeTypeDef(Map("nope" -> PropertyDef("string", required = true)),
        requiredProperties = Seq("nope")))))
    val nodes = Seq(
      ("n1", "T", Map("name" -> "a", "size" -> "1", "state" -> "on")),   // clean
      ("n2", "T", Map("size" -> "2")),                                   // missing name
      ("n3", "T", Map("name" -> "c", "size" -> "large")),                // bad int
      ("n4", "T", Map("name" -> "d", "size" -> "4", "state" -> "maybe")),// enum
      ("n5", "T", Map("name" -> "e", "size" -> "5", "ghost" -> "x")),    // extra
      ("n6", "T", Map("name" -> "dup", "size" -> "6")),                  // dup pair
      ("n7", "T", Map("name" -> "dup", "size" -> "7")),
      ("n8", "Other", Map[String, String]()),                            // undeclared label: ignored
      ("n9", "T", null.asInstanceOf[Map[String, String]])                // NULL map: all required missing
    ).toDF("node_id", "label", "properties")
    val v = validate(nodes, Seq(schema, draft))
      .collect().map(r => (r.getAs[String]("node_id"), r.getAs[String]("violation"),
        r.getAs[String]("property"))).toSet
    assert(v === Set(
      ("n2", "missing_required", "name"),
      ("n3", "type_mismatch", "size"),
      ("n4", "enum_violation", "state"),
      ("n5", "extra_property", "ghost"),
      ("n6", "duplicate_unique", "name"),
      ("n7", "duplicate_unique", "name"),
      ("n9", "missing_required", "name"),   // NULL map must not swallow checks
      ("n9", "missing_required", "size")))
  }

  test("indexable properties: active + required + string + enum-free only") {
    val active = transition(register(UserSchema("s1", "ix", nodeTypes = Map("T" ->
      NodeTypeDef(
        Map("title" -> PropertyDef("string", required = true),
          "body" -> PropertyDef("string", required = true),            // second survivor: catches Map-collapse bugs
          "opt" -> PropertyDef("string"),                              // not required
          "n" -> PropertyDef("integer", required = true),              // not string
          "kind" -> PropertyDef("string", required = true, enumValues = Seq("a"))),
        requiredProperties = Seq("title", "body", "n", "kind"))))), Status.Active)
    val draft = register(UserSchema("s2", "ghost", nodeTypes = Map("U" ->
      NodeTypeDef(Map("x" -> PropertyDef("string", required = true)),
        requiredProperties = Seq("x")))))
    assert(indexableProperties(Seq(active, draft)) === Set("T" -> "title", "T" -> "body"))
  }

  test("value classifier skips deterministic strings (UUID, number, date, bool)") {
    val vals = Seq("9b2f0c1e-3a44-4b55-8c66-7d8899aabbcc", "12345",
      "2024-03-01T10:00:00", "TRUE", "false", "", "   ",
      "Acme Rockets Ltd", "widget line 7").toDF("v")
      .withColumn("idx", shouldIndexValue(col("v")))
    val byVal = vals.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!byVal("9b2f0c1e-3a44-4b55-8c66-7d8899aabbcc"))
    assert(!byVal("12345"))
    assert(!byVal("2024-03-01T10:00:00"))
    assert(!byVal("TRUE") && !byVal("false"))
    assert(!byVal("") && !byVal("   "))
    assert(byVal("Acme Rockets Ltd"))
    assert(byVal("widget line 7"))   // contains digits but not purely numeric
  }

  test("catalog round-trips: fromCatalog(catalog(s)) == s, including rel types") {
    val s = transition(register(UserSchema("s1", "rt", nodeTypes = Map(
      "Person" -> NodeTypeDef(
        Map("name" -> PropertyDef("string", required = true),
          "age" -> PropertyDef("integer", enumValues = Seq("1", "2"))),
        requiredProperties = Seq("name"), uniqueIdentifiers = Seq("name")),
      "Org" -> NodeTypeDef(Map("title" -> PropertyDef()))),
      relTypes = Map("WORKS_AT" -> RelTypeDef(Seq("Person"), Seq("Org"), "one-to-many")))),
      Status.Active)
    val back = fromCatalog(catalog(spark, Seq(s)))
    assert(back === Seq(s))
    // a property-less node type must survive the round-trip too
    val bare = transition(register(UserSchema("s2", "bare",
      nodeTypes = Map("Tag" -> NodeTypeDef(Map.empty)))), Status.Active)
    assert(fromCatalog(catalog(spark, Seq(bare))) === Seq(bare))
  }

  test("validateEdges: endpoint labels and existence per relationship type") {
    val nodes = Seq(("p1", "Person"), ("p2", "Person"), ("o1", "Org"))
      .toDF("node_id", "label")
    val edges = Seq(
      ("p1", "o1", "WORKS_AT"),     // valid
      ("o1", "p1", "WORKS_AT"),     // both endpoints wrong label
      ("p2", "ghost", "WORKS_AT"),  // dangling target
      ("o1", "p1", "UNDECLARED")    // undeclared rel type: ignored
    ).toDF("src", "dst", "rel_type")
    val s = transition(register(UserSchema("s1", "rt", nodeTypes = Map(
      "Person" -> NodeTypeDef(Map("name" -> PropertyDef())),
      "Org" -> NodeTypeDef(Map("name" -> PropertyDef()))),
      relTypes = Map("WORKS_AT" -> RelTypeDef(Seq("Person"), Seq("Org"))))),
      Status.Active)
    val v = validateEdges(nodes, edges, Seq(s))
      .collect().map(r => (r.getAs[String]("src"), r.getAs[String]("dst"),
        r.getAs[String]("violation"))).toSet
    assert(v === Set(
      ("o1", "p1", "bad_source_type"),
      ("o1", "p1", "bad_target_type"),
      ("p2", "ghost", "dangling_target")))
  }

  test("register rejects non-identifier node-type/property names and bad cardinality") {
    intercept[IllegalArgumentException] {   // space in node type name
      register(UserSchema("s", "id1", nodeTypes = Map("Bad Type" -> nt("a" -> PropertyDef()))))
    }
    intercept[IllegalArgumentException] {   // leading digit in property name
      register(UserSchema("s", "id2", nodeTypes = Map("T" -> nt("1bad" -> PropertyDef()))))
    }
    intercept[IllegalArgumentException] {   // unknown cardinality literal
      register(UserSchema("s", "id3", nodeTypes = Map("T" -> nt("a" -> PropertyDef())),
        relTypes = Map("R" -> RelTypeDef(Seq("T"), Seq("T"), cardinality = "one-2-many"))))
    }
    // underscores and digits after the first char are fine
    register(UserSchema("s", "id4",
      nodeTypes = Map("Node_2" -> nt("prop_9" -> PropertyDef()))))
  }

  test("validateEdges enforces declared cardinality (one-to-one / one-to-many)") {
    val nodes = Seq(("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B"), ("b3", "B"))
      .toDF("node_id", "label")
    // a1 → {b1, b2} is a source fan-out (one-to-one only);
    // {a1, a2} → b1 is a target fan-in (one-to-one AND one-to-many)
    val edges = Seq(
      ("a1", "b1", "ONE"), ("a1", "b2", "ONE"), ("a2", "b1", "ONE"),
      ("a1", "b1", "MANY"), ("a1", "b2", "MANY"), ("a2", "b1", "MANY"),
      ("a1", "b1", "ANY"), ("a2", "b1", "ANY")
    ).toDF("src", "dst", "rel_type")
    val s = transition(register(UserSchema("s1", "card", nodeTypes = Map(
      "A" -> NodeTypeDef(Map("name" -> PropertyDef())),
      "B" -> NodeTypeDef(Map("name" -> PropertyDef()))),
      relTypes = Map(
        "ONE" -> RelTypeDef(Seq("A"), Seq("B"), cardinality = "one-to-one"),
        "MANY" -> RelTypeDef(Seq("A"), Seq("B"), cardinality = "one-to-many"),
        "ANY" -> RelTypeDef(Seq("A"), Seq("B"), cardinality = "many-to-many")))),
      Status.Active)
    val v = validateEdges(nodes, edges, Seq(s))
      .collect().map(r => (r.getAs[String]("src"), r.getAs[String]("dst"),
        r.getAs[String]("rel_type"), r.getAs[String]("violation"))).toSet
    assert(v === Set(
      // one-to-one: a1 fans out to b1/b2; b1 fans in from a1/a2
      ("a1", "b1", "ONE", "cardinality_source"),
      ("a1", "b2", "ONE", "cardinality_source"),
      ("a1", "b1", "ONE", "cardinality_target"),
      ("a2", "b1", "ONE", "cardinality_target"),
      // one-to-many: only the target fan-in is a violation
      ("a1", "b1", "MANY", "cardinality_target"),
      ("a2", "b1", "MANY", "cardinality_target")))
    // many-to-many edges contribute nothing (asserted by the exact set above)
  }

  test("unique identifiers drive the exact stage of entity resolution") {
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    // two-part identifier (name, sku): exact only when BOTH match;
    // a null sku skips the exact stage and falls through the cascade
    val candidates = Seq(
      ("c1", "Part", "widget", "SKU-1"),
      ("c2", "Part", "widget", "SKU-2"),     // same name, other sku → no exact hit
      ("c3", "Part", "widget", null)         // null id → cascade fallthrough (fuzzy)
    ).toDF("node_id", "label", "name", "sku")
    val existing = Seq(("e1", "Part", "widget", "SKU-1"))
      .toDF("node_id", "label", "name", "sku")
    val props = Seq.empty[(String, String, String, String, String, Array[Float], String)]
      .toDF("point_id", "node_id", "node_label", "property_name", "property_value",
        "embedding", "user_id")
    val out = Ingest.resolveEntities(candidates, existing, props,
        new HashEmbedder(16), exactKeyCols = Seq("name", "sku"))
      .collect().map(r => r.getAs[String]("cand_id") -> r.getAs[String]("resolution")).toMap
    assert(out("c1") === "exact")
    assert(out("c2") === "fuzzy")    // name containment still finds e1
    assert(out("c3") === "fuzzy")
  }
}
