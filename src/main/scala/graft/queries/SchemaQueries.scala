package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.engine.SchemaRegistry
import graft.engine.SchemaRegistry.{NodeTypeDef, PropertyDef, UserSchema}

/** §2.11 dynamic schema registry enforcement, end to end: a user ontology
  * (typed properties, required list, enum, unique identifiers) validated
  * against a node table derived deterministically from `part`, with an
  * inert DRAFT schema alongside to pin the lifecycle filter — if draft
  * schemas ever leaked into enforcement, its absurd rules would flood the
  * violations list and the oracle would catch it.
  */
object SchemaQueries {

  /** The active ontology under test. */
  private val partNodeType = NodeTypeDef(
    properties = Map(
      "name"   -> PropertyDef("string", required = true),
      "size"   -> PropertyDef("integer", required = true),
      "brand"  -> PropertyDef("string", required = true),
      "status" -> PropertyDef("string",
        enumValues = Seq("active", "inactive", "retired"))),
    requiredProperties = Seq("name", "size", "brand"),
    uniqueIdentifiers = Seq("name"))

  def entries: Seq[Entry] = Seq(

    Entry("q114_schema_validation",
      (s, d) => {
        val emptyMap = map().cast("map<string,string>")
        // deterministic violation seeding: %7 drops required brand, %11
        // poisons the integer size, %4==3 leaves the enum, %13 adds an
        // undeclared property; duplicate part names trip duplicate_unique
        val nodes = Tables.part(s, d).select(
          concat(lit("pn"), col("p_partkey")).as("node_id"),
          lit("Part").as("label"),
          col("p_name").as("name"),
          map_concat(
            map(
              lit("name"), col("p_name"),
              lit("size"), when(col("p_partkey") % 11 === 0, lit("not-a-number"))
                .otherwise(col("p_size").cast("string")),
              lit("status"), element_at(
                array(lit("active"), lit("inactive"), lit("retired"), lit("bogus")),
                (col("p_partkey") % 4 + 1).cast("int"))),
            when(col("p_partkey") % 7 =!= 0, map(lit("brand"), col("p_brand")))
              .otherwise(emptyMap),
            when(col("p_partkey") % 13 === 0, map(lit("color"), lit("red")))
              .otherwise(emptyMap)).as("properties"))

        val activeSchema = SchemaRegistry.transition(
          SchemaRegistry.register(UserSchema("s1", "parts-ontology",
            nodeTypes = Map("Part" -> partNodeType))),
          SchemaRegistry.Status.Active)
        // never enforced: requires a property no node has and forbids all
        // the real ones — any leak through the lifecycle filter explodes
        // the violation count
        val draftSchema = SchemaRegistry.register(UserSchema("s2", "draft-strict",
          nodeTypes = Map("Part" -> NodeTypeDef(
            properties = Map("nope" -> PropertyDef("string", required = true)),
            requiredProperties = Seq("nope")))))

        SchemaRegistry.validate(nodes, Seq(activeSchema, draftSchema))
          .orderBy(col("node_id"), col("violation"), col("property"))
      },
      Some("""WITH nodes AS (
             |  SELECT 'pn' || CAST(p_partkey AS VARCHAR) AS node_id,
             |    p_partkey, p_name FROM part)
             |SELECT node_id, 'Part' AS label,
             |  'missing_required' AS violation, 'brand' AS property
             |FROM nodes WHERE p_partkey % 7 = 0
             |UNION ALL
             |SELECT node_id, 'Part', 'type_mismatch', 'size'
             |FROM nodes WHERE p_partkey % 11 = 0
             |UNION ALL
             |SELECT node_id, 'Part', 'enum_violation', 'status'
             |FROM nodes WHERE p_partkey % 4 = 3
             |UNION ALL
             |SELECT node_id, 'Part', 'extra_property', 'color'
             |FROM nodes WHERE p_partkey % 13 = 0
             |UNION ALL
             |SELECT node_id, 'Part', 'duplicate_unique', 'name'
             |FROM (SELECT node_id, count(*) OVER (PARTITION BY p_name) AS c
             |      FROM nodes) WHERE c > 1
             |ORDER BY node_id, violation, property""".stripMargin)),

    // Relationship-type enforcement: PLACED edges must run Customer→Order.
    // Seeded violations: every 13th order's edge is reversed (wrong label
    // on both ends), every 17th points at a node that doesn't exist
    // (dangling). Edges of undeclared relationship types pass untouched —
    // pinned by the unconstrained SHIPS edges contributing nothing.
    Entry("q119_edge_validation",
      (s, d) => {
        val nodes = Tables.customer(s, d)
          .select(concat(lit("c"), col("c_custkey")).as("node_id"),
            lit("Customer").as("label"))
          .unionByName(Tables.orders(s, d)
            .select(concat(lit("o"), col("o_orderkey")).as("node_id"),
              lit("Order").as("label")))
        val o = Tables.orders(s, d)
        val placed = o.select(
          when(col("o_orderkey") % 17 === 0, concat(lit("ghost"), col("o_orderkey")))
            .when(col("o_orderkey") % 13 === 0, concat(lit("o"), col("o_orderkey")))
            .otherwise(concat(lit("c"), col("o_custkey"))).as("src"),
          when(col("o_orderkey") % 13 === 0 && col("o_orderkey") % 17 =!= 0,
            concat(lit("c"), col("o_custkey")))
            .otherwise(concat(lit("o"), col("o_orderkey"))).as("dst"),
          lit("PLACED").as("rel_type"))
        val ships = o.limit(50).select(
          concat(lit("o"), col("o_orderkey")).as("src"),
          concat(lit("c"), col("o_custkey")).as("dst"),
          lit("SHIPS").as("rel_type"))
        val schema = SchemaRegistry.transition(SchemaRegistry.register(
          UserSchema("s3", "order-graph",
            nodeTypes = Map("Customer" -> NodeTypeDef(Map("name" -> PropertyDef())),
              "Order" -> NodeTypeDef(Map("name" -> PropertyDef()))),
            relTypes = Map("PLACED" -> SchemaRegistry.RelTypeDef(
              Seq("Customer"), Seq("Order"))))),
          SchemaRegistry.Status.Active)
        SchemaRegistry.validateEdges(nodes, placed.unionByName(ships), Seq(schema))
          .orderBy(col("src"), col("dst"), col("violation"))
      },
      Some("""WITH e AS (
             |  SELECT o_orderkey AS k,
             |    CASE WHEN o_orderkey % 17 = 0 THEN 'ghost' || CAST(o_orderkey AS VARCHAR)
             |         WHEN o_orderkey % 13 = 0 THEN 'o' || CAST(o_orderkey AS VARCHAR)
             |         ELSE 'c' || CAST(o_custkey AS VARCHAR) END AS src,
             |    CASE WHEN o_orderkey % 13 = 0 AND o_orderkey % 17 <> 0
             |         THEN 'c' || CAST(o_custkey AS VARCHAR)
             |         ELSE 'o' || CAST(o_orderkey AS VARCHAR) END AS dst
             |  FROM orders)
             |SELECT src, dst, 'PLACED' AS rel_type, 'dangling_source' AS violation
             |FROM e WHERE k % 17 = 0
             |UNION ALL
             |SELECT src, dst, 'PLACED', 'bad_source_type'
             |FROM e WHERE k % 13 = 0 AND k % 17 <> 0
             |UNION ALL
             |SELECT src, dst, 'PLACED', 'bad_target_type'
             |FROM e WHERE k % 13 = 0 AND k % 17 <> 0
             |ORDER BY src, dst, violation""".stripMargin)),

    // Cardinality enforcement: CONTAINS (Order→Part) declared one-to-one,
    // built from real lineitem pairs — orders holding several parts trip
    // cardinality_source, parts shared across orders trip
    // cardinality_target. All endpoints exist with the right labels, so
    // ONLY the cardinality checks fire (pinning that they are independent
    // of the endpoint checks).
    Entry("q127_cardinality",
      (s, d) => {
        val nodes = Tables.orders(s, d)
          .select(concat(lit("o"), col("o_orderkey")).as("node_id"),
            lit("Order").as("label"))
          .unionByName(Tables.part(s, d)
            .select(concat(lit("p"), col("p_partkey")).as("node_id"),
              lit("Part").as("label")))
        val contains = Tables.lineitem(s, d)
          .filter(col("l_orderkey") % 20 === 0)
          .select(concat(lit("o"), col("l_orderkey")).as("src"),
            concat(lit("p"), col("l_partkey")).as("dst"),
            lit("CONTAINS").as("rel_type"))
          .distinct()
        val schema = SchemaRegistry.transition(SchemaRegistry.register(
          UserSchema("s4", "order-parts",
            nodeTypes = Map("Order" -> NodeTypeDef(Map("name" -> PropertyDef())),
              "Part" -> NodeTypeDef(Map("name" -> PropertyDef()))),
            relTypes = Map("CONTAINS" -> SchemaRegistry.RelTypeDef(
              Seq("Order"), Seq("Part"), cardinality = "one-to-one")))),
          SchemaRegistry.Status.Active)
        SchemaRegistry.validateEdges(nodes, contains, Seq(schema))
          .orderBy(col("src"), col("dst"), col("violation"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS src,
             |    'p' || CAST(l_partkey AS VARCHAR) AS dst
             |  FROM lineitem WHERE l_orderkey % 20 = 0)
             |SELECT src, dst, 'CONTAINS' AS rel_type,
             |  'cardinality_source' AS violation
             |FROM e WHERE src IN (SELECT src FROM e GROUP BY src HAVING count(*) > 1)
             |UNION ALL
             |SELECT src, dst, 'CONTAINS', 'cardinality_target'
             |FROM e WHERE dst IN (SELECT dst FROM e GROUP BY dst HAVING count(*) > 1)
             |ORDER BY src, dst, violation""".stripMargin)))
}
