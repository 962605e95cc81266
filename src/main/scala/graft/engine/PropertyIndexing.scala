package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The property-indexing pipeline (`PropertyIndexingService
  * .index_node_properties`, property_indexing_service.py:66-252): extract
  * the schema-indexable properties from a node table, drop deterministic
  * values (the classifier halves both live in [[SchemaRegistry]]), embed
  * the survivors, and emit `node_properties` rows — the secondary vector
  * space that [[Ingest.resolveEntities]]'s semantic stage and V4 property
  * search consume.
  *
  * Scale shape: one explode over the declared-indexable keys only (the
  * (type, property) whitelist is driver-side metadata compiled into the
  * plan, not a join), classifier predicates are codegen'd column
  * expressions, and embedding runs as a mapPartitions batch stage — one
  * embedder instantiation per partition, the production batch shape for a
  * model-backed embedder.
  */
object PropertyIndexing {

  /** nodes(node_id, label, name, properties, user_id?) → NodeProperty rows.
    * Only ACTIVE schemas' required/string/enum-free properties are
    * considered; values failing [[SchemaRegistry.shouldIndexValue]] are
    * dropped (UUIDs, numbers, dates, booleans). `point_id` =
    * `np_{node_id}_{property}`. */
  def buildPropertyCorpus(spark: SparkSession, nodes: DataFrame,
                          schemas: Seq[SchemaRegistry.UserSchema],
                          embedder: Embedder): DataFrame = {
    import spark.implicits._
    val ix = SchemaRegistry.indexableProperties(schemas)
    val byLabel = ix.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val hasUser = nodes.columns.contains("user_id")
    val userCol = if (hasUser) col("user_id") else lit("")

    val perLabel = byLabel.toSeq.sortBy(_._1).map { case (label, props) =>
      nodes.filter(col("label") === label)
        .select(col("node_id"), col("label").as("node_label"), userCol.as("user_id"),
          explode(map_from_arrays(
            array(props.map(lit): _*),
            array(props.map(p => element_at(col("properties"), p)): _*)))
            .as(Seq("property_name", "property_value")))
        .filter(SchemaRegistry.shouldIndexValue(col("property_value")))
    }
    val flat = perLabel.reduceOption(_ unionByName _).getOrElse {
      return spark.emptyDataFrame
        .select(lit("").as("point_id"), lit("").as("node_id"),
          lit("").as("node_label"), lit("").as("property_name"),
          lit("").as("property_value"),
          lit(null).cast("array<float>").as("embedding"), lit("").as("user_id"))
        .limit(0)
    }

    flat.select(col("node_id"), col("node_label"), col("property_name"),
        col("property_value"), col("user_id"))
      .as[(String, String, String, String, String)]
      .mapPartitions { it =>
        val e = embedder                      // one instance per partition
        it.map { case (id, lbl, pn, pv, u) =>
          (s"np_${id}_$pn", id, lbl, pn, pv, e.embed(pv), u)
        }
      }
      .toDF("point_id", "node_id", "node_label", "property_name",
        "property_value", "embedding", "user_id")
  }
}
