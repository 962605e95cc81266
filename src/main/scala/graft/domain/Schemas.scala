package graft.domain

import java.sql.Timestamp

/** Case-class row models for the engine's domain tables (SURVEY §1,
  * FIXTURES.md §B). One Dataset[T] per store the reference spreads across
  * Mongo/Qdrant/Neo4j — here they are columnar tables partitionable by
  * tenant and Z-orderable by id at scale.
  */
object Schemas {

  /** `memories` — row of record (models/memory_models.py:39-77,
    * shared_types.py:282-440). */
  case class Memory(
      memory_id: String,
      `type`: String,                      // text | code_snippet | document
      content: String,
      title: String,
      user_id: String,
      workspace_id: String,
      organization_id: String,
      namespace_id: String,
      topics: Seq[String],
      emotion_tags: Seq[String],
      conversation_id: String,
      role: String,                        // user | assistant
      category: String,
      consent: String,                     // explicit|implicit|terms|none
      risk: String,                        // none|sensitive|flagged
      user_read_access: Seq[String],
      workspace_read_access: Seq[String],
      role_read_access: Seq[String],
      organization_read_access: Seq[String],
      namespace_read_access: Seq[String],
      custom_metadata: Map[String, String],
      created_at: Timestamp,
      updated_at: Timestamp)

  /** `chunks` — memory split into embedded pieces; chunk_id =
    * `{memory_id}_{i}` (memory_graph.py:10131-10192). The chunk carries a
    * denormalized copy of the ACL/tenant payload exactly as the reference
    * copies it into the Qdrant point payload — filters push to the scan
    * without a join. */
  case class Chunk(
      chunk_id: String,
      memory_id: String,
      seq: Int,
      text: String,
      embedding: Array[Float],
      user_id: String,
      user_read_access: Seq[String],
      workspace_read_access: Seq[String],
      role_read_access: Seq[String],
      organization_read_access: Seq[String],
      namespace_read_access: Seq[String],
      custom_metadata: Map[String, String],
      is_grouped: Boolean,
      related_memory_ids: Seq[String],
      created_at: Timestamp)

  /** `nodes` — typed property-graph node (shared_types.py:53-81,
    * NeoBaseProperties memory_models.py:155-190). */
  case class Node(
      node_id: String,
      label: String,
      name: String,
      properties: Map[String, String],
      user_id: String,
      user_read_access: Seq[String],
      workspace_read_access: Seq[String],
      created_at: Timestamp)

  /** `edges` — typed relationship (shared_types.py:135-149). */
  case class Edge(
      src: String,
      dst: String,
      rel_type: String,
      properties: Map[String, String],
      created_at: Timestamp)

  /** `node_properties` — the secondary property-vector space for semantic
    * entity lookup (services/property_indexing_service.py:447-623). */
  case class NodeProperty(
      point_id: String,
      node_id: String,
      node_label: String,
      property_name: String,
      property_value: String,
      embedding: Array[Float],
      user_id: String)

  /** `access_events` — retrieval/citation log feeding the decayed counters
    * (memory_management.py:3192-3404). */
  case class AccessEvent(
      event_id: String,
      memory_id: String,
      user_id: String,
      kind: String,                        // retrieval | citation
      similarity: Double,
      confidence: Double,
      ts: Timestamp)

  /** `messages` — session stream rows (message_batch_analysis.py:523-575). */
  case class Message(
      message_id: String,
      session_id: String,
      user_id: String,
      role: String,
      content: String,
      ts: Timestamp)
}
