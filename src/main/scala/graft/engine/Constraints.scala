package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The declarative merge-rule surface (SURVEY §2.11): node/edge constraints
  * and memory policies (`shared_types.py:1277-2372`, resolvers
  * `services/node_constraint_resolver.py:22-556`,
  * `edge_constraint_resolver.py:22-537`,
  * `memory_policy_resolver.py:23-209`) compiled into column expressions over
  * the entity-resolution output — a rule-driven MERGE planner, not a
  * per-entity driver loop.
  *
  * Semantics preserved from the reference:
  *  - `create: auto | never` — `never` turns an unresolved candidate into a
  *    `skip` (the reference refuses to create such nodes);
  *  - `searchModes` — which cascade stages may produce a merge; a hit from a
  *    disabled stage falls through to the next ENABLED stage, preserving the
  *    exact→semantic→fuzzy priority order;
  *  - `when` clauses with `$gte/$lte/$gt/$lt/$in/$eq/$ne` operators gate the
  *    whole constraint on candidate properties — a non-matching candidate
  *    gets default behavior (all modes, auto-create);
  *  - `set` values applied on create/match;
  *  - edge constraints restrict endpoint labels per relationship type.
  */
object Constraints {

  sealed trait CreateMode
  case object CreateAuto extends CreateMode
  case object CreateNever extends CreateMode

  sealed trait SearchMode
  case object ExactMode extends SearchMode
  case object SemanticMode extends SearchMode
  case object FuzzyMode extends SearchMode

  /** `when` operators (shared_types.py:1468's $-operator validation). */
  sealed trait WhenOp
  object WhenOp {
    case object Gte extends WhenOp; case object Lte extends WhenOp
    case object Gt extends WhenOp;  case object Lt extends WhenOp
    case object Eq extends WhenOp;  case object Ne extends WhenOp
    case object In extends WhenOp
  }
  case class WhenClause(property: String, op: WhenOp, value: Any) {
    def toPredicate(props: Column): Column = {
      val c = element_at(props, property)
      op match {
        case WhenOp.Gte => c.cast("double") >= lit(value)
        case WhenOp.Lte => c.cast("double") <= lit(value)
        case WhenOp.Gt  => c.cast("double") > lit(value)
        case WhenOp.Lt  => c.cast("double") < lit(value)
        case WhenOp.Eq  => c === lit(value.toString)
        case WhenOp.Ne  => c =!= lit(value.toString)
        case WhenOp.In  => c.isin(value.asInstanceOf[Seq[Any]].map(_.toString): _*)
      }
    }
  }

  case class NodeConstraint(
      label: String,
      create: CreateMode = CreateAuto,
      searchModes: Set[SearchMode] = Set(ExactMode, SemanticMode, FuzzyMode),
      setOnCreate: Map[String, String] = Map.empty,
      setOnMatch: Map[String, String] = Map.empty,
      when: Seq[WhenClause] = Nil)

  case class EdgeConstraint(
      relType: String,
      allowedSourceLabels: Set[String] = Set.empty,   // empty = any
      allowedTargetLabels: Set[String] = Set.empty,
      create: CreateMode = CreateAuto)

  /** MemoryPolicy: a default constraint plus per-label overrides
    * (memory_policy_resolver.py merge semantics: override wins). */
  case class MemoryPolicy(
      default: NodeConstraint = NodeConstraint("*"),
      perLabel: Map[String, NodeConstraint] = Map.empty,
      edges: Seq[EdgeConstraint] = Nil) {
    def forLabel(label: String): NodeConstraint =
      perLabel.getOrElse(label, default.copy(label = label))
  }

  /** Apply node constraints to `Ingest.resolveEntities` output (which must
    * carry exact_id/sem_id/fuzzy_id plus a `cand_props` map column; absent
    * props column ⇒ `when` clauses always gate in).
    * Output: action ∈ merge|create|skip, constrained_resolution,
    * constrained_resolved_id. */
  def applyNodeConstraints(resolved: DataFrame, policy: MemoryPolicy): DataFrame = {
    val labels = resolved.select("cand_label").distinct().collect().map(_.getString(0))
    val hasProps = resolved.columns.contains("cand_props")
    def gate(nc: NodeConstraint): Column =
      if (nc.when.isEmpty || !hasProps) lit(true)
      else nc.when.map(_.toPredicate(col("cand_props"))).reduce(_ && _)

    // per-label: the resolved id after masking disabled search modes
    def constrainedId(nc: NodeConstraint): Column = coalesce(
      (if (nc.searchModes(ExactMode)) Some(col("exact_id")) else None).toSeq ++
      (if (nc.searchModes(SemanticMode)) Some(col("sem_id")) else None).toSeq ++
      (if (nc.searchModes(FuzzyMode)) Some(col("fuzzy_id")) else None).toSeq :+
      lit(null).cast("string"): _*)

    val defaultId = coalesce(col("exact_id"), col("sem_id"), col("fuzzy_id"))

    val (idCol, createNeverCol) = labels.foldLeft(
        (defaultId, lit(false))) { case ((idAcc, cnAcc), label) =>
      val nc = policy.forLabel(label)
      val applies = col("cand_label") === label && gate(nc)
      (when(applies, constrainedId(nc)).otherwise(idAcc),
       when(applies, lit(nc.create == CreateNever)).otherwise(cnAcc))
    }

    resolved
      .withColumn("constrained_resolved_id", idCol)
      .withColumn("create_never", createNeverCol)
      .withColumn("action",
        when(col("constrained_resolved_id").isNotNull, "merge")
          .when(col("create_never"), "skip")
          .otherwise("create"))
      .withColumn("constrained_resolution",
        when(col("constrained_resolved_id").isNull, col("action"))
          .when(col("constrained_resolved_id") === col("exact_id"), "exact")
          .when(col("constrained_resolved_id") === col("sem_id"), "semantic")
          .otherwise("fuzzy"))
      .drop("create_never")
  }

  /** Edge constraints: keep only edges whose endpoints' labels are allowed
    * for the relationship type (edge_constraint_resolver.py:262's target
    * check, applied set-wise). Unknown rel types pass through. */
  def applyEdgeConstraints(edges: DataFrame, nodes: DataFrame,
                           constraints: Seq[EdgeConstraint]): DataFrame = {
    // LEFT joins + per-id dedup: an endpoint missing from `nodes` (created
    // elsewhere, or skipped by a create:never node policy) must not delete
    // the edge before any rule is even evaluated — an inner join silently
    // dropped every dangling edge, and duplicate node_ids duplicated edges.
    // deterministic pick for conflicting duplicate node_ids (entity-
    // resolution leftovers): min(label), not an arbitrary shuffle survivor
    val labels = nodes.groupBy(col("node_id")).agg(min(col("label")).as("label"))
    val withLabels = edges
      .join(labels.withColumnRenamed("node_id", "src").withColumnRenamed("label", "src_label"),
        Seq("src"), "left")
      .join(labels.withColumnRenamed("node_id", "dst").withColumnRenamed("label", "dst_label"),
        Seq("dst"), "left")
    val keep = constraints.foldLeft(lit(true)) { case (acc, ec) =>
      // unknown endpoint label ⇒ permissive pass-through (coalesce beats the
      // 3VL null that would otherwise filter the row out)
      val srcOk = if (ec.allowedSourceLabels.isEmpty) lit(true)
        else coalesce(col("src_label").isin(ec.allowedSourceLabels.toSeq: _*), lit(true))
      val dstOk = if (ec.allowedTargetLabels.isEmpty) lit(true)
        else coalesce(col("dst_label").isin(ec.allowedTargetLabels.toSeq: _*), lit(true))
      acc && when(col("rel_type") === ec.relType, srcOk && dstOk).otherwise(lit(true))
    }
    withLabels.filter(keep).drop("src_label", "dst_label")
  }
}
