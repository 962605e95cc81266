package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage: score candidate record
  * pairs by the log-likelihood ratio of their field-agreement pattern.
  * For field i with match/unmatch agreement priors (m_i, u_i), an
  * agreeing field contributes ln(m_i/u_i) and a disagreeing one
  * ln((1−m_i)/(1−u_i)); the pair score is the sum, and pairs above a
  * cutoff are candidate links. The classical scoring layer the
  * entity-resolution cascade (`Ingest.resolveEntities`) sits in front
  * of — resolveEntities finds WHICH pairs to compare (blocking +
  * IVF-gated semantic probe); this scores HOW WELL they match.
  * Reference analog: the entity-dedup decision in
  * `memory_graph.py` §store_llm_generated_graph (LLM adjudicates
  * match/no-match; here the adjudicator is the deterministic F-S
  * weight model behind the same pair-scoring seam).
  *
  * Scale shape: one blocked self-join (the block key bounds the
  * quadratic — standard blocking discipline) + a fixed per-pair scalar
  * expression; no aggregation, no window. Weights are computed ONCE in
  * Scala and injected as literals, so the score is a sum of constants
  * selected by equality tests — bit-identical across engines and runs.
  *
  * `fields` are pre-derived comparison columns on `records` (equality
  * is the agreement test; nulls never agree); `priors` pairs (m_i, u_i)
  * align with `fields` by position. */
object RecordLinkage {

  /** ln(m/u) and ln((1-m)/(1-u)) as plain doubles — exposed so oracle
    * SQL can embed the IDENTICAL literals. */
  def weights(priors: Seq[(Double, Double)]): Seq[(Double, Double)] =
    priors.map { case (m, u) =>
      require(m > 0 && m < 1 && u > 0 && u < 1, s"priors must be in (0,1): ($m, $u)")
      (math.log(m / u), math.log((1 - m) / (1 - u)))
    }

  def fellegiSunter(records: DataFrame, idCol: String, blockCol: String,
                    fields: Seq[String], priors: Seq[(Double, Double)],
                    cutoff: Double): DataFrame = {
    require(fields.nonEmpty && fields.size == priors.size,
      s"fields (${fields.size}) and priors (${priors.size}) must align")
    val ws = weights(priors)
    def side(tag: String) = records.select(
      (col(idCol).as(s"id_$tag") +: col(blockCol).as(s"blk_$tag") +:
        fields.map(f => col(f).as(s"${f}_$tag"))): _*)
    val joined = side("a").join(side("b"),
      col("blk_a") === col("blk_b") && col("id_a") < col("id_b"))
    // fixed left-associated sum of constant literals — no fp order drift
    val score = fields.zip(ws).map { case (f, (wa, wd)) =>
      when(col(s"${f}_a") === col(s"${f}_b"), lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _)
    joined
      .withColumn("score", score)
      .filter(col("score") >= cutoff)
      .select(col("id_a"), col("id_b"), col("score"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
