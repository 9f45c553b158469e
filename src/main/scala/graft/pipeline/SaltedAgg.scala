package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O11 — explicit salted two-stage sketch aggregation for host-skewed
  * shuffles (mandated verbatim by BASELINE.json:north_rule).
  *
  * Why: AQE splits skewed *join* partitions but NOT skewed aggregation
  * groups — a Zipf-heavy host key means one reducer receives the whole
  * head host. Because every sketch in this library is a commutative
  * monoid with an exact merge, aggregation can be split into
  *
  *   stage 1: groupBy(keys :+ salt)  — spreads the head group over
  *            `numSalts` reducers; partial (map-side) aggregation still
  *            applies within each salt;
  *   stage 2: groupBy(keys) over the per-salt sketches with the
  *            `*_merge_agg` aggregators — input is numSalts rows per
  *            group, so the second shuffle is tiny.
  *
  * The result is byte-identical to the unsalted aggregation (merge is
  * exact and order-free) — verified by the `salted_vs_plain_equivalence`
  * driver query and the pipeline test suite.
  */
object SaltedAgg {

  /** One aggregate column routed through the two stages.
    *
    * @param name     output column name
    * @param build    stage-1 aggregate over raw rows, e.g. `expr("ebf_agg(url)")`
    * @param mergeFn  SQL name of the stage-2 bytes-merge aggregator,
    *                 e.g. "ebf_merge_agg"
    */
  final case class SketchSpec(name: String, build: Column, mergeFn: String)

  /** Two-stage skew-safe aggregation.
    *
    * @param df       input rows
    * @param keys     group-by key column names
    * @param saltOn   expression whose hash spreads the head groups
    *                 (typically a high-cardinality column like url)
    * @param numSalts salt fan-out (stage-1 reducers per group)
    */
  def sketchAgg(df: DataFrame, keys: Seq[String], saltOn: Column, numSalts: Int,
                specs: Seq[SketchSpec]): DataFrame = {
    require(specs.nonEmpty)
    val salted = df.withColumn("__salt", pmod(xxhash64(saltOn), lit(numSalts)))
    val s1Aggs = specs.map(sp => sp.build.as(sp.name))
    val stage1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(s1Aggs.head, s1Aggs.tail: _*)
    val s2Aggs = specs.map(sp => expr(s"${sp.mergeFn}(${sp.name})").as(sp.name))
    stage1
      .groupBy(keys.map(col): _*)
      .agg(s2Aggs.head, s2Aggs.tail: _*)
  }

  /** Unsalted single-stage counterpart (for equivalence checks / when
    * the group key is known to be well-distributed). */
  def plainAgg(df: DataFrame, keys: Seq[String], specs: Seq[SketchSpec]): DataFrame = {
    val aggs = specs.map(sp => sp.build.as(sp.name))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
