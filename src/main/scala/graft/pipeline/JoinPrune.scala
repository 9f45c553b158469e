package graft.pipeline

import graft.core.Ebf
import graft.functions.Graft
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-join reduction via a broadcast elastic Bloom filter (O31).
  *
  * The dominant cost of a selective fact-to-dimension join at 10^12
  * rows is shuffling the fact side — including every row that will
  * find no match and be dropped on the reduce side. Pre-filtering the
  * fact side with a membership sketch built from the dimension keys
  * removes those rows BEFORE the exchange, on the map side, inside
  * whole-stage codegen. The EBF's no-false-negative guarantee makes
  * the pruned join's result EXACTLY equal to the plain join: a false
  * positive only lets a doomed row reach the join, where the equi-join
  * condition drops it as before; a matching row can never be filtered.
  *
  * This is the engine-native analogue of Spark's runtime bloom-filter
  * join pruning (spark.sql.optimizer.runtime.bloomFilter.*), built on
  * the library's own resizable sketch: the filter EXPANDS to the
  * observed key count instead of being pre-sized from (often stale)
  * stats, so one code path serves 10^3- and 10^9-key build sides at a
  * bounded FPR — and the same serialized sketch can be persisted and
  * reused across queries that join the same dimension snapshot, which
  * Spark's per-query runtime filter cannot.
  *
  * Scale shape: the build side aggregates to ONE sketch through the
  * mergeable EbfAgg (partial aggregation map-side, one small merge
  * tree — no row ever leaves the build scan unaggregated), the sketch
  * ships to probe tasks via TorrentBroadcast exactly like a broadcast
  * join's build relation, and the probe is a map-only filter. For
  * build sides whose SKETCH outgrows broadcast limits, use
  * [[ShardedProbe]]'s cogrouped path instead.
  */
object JoinPrune {

  /** The EBF of `key` over `build`, collected to the driver (one small
    * sketch row — the broadcast-build-side pattern, not a data collect). */
  def buildFilter(build: DataFrame, key: Column): Ebf = {
    Graft.ensure(build.sparkSession)
    Ebf.fromBytes(
      build.agg(call_udf("ebf_agg", key.cast("string")).as("sk"))
        .head.getAs[Array[Byte]](0))
  }

  /** `fact` reduced to rows whose `factKey` might match a build-side
    * key: map-only, no shuffle, no false negatives. */
  def prunedFact(fact: DataFrame, factKey: Column, filter: Ebf): DataFrame = {
    val probe = Graft.ebfProbe(fact.sparkSession, filter)
    fact.filter(probe(factKey.cast("string")))
  }

  /** The pruned equi-join: result is exactly `fact JOIN build`, with
    * the fact-side exchange carrying only rows that might match.
    * Restricted to join types whose result is insensitive to dropping
    * matchless FACT rows (inner / left_semi from the fact side); a
    * fact-preserving outer join would lose rows to pruning. */
  def ebfPrunedJoin(fact: DataFrame, factKey: String,
                    build: DataFrame, buildKey: String,
                    joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "leftsemi" || jt == "semi",
      s"EBF pruning preserves semantics only for inner/left_semi joins, got $joinType")
    // The probe compares canonical STRING renderings while the join
    // compares values under Spark's numeric coercion; those agree only
    // when both keys already have the same type (7.0 renders "7.0",
    // its INT match renders "7" — the probe would prune a matching
    // row). Refuse mismatched types rather than silently lose rows;
    // the caller casts one side explicitly and the join then compares
    // what the filter compared.
    val ft = fact.schema(factKey).dataType
    val bt = build.schema(buildKey).dataType
    require(ft == bt,
      s"join key types must match for exact pruning: $factKey is ${ft.sql}, " +
        s"$buildKey is ${bt.sql} — cast one side first")
    val pruned = prunedFact(fact, fact(factKey), buildFilter(build, build(buildKey)))
    pruned.join(build, pruned(factKey) === build(buildKey), joinType)
  }
}
