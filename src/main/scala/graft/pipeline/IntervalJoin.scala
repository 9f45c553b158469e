package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval (containment) join: probe rows whose timestamp
  * falls inside [start, end] of an interval row with matching equi-keys
  * — the "events inside promo windows / sessions / outage periods"
  * operator. Spark's built-in answer to `ts BETWEEN start AND end` is a
  * broadcast-nested-loop or a sort-merge on the equi-keys followed by a
  * per-pair predicate — O(|probe_k| x |intervals_k|) per key, which
  * dies on hot keys at corpus scale.
  *
  * This form makes it an EQUI-join: each interval is exploded to the
  * fixed-width time buckets it covers, the probe row computes its
  * single bucket, and the join key becomes (keys..., bucket); the exact
  * containment predicate then filters the candidates. A probe row has
  * exactly ONE bucket, so each matching (probe, interval) pair meets in
  * exactly one bucket — no dedup step. Cost: shuffle bytes =
  * |probe| + sum(span_i / bucket + 2) interval replicas; per-bucket
  * work is |probe_bucket| x |intervals_touching_bucket|, bounded by
  * interval density rather than total interval count per key.
  *
  * Choosing `bucketSeconds`: of the order of the TYPICAL interval span
  * (within ~10x either way) — too small multiplies interval replicas,
  * too large multiplies false candidates. A principled pick at scale is
  * a span quantile from a KLL sketch of (end - start) (see
  * `RangePartition.byKll` for the same pattern on range boundaries).
  * Buckets are hash-shuffled, so AQE skew-join splitting applies to a
  * pathological hot bucket like to any other equi-join key.
  *
  * Semantics: containment is INCLUSIVE on both ends; intervals with
  * end < start are dropped (no rows). Both inputs must disambiguate
  * non-key column names before the call (the result carries all
  * columns of both sides minus the helper bucket).
  */
object IntervalJoin {

  def contained(probe: DataFrame, intervals: DataFrame, keys: Seq[String],
                tsCol: String, startCol: String, endCol: String,
                bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val w = bucketSeconds * 1000000L
    val pb = probe.withColumn("__b", floor(Sessionize.micros(col(tsCol)) / w))
    val iv = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__b", explode(sequence(
        floor(Sessionize.micros(col(startCol)) / w),
        floor(Sessionize.micros(col(endCol)) / w))))
    pb.join(iv, keys :+ "__b")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__b")
  }
}
