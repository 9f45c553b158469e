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

  /** Interval-overlap join: pairs of interval rows (same equi-keys) whose
    * [start, end] ranges intersect, inclusively — campaign windows x
    * outage windows, session x session. Same bucket routing as
    * `contained`, with the interval-pair twist: an overlapping pair
    * shares EVERY bucket of the intersection, so naive bucket-join
    * duplicates it once per shared bucket. Instead of a `distinct`
    * (a second shuffle over the full result), each pair is emitted only
    * in the bucket containing `greatest(start_l, start_r)` — the
    * intersection's first instant, which by the overlap predicate lies
    * inside BOTH intervals, so both sides are guaranteed to have
    * exploded into that bucket, and it is unique per pair. Exactly-once
    * by construction, zero dedup cost.
    *
    * Inputs must disambiguate non-key column names; inverted intervals
    * (end < start) are dropped on both sides; overlap is inclusive
    * (end_l == start_r touches => matches).
    */
  def overlap(left: DataFrame, right: DataFrame, keys: Seq[String],
              lStart: String, lEnd: String, rStart: String, rEnd: String,
              bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val w = bucketSeconds * 1000000L
    def explodeBuckets(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(e) >= col(s))
        .withColumn("__b", explode(sequence(
          floor(Sessionize.micros(col(s)) / w),
          floor(Sessionize.micros(col(e)) / w))))
    val lb = explodeBuckets(left, lStart, lEnd)
    val rb = explodeBuckets(right, rStart, rEnd)
    lb.join(rb, keys :+ "__b")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__b") ===
        floor(Sessionize.micros(greatest(col(lStart), col(rStart))) / w))
      .drop("__b")
  }
}
