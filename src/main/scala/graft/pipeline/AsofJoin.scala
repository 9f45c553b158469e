package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — the classic missing-in-Spark
  * operator: for each left row, attach the single right row with the
  * same key and the greatest right time <= left time (`backward`; the
  * `forward` direction takes the smallest right time >= left time).
  * Left-outer semantics: unmatched left rows keep null right columns,
  * matching DuckDB's `ASOF LEFT JOIN` (the driver oracle) and pandas
  * `merge_asof`.
  *
  * Spark-first composition, per the preference order (compose existing
  * ops before custom plans): the two sides are UNIONED with a tag and
  * processed by ONE window —
  *
  *   union(keys, t, tag=0/1, payload-struct)
  *     -> Window.partitionBy(keys).orderBy(t, tag, rightPayload)
  *          .rowsBetween(unboundedPreceding, current)
  *     -> last(rightPayload, ignoreNulls) over the running frame
  *     -> filter(tag = left), expand structs
  *
  * Right rows order BEFORE left rows at equal time (tag 0 < 1), so
  * `t_left == t_right` matches, i.e. the comparator is <= / >=.
  * Tied right rows order by their payload struct — a deterministic
  * winner under any partitioning.
  *
  * Plan shape at 100 TB: one exchange per side (the union shuffles by
  * key once), one sort, and the running `last(..., ignoreNulls)` frame
  * is O(1) per row in a single pass — exactly the merge phase of a
  * sort-merge as-of join, with no per-left-row right-side rescan (a
  * naive `join + filter + row_number` pays |L| x |R| within each key).
  * Skew caveat: a single hot KEY serializes into one partition — as-of
  * needs the full time-ordered view per key, so salting does not apply;
  * split hot keys upstream by a coarse time bucket when the per-key
  * volume demands it (each bucket then needs the previous bucket's
  * tail row, the standard windowed repair).
  *
  * `tolerance`: optional max lead/lag (e.g. `expr("INTERVAL 1 DAY")`)
  * — a match farther than the tolerance is nulled out (the left row
  * survives), never replaced by an older one, mirroring `merge_asof`.
  */
object AsofJoin {

  /** @param timeBucket r6 hot-KEY skew repair (the "split hot keys
    *   upstream by a coarse time bucket" this scaladoc documented):
    *   a MONOTONE non-decreasing function of the unified time column
    *   (passed as a column over `__t`, e.g.
    *   `floor(col("__t") / 3600)`). When set, the running-last window
    *   partitions by (keys, bucket) — a hot key's time-ordered view is
    *   processed as parallel bucket slices — and each bucket's match is
    *   repaired with the carry-in tail of the PREVIOUS buckets (the
    *   standard windowed split: per (key, bucket) the last right row is
    *   aggregated, a bucket-count-sized per-key window computes the
    *   running tail, and a (keys, bucket) equi-join re-attaches it).
    *   Row-identical to the unsplit path for ANY monotone bucketing
    *   (AsofJoinSpec asserts it on a 500x-hot key): equal times share a
    *   bucket, so the within-bucket ordering/tie rules are unchanged,
    *   and a match not in the left row's bucket is exactly the latest
    *   previous bucket tail. Cost: one extra bucket-granular aggregate
    *   + small join; leave None when no key is hot enough to serialize
    *   a partition. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           direction: String = "backward",
           tolerance: Option[Column] = None,
           timeBucket: Option[Column => Column] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(!keys.contains(leftTime) && !keys.contains(rightTime),
      "the time column cannot also be an equi-key")
    // leftTime travels as __t and is re-projected under its own name;
    // carrying it in the payload struct too would DUPLICATE the column
    // in the output (an ambiguity trap for any later select by name)
    val lPayload = left.columns.filterNot(c => keys.contains(c) || c == leftTime).toSeq
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    val overlap = (lPayload :+ leftTime).intersect(rPayload)
    require(overlap.isEmpty,
      s"non-key column collision between sides: ${overlap.mkString(", ")} — " +
        "rename/project the right side first")

    // unified shape: keys | __t | __tag | __l | __r (struct payloads;
    // each side carries null for the other's struct)
    val lStructCols = lPayload.map(col)
    val rStructCols = rPayload.map(col)
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__tag"),
        struct(lStructCols: _*).as("__l")): _*)
    val rSide = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__tag"),
        struct(rStructCols: _*).as("__r")): _*)
    val lTyped = lSide.withColumn("__r",
      lit(null).cast(rSide.schema("__r").dataType))
    val rTyped = rSide.withColumn("__l",
      lit(null).cast(lSide.schema("__l").dataType))
    val unioned = lTyped.select((keys ++ Seq("__t", "__tag", "__l", "__r")).map(col): _*)
      .unionByName(rTyped.select((keys ++ Seq("__t", "__tag", "__l", "__r")).map(col): _*))

    val timeOrder =
      if (direction == "backward") Seq(col("__t").asc, col("__tag").asc, col("__r").asc)
      else Seq(col("__t").desc, col("__tag").asc, col("__r").asc)

    val (unionedB, matched0) = timeBucket match {
      case None =>
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(timeOrder: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        (unioned, last(col("__r"), ignoreNulls = true).over(w))
      case Some(bucketOf) =>
        // hot-key split: window per (keys, bucket) + carry-in repair
        val withB = unioned.withColumn("__b", bucketOf(col("__t")))
        val bCols = keys.map(col) :+ col("__b")
        // both frames share one sort: running last within the bucket,
        // and the bucket's final tail (same WindowExec, two frames)
        val wRun = Window.partitionBy(bCols: _*).orderBy(timeOrder: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(bCols: _*).orderBy(timeOrder: _*)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val inBucket = withB
          .withColumn("__run", last(col("__r"), ignoreNulls = true).over(wRun))
          .withColumn("__tail", last(col("__r"), ignoreNulls = true).over(wAll))
        // bucket-granular tails -> running carry-in from previous
        // buckets (bucket order follows the time direction); __tail is
        // constant per (keys, bucket), so first() is deterministic
        val bucketOrder =
          if (direction == "backward") col("__b").asc else col("__b").desc
        val wCarry = Window.partitionBy(keys.map(col): _*).orderBy(bucketOrder)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = inBucket.groupBy(bCols: _*)
          .agg(first(col("__tail")).as("__tail"))
          .withColumn("__carry", last(col("__tail"), ignoreNulls = true).over(wCarry))
          .select((keys.map(col) :+ col("__b") :+ col("__carry")): _*)
        val repaired = inBucket.join(carry, keys :+ "__b")
        (repaired, coalesce(col("__run"), col("__carry")))
    }

    val matched = tolerance match {
      case None => matched0
      case Some(tol) =>
        val rt = matched0.getField(rightTime)
        val ok =
          if (direction == "backward") col("__t") <= rt + tol
          else rt <= col("__t") + tol
        when(matched0.isNotNull && ok, matched0)
    }

    val out = unionedB
      .withColumn("__m", matched)
      .filter(col("__tag") === 1)
    val cols =
      keys.map(col) ++
        Seq(col("__t").as(leftTime)) ++
        lPayload.map(c => col("__l").getField(c).as(c)) ++
        rPayload.map(c => col("__m").getField(c).as(c))
    out.select(cols: _*)
  }
}
