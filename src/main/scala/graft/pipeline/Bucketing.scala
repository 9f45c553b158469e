package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** O81 — bucketed co-located joins (the storage-layout shuffle lever).
  *
  * At 10^12 rows the dominant cost of a fact-to-fact join is the
  * shuffle of both sides. Bucketing pre-pays that shuffle ONCE at
  * write time: `bucketBy(n, key)` hashes every row into one of n
  * buckets with the same Murmur3 hash Spark's `HashPartitioning`
  * uses, so a scan of the bucketed table already satisfies the join's
  * required distribution and the exchange is elided entirely. With
  * `sortBy` and one file per bucket the read-side sort is elided too
  * — the classic sort-merge-bucket (SMB) join. This is the parquet
  * catalog-table equivalent of Iceberg's `bucket(n, key)` partition
  * transform (SURVEY.md §1.2: the sandbox has no Iceberg jars, so
  * catalog-registered bucketed parquet stands in for it; the plan
  * shape — scan reports HashPartitioning, join elides the exchange —
  * is identical).
  *
  * Three regimes, all spec-verified in `BucketingSpec`:
  *  - both sides bucketed on the join key with the same bucket count:
  *    ZERO shuffle exchanges in the join plan;
  *  - one side bucketed: exactly ONE exchange (the unbucketed side is
  *    shuffled TO the bucketed side's distribution — still half the
  *    shuffle of a plain join);
  *  - point filter on the bucket key: Spark prunes to a single bucket
  *    (`SelectedBucketsCount: 1 out of n`) — the read-path benefit.
  */
object Bucketing {

  /** Write `df` as a bucketed (and per-bucket sorted) external parquet
    * table at `path`, registered in the session catalog as `table`.
    * The pre-write `repartition(numBuckets, key)` uses the SAME hash
    * as the bucket spec, so each task holds exactly one bucket and
    * writes exactly one file — the precondition for the read side to
    * trust `sortBy` and elide the merge-join sort.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sorted: Boolean = true): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    val cols = bucketCols.map(org.apache.spark.sql.functions.col)
    val w = df
      .repartition(numBuckets, cols: _*)
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sorted) w.sortBy(bucketCols.head, bucketCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Count shuffle exchanges anywhere in `df`'s physical plan,
    * descending through AQE wrappers and materialized query stages.
    * Call AFTER an action if AQE is on, so the final plan is read.
    */
  def countShuffles(df: DataFrame): Int = countShuffles(df.queryExecution.executedPlan)

  private def countShuffles(p: SparkPlan): Int = p match {
    case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
    case q: QueryStageExec => countShuffles(q.plan)
    case e: ShuffleExchangeLike => 1 + e.children.map(countShuffles).sum
    case other => other.children.map(countShuffles).sum
  }

  /** Run `body` with broadcast joins disabled, so a co-location claim
    * is tested against the sort-merge path it is designed for (a
    * broadcast join is ALSO shuffle-free but proves nothing about the
    * bucket layout). Restores the previous threshold afterwards.
    */
  def withSortMergeOnly[T](s: SparkSession)(body: => T): T = {
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
