package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join composition gate. SaltedAgg/SaltedJoin are the
  * library's EXPLICIT skew levers; this spec pins the RUNTIME one the
  * 100x story also leans on: with adaptive execution on, a sort-merge
  * join whose build of one reducer partition dwarfs the others is
  * split at runtime (`SortMergeJoin(skew=true)`) into sub-reads of the
  * map outputs — no salting column, no code change — and the result
  * is row-identical to the non-adaptive plan. Claims are asserted on
  * the executed plan after materialization, because skew handling
  * exists ONLY in the final adaptive plan.
  */
class AqeSkewJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def skewed = {
    import spark.implicits._
    // one hot key carrying 50k rows vs 50 cold keys at 100 rows: the
    // hot reducer partition is ~500x the median, far past factor 1
    val hot = (1 to 50000).map(i => ("hot", i.toLong))
    val cold = for (k <- 1 to 50; i <- 1 to 100) yield (s"k$k", i.toLong)
    (hot ++ cold).toDF("key", "v")
  }
  private def dim = {
    import spark.implicits._
    (("hot" +: (1 to 50).map(k => s"k$k")).flatMap(k => (1 to 20).map(j => (k, j.toLong))))
      .toDF("key", "w")
  }

  // deep SMJ collector: QueryStageExec nodes are LEAVES of the adaptive
  // plan (their materialized subtree hangs off .plan), so a plain
  // .collect never sees the join inside a ResultQueryStage
  private def smjsOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[SortMergeJoinExec] = p match {
    case a: AdaptiveSparkPlanExec => smjsOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => smjsOf(q.plan)
    case s: SortMergeJoinExec => s +: s.children.flatMap(smjsOf)
    case other => other.children.flatMap(smjsOf)
  }

  private def withConfs[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed SMJ partition and preserves the exact result") {
    val expected = withConfs("spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      skewed.join(dim, "key").agg(count(lit(1)), sum(expr("v * w")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).head
    }
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k") {
      val j = skewed.join(dim, "key").agg(count(lit(1)), sum(expr("v * w")))
      val got = j.collect().map(r => (r.getLong(0), r.getLong(1))).head
      assert(got === expected)
      val smjs = smjsOf(j.queryExecution.executedPlan)
      assert(smjs.nonEmpty, j.queryExecution.executedPlan.toString)
      assert(smjs.exists(_.isSkewJoin), j.queryExecution.executedPlan.toString)
    }
  }

  test("the same join without skew stays unsplit (no false positives in the pin)") {
    import spark.implicits._
    val flat = (for (k <- 1 to 51; i <- 1 to 100) yield (s"k$k", i.toLong)).toDF("key", "v")
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "5.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256MB") {
      val j = flat.join(dim, "key").agg(count(lit(1)))
      j.collect()
      val smjs = smjsOf(j.queryExecution.executedPlan)
      assert(smjs.nonEmpty && smjs.forall(!_.isSkewJoin), j.queryExecution.executedPlan.toString)
    }
  }
}
