package graft

import graft.pipeline.IntervalJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O50 — bucketed interval join pinned against the naive cross-join
  * filter: boundary inclusivity on both ends, intervals spanning many
  * buckets, zero-length and inverted intervals, many-to-many overlap,
  * key isolation, and bucket-width invariance (any positive width must
  * give the same rows — the bucket is pure candidate routing). */
class IntervalJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def probeDf(rows: Seq[(Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("pid", "k", "t_sec")
      .withColumn("ts", timestamp_seconds(col("t_sec"))).drop("t_sec")
  }
  private def ivDf(rows: Seq[(Long, Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("iid", "k", "s_sec", "e_sec")
      .withColumn("ws", timestamp_seconds(col("s_sec")))
      .withColumn("we", timestamp_seconds(col("e_sec")))
      .drop("s_sec", "e_sec")
  }

  private def run(p: DataFrame, iv: DataFrame, bucketSec: Long): Set[(Long, Long)] =
    IntervalJoin.contained(p, iv, Seq("k"), "ts", "ws", "we", bucketSec)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def naive(p: DataFrame, iv: DataFrame): Set[(Long, Long)] =
    p.join(iv, Seq("k"))
      .filter(col("ts") >= col("ws") && col("ts") <= col("we"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private val probes = Seq(
    (1L, 1L, 100L), (2L, 1L, 200L), (3L, 1L, 300L),
    (4L, 2L, 100L), // same times, different key
    (5L, 1L, 1000L))
  private val intervals = Seq(
    (10L, 1L, 100L, 200L),   // boundary-inclusive both ends
    (11L, 1L, 150L, 350L),   // overlaps 10 -> many-to-many
    (12L, 1L, 300L, 300L),   // zero-length
    (13L, 1L, 500L, 400L),   // inverted -> dropped
    (14L, 2L, 90L, 110L),    // other key
    (15L, 1L, 0L, 5000L))    // spans many buckets

  test("matches the naive containment join exactly") {
    val (p, iv) = (probeDf(probes), ivDf(intervals))
    val expected = naive(p, iv)
    assert(run(p, iv, 60L) === expected)
    // boundary + semantics sanity, hand-checked
    assert(expected.contains((1L, 10L)) && expected.contains((2L, 10L))) // ts==start, ts==end
    assert(expected.contains((3L, 12L)))                                 // zero-length
    assert(!expected.exists(_._2 == 13L))                                // inverted dropped
    assert(expected.contains((4L, 14L)) && !expected.contains((1L, 14L))) // key isolation
    assert(probes.map(_._1).forall(pid => expected.contains((pid, 15L)) || pid == 4L))
  }

  test("bucket width is pure routing: same rows at any width") {
    val (p, iv) = (probeDf(probes), ivDf(intervals))
    val expected = naive(p, iv)
    Seq(1L, 7L, 100L, 3600L, 86400L).foreach { w =>
      assert(run(p, iv, w) === expected, s"width $w")
    }
  }

  test("partitioning invariance") {
    val p = probeDf(probes).repartition(5)
    val iv = ivDf(intervals).repartition(3)
    assert(run(p, iv, 60L) === naive(probeDf(probes), ivDf(intervals)))
  }
}
