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

  // ---- overlap (interval x interval) ----

  private def lDf(rows: Seq[(Long, Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("lid", "k", "s_sec", "e_sec")
      .withColumn("ls", timestamp_seconds(col("s_sec")))
      .withColumn("le", timestamp_seconds(col("e_sec")))
      .drop("s_sec", "e_sec")
  }
  private def rDf(rows: Seq[(Long, Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("rid", "k", "s_sec", "e_sec")
      .withColumn("rs", timestamp_seconds(col("s_sec")))
      .withColumn("re", timestamp_seconds(col("e_sec")))
      .drop("s_sec", "e_sec")
  }
  private def runOv(l: DataFrame, r: DataFrame, bucketSec: Long): Seq[(Long, Long)] =
    IntervalJoin.overlap(l, r, Seq("k"), "ls", "le", "rs", "re", bucketSec)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
  private def naiveOv(l: DataFrame, r: DataFrame): Seq[(Long, Long)] =
    l.join(r, Seq("k"))
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq

  private val lefts = Seq(
    (1L, 1L, 100L, 200L),
    (2L, 1L, 0L, 5000L),    // spans many buckets, overlaps everything on k=1
    (3L, 1L, 300L, 300L),   // zero-length
    (4L, 2L, 100L, 200L),   // other key
    (5L, 1L, 900L, 800L))   // inverted -> dropped
  private val rights = Seq(
    (10L, 1L, 200L, 250L),  // touches left 1 at the boundary (inclusive)
    (11L, 1L, 120L, 180L),  // contained inside left 1
    (12L, 1L, 250L, 299L),  // disjoint from 1 and 3, inside 2
    (13L, 1L, 300L, 300L),  // zero-length meeting zero-length left 3
    (14L, 2L, 150L, 350L),  // other key
    (15L, 1L, 6000L, 7000L)) // beyond everything on k=1

  test("overlap matches the naive overlap join exactly, once per pair") {
    val (l, r) = (lDf(lefts), rDf(rights))
    val expected = naiveOv(l, r)
    val got = runOv(l, r, 60L)
    assert(got.sorted === expected.sorted) // Seq compare: exactly-once, no dup emission
    val set = got.toSet
    assert(set.contains((1L, 10L)))  // inclusive boundary touch (le == rs)
    assert(set.contains((1L, 11L)))  // containment
    assert(set.contains((3L, 13L)))  // zero-length x zero-length at same instant
    assert(!set.contains((1L, 12L))) // disjoint
    assert(!set.exists(_._1 == 5L))  // inverted left dropped
    assert(!set.exists(_._2 == 15L)) // beyond-range right unmatched
    assert(set.contains((4L, 14L)) && !set.contains((1L, 14L))) // key isolation
    assert(Seq(10L, 11L, 12L, 13L).forall(rid => set.contains((2L, rid)))) // wide left hits all k=1 rights
  }

  test("overlap bucket width is pure routing: same pairs, still exactly once, at any width") {
    val (l, r) = (lDf(lefts), rDf(rights))
    val expected = naiveOv(l, r).sorted
    Seq(1L, 7L, 100L, 3600L, 86400L).foreach { w =>
      assert(runOv(l, r, w).sorted === expected, s"width $w")
    }
  }
}
