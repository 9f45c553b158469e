package graft

import graft.pipeline.Sessionize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O49 — sessionization semantics pinned against hand-computed
  * expectations: gap-boundary convention (delta == gap MERGES — the
  * behavior Spark's `session_window` exhibits, pinned here in all
  * three forms), manual-vs-native equivalence including
  * exact-boundary ties, and arrival-order independence of the
  * incremental merge. */
class SessionizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** (user, epochSeconds, value) -> events frame with real timestamps. */
  private def ev(rows: Seq[(Long, Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex
      .map { case ((u, t, v), i) => (u, i.toLong, t, v) }
      .toDF("user_id", "event_id", "t_sec", "value")
      .withColumn("ts", timestamp_seconds(col("t_sec")))
      .drop("t_sec")
  }

  private def sessionsOf(rows: Seq[(Long, Long, Double)], gapSec: Long): Seq[(Long, Long, Long, Long, Long)] =
    Sessionize.summarize(
        Sessionize.label(ev(rows), "user_id", "ts", "event_id", gapSec),
        "user_id", "ts", "value")
      .select(col("user_id"), col("session_idx"),
        Sessionize.micros(col("session_start")).as("s"),
        Sessionize.micros(col("session_end")).as("e"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(r => (r._1, r._2)).toSeq

  test("gap boundary: delta == gap merges, delta > gap splits (session_window convention)") {
    // user 1: events at 0, 100, 201 with gap 100 -> deltas 100 (stay), 101 (split)
    val rows = Seq((1L, 0L, 1.0), (1L, 100L, 1.0), (1L, 201L, 1.0))
    val got = sessionsOf(rows, 100L)
    assert(got === Seq(
      (1L, 1L, 0L, 100000000L, 2L),
      (1L, 2L, 201000000L, 201000000L, 1L)))
  }

  test("manual form == native session_window on exact-boundary data") {
    // deltas of exactly gap, gap-1, gap+1 across two users
    val rows = Seq(
      (1L, 0L, 1.0), (1L, 100L, 1.0), (1L, 199L, 1.0), (1L, 400L, 1.0),
      (2L, 50L, 1.0), (2L, 149L, 1.0), (2L, 249L, 1.0))
    val gap = 100L
    val manual = sessionsOf(rows, gap)
    val native = Sessionize.viaSessionWindow(ev(rows), "user_id", "ts", gap)
      .select(col("user_id"), Sessionize.micros(col("w_start")).as("s"),
        Sessionize.micros(col("w_end")).as("e"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(manual.size === native.size)
    manual.zip(native).foreach { case ((mu, _, ms, me, mn), (nu, ns, ne, nn)) =>
      assert(mu === nu); assert(ms === ns); assert(mn === nn)
      assert(ne === me + gap * 1000000L) // native end = last event + gap
    }
  }

  test("mergeEvent: boundaries and counts are arrival-order independent") {
    val gapUs = 100L
    // three clusters incl. a bridge case: {0,50,120} chains via 50
    val ts = Seq(0L, 50L, 120L, 400L, 520L, 530L, 1000L)
    val perms = Seq(ts, ts.reverse, Seq(520L, 0L, 1000L, 50L, 530L, 120L, 400L),
      Seq(120L, 400L, 0L, 530L, 1000L, 520L, 50L))
    val results = perms.map { order =>
      order.foldLeft(List.empty[Sessionize.SessionSummary]) { (acc, t) =>
        graft.pipeline.SessionizeTestBridge.merge(acc, t, 1.0, gapUs)
      }.map(s => (s.startUs, s.endUs, s.n))
    }
    assert(results.distinct.size === 1,
      s"order-dependent sessions: $results")
    assert(results.head === List((0L, 120L, 3L), (400L, 400L, 1L), (520L, 530L, 2L), (1000L, 1000L, 1L)))
  }

  test("mergeEvent: event exactly gap away merges; one past the gap splits") {
    val gapUs = 100L
    val one = graft.pipeline.SessionizeTestBridge.merge(Nil, 0L, 1.0, gapUs)
    val merged = graft.pipeline.SessionizeTestBridge.merge(one, 100L, 1.0, gapUs)
    assert(merged.map(s => (s.startUs, s.endUs, s.n)) === List((0L, 100L, 2L)))
    val split = graft.pipeline.SessionizeTestBridge.merge(one, 101L, 1.0, gapUs)
    assert(split.map(s => (s.startUs, s.endUs, s.n)) === List((0L, 0L, 1L), (101L, 101L, 1L)))
  }

  test("bridge event merges two existing sessions into one") {
    val gapUs = 100L
    val b = graft.pipeline.SessionizeTestBridge
    val s1 = b.merge(Nil, 0L, 1.0, gapUs)
    val s2 = b.merge(s1, 150L, 2.0, gapUs) // separate (delta 150)
    assert(s2.size === 2)
    val bridged = b.merge(s2, 75L, 4.0, gapUs) // within 100 of both
    assert(bridged.map(s => (s.startUs, s.endUs, s.n, s.total)) ===
      List((0L, 150L, 3L, 7.0)))
  }
}
