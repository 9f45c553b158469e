package graft

import graft.pipeline.AsofJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O45 — point-in-time join semantics pinned against hand-computed
  * expectations: backward/forward directions, <=/>= tie inclusion,
  * left-outer nulls, tolerance nulling (not re-matching), multi-key,
  * and partition-count invariance (the window is a total order per
  * key, so any shuffle layout must agree). */
class AsofJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def leftDf: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "a", 10L), (2L, "a", 5L), (3L, "a", 8L),
      (4L, "b", 7L),                       // key with no right rows
      (5L, "c", 3L), (6L, "c", 20L)
    ).toDF("id", "k", "t").repartition(3)
  }
  private def rightDf: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", 8L, 900L), ("a", 3L, 901L), ("a", 12L, 902L),
      ("c", 3L, 903L), ("c", 25L, 904L)
    ).toDF("k", "rt", "p").repartition(2)
  }

  private def collect(df: DataFrame): Map[Long, (Option[Long], Option[Long])] =
    df.collect().map { r =>
      r.getLong(0) -> (
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }.toMap

  test("backward: greatest rt <= t, ties included, unmatched null") {
    val full = AsofJoin.join(leftDf, rightDf, Seq("k"), "t", "rt")
    // regression: leftTime must appear exactly once (it used to ride
    // both __t and the payload struct — a select-by-name ambiguity)
    assert(full.columns.toSeq.sorted === full.columns.distinct.toSeq.sorted)
    assert(full.columns.count(_ == "t") === 1)
    val out = full.select("id", "k", "rt", "p")
    assert(collect(out) === Map(
      1L -> (Some(8L), Some(900L)),   // a,t=10 -> rt=8
      2L -> (Some(3L), Some(901L)),   // a,t=5  -> rt=3
      3L -> (Some(8L), Some(900L)),   // a,t=8  -> tie: rt=8 matches (<=)
      4L -> (None, None),             // b: no right rows
      5L -> (Some(3L), Some(903L)),   // c,t=3  -> tie
      6L -> (Some(3L), Some(903L))))  // c,t=20 -> rt=3 (25 is future)
  }

  test("forward: smallest rt >= t") {
    val out = AsofJoin.join(leftDf, rightDf, Seq("k"), "t", "rt",
        direction = "forward")
      .select("id", "k", "rt", "p")
    assert(collect(out) === Map(
      1L -> (Some(12L), Some(902L)),
      2L -> (Some(8L), Some(900L)),
      3L -> (Some(8L), Some(900L)),
      4L -> (None, None),
      5L -> (Some(3L), Some(903L)),
      6L -> (Some(25L), Some(904L))))
  }

  test("tolerance nulls far matches without re-matching older rows") {
    val out = AsofJoin.join(leftDf, rightDf, Seq("k"), "t", "rt",
        tolerance = Some(lit(4L)))
      .select("id", "k", "rt", "p")
    val got = collect(out)
    assert(got(6L) === ((None, None)), "c,t=20: rt=3 is 17 away — nulled, not re-matched")
    assert(got(1L) === ((Some(8L), Some(900L))), "within tolerance unchanged")
    assert(got(4L) === ((None, None)))
  }

  test("deterministic under different partition counts") {
    val a = AsofJoin.join(leftDf.repartition(1), rightDf.repartition(1),
      Seq("k"), "t", "rt").select("id", "rt", "p").orderBy("id").collect().toSeq
    val b = AsofJoin.join(leftDf.repartition(7), rightDf.repartition(5),
      Seq("k"), "t", "rt").select("id", "rt", "p").orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("multi-key join keys both columns") {
    import spark.implicits._
    val l = Seq((1L, "x", 1, 10L), (2L, "x", 2, 10L)).toDF("id", "k1", "k2", "t")
    val r = Seq(("x", 1, 9L, 100L), ("x", 2, 4L, 200L)).toDF("k1", "k2", "rt", "p")
    val out = AsofJoin.join(l, r, Seq("k1", "k2"), "t", "rt")
      .select("id", "rt", "p").orderBy("id").collect()
    assert(out(0).getLong(1) === 9L && out(0).getLong(2) === 100L)
    assert(out(1).getLong(1) === 4L && out(1).getLong(2) === 200L)
  }

  test("hot-key time-bucket split is row-identical to the unsplit path") {
    import spark.implicits._
    // one 500x-hot key ("hot") + two normal keys, random-ish times with
    // deliberate duplicates so the tie rules are exercised across
    // bucket boundaries; both directions and tolerance checked
    val rnd = new scala.util.Random(0xA50FL)
    val lRows = (1L to 500L).map(i => (i, "hot", (rnd.nextInt(100) * 2).toLong)) ++
      Seq((1001L, "k1", 10L), (1002L, "k1", 55L), (1003L, "k2", 7L))
    val rRows = (1L to 300L).map(i => ("hot", (rnd.nextInt(100) * 2).toLong, 9000L + i)) ++
      Seq(("k1", 10L, 1L), ("k1", 40L, 2L), ("k3", 5L, 3L))
    val l = lRows.toDF("id", "k", "t").repartition(5)
    val r = rRows.toDF("k", "rt", "p").repartition(3)
    val bucket = (t: org.apache.spark.sql.Column) => floor(t / 25L)
    for (dir <- Seq("backward", "forward");
         tol <- Seq(None, Some(lit(30L)))) {
      val plain = AsofJoin.join(l, r, Seq("k"), "t", "rt", dir, tol)
        .collect().map(_.toSeq).toSet
      val split = AsofJoin.join(l, r, Seq("k"), "t", "rt", dir, tol,
          timeBucket = Some(bucket))
        .collect().map(_.toSeq).toSet
      assert(split === plain, s"direction=$dir tolerance=$tol")
    }
  }

  test("time-bucket split actually breaks the hot key into bounded slices") {
    import spark.implicits._
    // the repair's partition key is (k, bucket): with 8 buckets the
    // biggest window slice must be far below the hot key's total rows
    val lRows = (1L to 800L).map(i => (i, "hot", i % 200))
    val l = lRows.toDF("id", "k", "t")
    val r = Seq(("hot", 3L, 1L)).toDF("k", "rt", "p")
    val bucketOf = (t: org.apache.spark.sql.Column) => floor(t / 25L)
    // same unified shape the join builds: every (k, bucket) slice holds
    // <= 25 distinct times of the 200 -> max slice ~1/8 of the key
    val sliceMax = l.select(col("k"), bucketOf(col("t")).as("b"))
      .groupBy("k", "b").count().agg(max("count")).head.getLong(0)
    assert(sliceMax <= 110L, s"max slice $sliceMax")
    // and the split path still returns one row per left row
    val out = AsofJoin.join(l, r, Seq("k"), "t", "rt",
      timeBucket = Some(bucketOf))
    assert(out.count() === 800L)
    // t = i % 200 -> 12 rows carry t < 3 and stay unmatched (rt = 3)
    assert(out.filter(col("p").isNotNull).count() === 788L)
  }

  test("column collision between sides is refused loudly") {
    import spark.implicits._
    val l = Seq((1L, "x", 10L)).toDF("id", "k", "t")
    val r = Seq(("x", 9L, 5L)).toDF("k", "rt", "id") // id collides
    val e = intercept[IllegalArgumentException] {
      AsofJoin.join(l, r, Seq("k"), "t", "rt")
    }
    assert(e.getMessage.contains("collision"))
  }
}
