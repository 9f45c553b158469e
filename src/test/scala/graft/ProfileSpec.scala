package graft

import graft.functions.Graft
import graft.pipeline.Profile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O74 — one-pass table profile: exact scalars match the exact
  * aggregates, estimates are exact at tiny cardinality, null and
  * empty-input conventions, partitioning invariance of the exacts. */
class ProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Graft.ensure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate())

  import spark.implicits._

  private def t = Seq(
    (1L, Some(10.0), "a"), (2L, Some(20.0), "b"), (3L, Some(30.0), "a"),
    (4L, None, "a"), (5L, Some(50.0), "c"), (6L, Some(60.0), null)
  ).toDF("id", "v", "s")

  test("exact scalars, null counting, and MG exactness at tiny cardinality") {
    val p = Profile.profile(spark, t, Seq("v"), Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val v = p("v")
    assert(v.getAs[Long]("n") === 5L && v.getAs[Long]("nulls") === 1L)
    assert(v.getAs[Double]("min_d") === 10.0 && v.getAs[Double]("max_d") === 60.0)
    assert(math.abs(v.getAs[Double]("mean") - 34.0) < 1e-12)
    assert(v.getAs[Long]("ndv_est") === 5L, "HLL is exact at n=5")
    val s = p("s")
    assert(s.getAs[Long]("n") === 5L && s.getAs[Long]("nulls") === 1L)
    assert(s.getAs[Long]("ndv_est") === 3L)
    assert(s.getAs[String]("top_key") === "a" && s.getAs[Long]("top_est") === 3L,
      "Misra-Gries is exact below capacity")
    assert(s.isNullAt(s.fieldIndex("min_d")) && s.isNullAt(s.fieldIndex("p50_est")))
  }

  test("empty input: zero counts, null value stats") {
    val p = Profile.profile(spark, t.filter(col("id") > 100), Seq("v"), Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("v").getAs[Long]("n") === 0L)
    assert(p("v").isNullAt(p("v").fieldIndex("min_d")))
    assert(p("v").isNullAt(p("v").fieldIndex("p50_est")))
    assert(p("s").isNullAt(p("s").fieldIndex("top_key")))
  }

  test("exact columns are partitioning-invariant; quantiles within bound at 10k rows") {
    val big = spark.range(10000).select(
      col("id"), (col("id") % 1000).cast("double").as("v"),
      concat(lit("k"), col("id") % 7).as("s"))
    def run(parts: Int) =
      Profile.profile(spark, big.repartition(parts), Seq("v"), Seq("s"))
        .collect().map(r => r.getString(0) -> r).toMap
    val a = run(1)
    val b = run(8)
    for (c <- Seq("v", "s"); f <- Seq("n", "nulls"))
      assert(a(c).getAs[Long](f) === b(c).getAs[Long](f))
    assert(a("v").getAs[Double]("mean") === b("v").getAs[Double]("mean"))
    // v is 0..999 uniform x10: p50 est within rank eps of 499.5
    val eps = graft.core.Kll.empty().normalizedRankError * 2.0
    Seq(a, b).foreach { p =>
      assert(math.abs(p("v").getAs[Double]("p50_est") - 499.5) <= eps * 1000 + 1)
      assert(p("s").getAs[String]("top_key").startsWith("k"))
    }
  }
}
