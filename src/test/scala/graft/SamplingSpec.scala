package graft

import graft.pipeline.Sampling
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic sampling must be partition-invariant (same rows kept
  * under any repartitioning — the property rand(seed) lacks), hit the
  * requested rate closely, and stratify per group. */
class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sample is identical under different partitionings and repeated runs") {
    val base = spark.range(20000).select(col("id"))
    def ids(parts: Int) = Sampling.deterministicSample(
      base.repartition(parts), col("id"), "28f5")
      .collect().map(_.getLong(0)).sorted.toSeq
    val a = ids(2)
    assert(a === ids(13))
    assert(a === ids(2))
    assert(a.nonEmpty)
  }

  test("rate tracks the hex threshold (~16% for 28f5)") {
    val n = 50000
    val kept = Sampling.deterministicSample(
      spark.range(n).select(col("id")), col("id"), "28f5").count()
    val expected = 0x28f5.toDouble / 0x10000
    assert(math.abs(kept.toDouble / n - expected) < 0.01,
      s"kept $kept of $n, expected ~${expected * n}")
  }

  test("stratified rates apply per stratum; missing strata drop") {
    import spark.implicits._
    val df = spark.range(30000)
      .select(col("id"), (col("id") % 3).cast("string").as("g"))
    val out = Sampling.stratifiedSample(df, col("id"), col("g"),
      Map("0" -> "8000", "1" -> "0400"))
    val counts = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("2"))
    assert(math.abs(counts("0") / 10000.0 - 0.5) < 0.03)
    assert(math.abs(counts("1") / 10000.0 - 0x0400.toDouble / 0x10000) < 0.02)
  }
}
