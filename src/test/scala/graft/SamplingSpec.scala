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

  test("weighted sample: heavy rows dominate, weight<=0 excluded, exact size") {
    // 1000 light rows (w=1) + 100 heavy rows (w=200): A-ES inclusion
    // probability for a heavy row is >> a light row's; with the
    // deterministic md5 uniforms this either always passes or always
    // fails — measured once, pinned forever
    val df = spark.range(1100).select(col("id"),
      when(col("id") < 100, lit(200.0)).otherwise(lit(1.0)).as("w"))
      .withColumn("w", when(col("id") === 1099, lit(0.0)).otherwise(col("w")))
    val out = Sampling.weightedSample(df, col("id"), col("w"), 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out.size === 100)
    assert(!out.contains(1099L), "zero-weight row must never be sampled")
    val heavy = out.count(_ < 100)
    assert(heavy >= 80, s"only $heavy/100 heavy rows sampled — weights not applied")
  }

  test("weighted sample is partition-invariant and grouped") {
    val df = spark.range(5000).select(col("id"),
      (col("id") % 4).cast("string").as("g"),
      (pmod(col("id") * 37, lit(100)) + 1).cast("double").as("w"))
    def ids(parts: Int): Seq[(String, Long)] =
      Sampling.weightedSample(df.repartition(parts), col("id"), col("w"),
          25, Seq(col("g")))
        .select("g", "id").orderBy("g", "id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val a = ids(1)
    assert(a === ids(13))
    assert(a.groupBy(_._1).forall(_._2.size == 25))
  }

  test("mixToParts: proportions within binomial noise, binding stratum keeps all, " +
    "partitioning-invariant, absent strata dropped") {
    import spark.implicits._
    // strata sizes wildly off-target: a=8000, b=1000, c=400
    val rows = (1 to 8000).map(i => (s"a$i", "a")) ++
      (1 to 1000).map(i => (s"b$i", "b")) ++
      (1 to 400).map(i => (s"c$i", "c")) ++
      (1 to 300).map(i => (s"x$i", "x")) // not in parts -> dropped
    def df(parts: Int) = rows.toDF("k", "s").repartition(parts)
    // target 1:1:1 -> c binds (400 each expected)
    val parts = Map("a" -> 1L, "b" -> 1L, "c" -> 1L)
    val out = graft.pipeline.Sampling.mixToParts(df(4), col("k"), col("s"), parts)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val by = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(by("c") === 400, "binding stratum must keep everything")
    assert(!by.contains("x"), "strata absent from parts are dropped")
    // a keeps rate 400/8000 = 5%, b keeps 40%: 4 sigma binomial bands
    assert(math.abs(by("a") - 400) <= 4 * math.sqrt(8000 * 0.05 * 0.95) + 1, s"a: ${by("a")}")
    assert(math.abs(by("b") - 400) <= 4 * math.sqrt(1000 * 0.4 * 0.6) + 1, s"b: ${by("b")}")
    // identical row SET at any partitioning
    val out1 = graft.pipeline.Sampling.mixToParts(df(1), col("k"), col("s"), parts)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.toSet === out1)
    // parts naming a stratum with no rows are rejected loudly
    intercept[IllegalArgumentException] {
      graft.pipeline.Sampling.mixToParts(df(2), col("k"), col("s"), Map("a" -> 1L, "nope" -> 1L))
    }
  }
}
