package graft.functions

import graft.core.Kll
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O66: `kll_histogram` — equi-height buckets off one mergeable KLL.
  * Pinned: monotone non-overlapping boundaries, rank-bounded bucket
  * masses on a known distribution, tie concentration (a heavy atom
  * shows up as bucket mass, not smoothed away), merge invariance of
  * the B-bucket frame, and the empty-sketch edge.
  */
class KllHistogramSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Graft.ensure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate())

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  private def hist(bytes: Array[Byte], b: Int) =
    spark.range(1)
      .select(explode(expr(s"kll_histogram(X'${hex(bytes)}', $b)")).as("h"))
      .select("h.bucket", "h.lo", "h.hi", "h.rows_est")
      .collect().sortBy(_.getInt(0))

  test("uniform data: monotone boundaries, each bucket within rank bound of n/B") {
    import spark.implicits._
    val n = 50000
    val bytes = spark.range(n).map(_.toDouble).toDF("v")
      .select(expr("kll_agg(v)")).head.getAs[Array[Byte]](0)
    val k = Kll.fromBytes(bytes)
    val b = 10
    val rows = hist(bytes, b)
    assert(rows.length == b)
    assert(rows.head.getInt(0) == 0 && rows.last.getInt(0) == b - 1)
    rows.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0).getDouble(2) <= w(1).getDouble(1) + 1e-9)
    }
    val bound = 2 * k.normalizedRankError * n + 1
    rows.foreach(r => assert(math.abs(r.getLong(3) - n.toDouble / b) <= bound,
      s"bucket ${r.getInt(0)}: ${r.getLong(3)} vs ${n / b} (+-$bound)"))
    // uniform 0..n: boundaries should be near i*n/B within rank error
    rows.foreach(r => assert(
      math.abs(r.getDouble(1) - r.getInt(0) * n.toDouble / b) <= bound))
  }

  test("heavy atom: mass lands in the first bucket ending at the tie; masses telescope") {
    import spark.implicits._
    // 80% of mass at the single value 42
    val vs = Seq.fill(8000)(42.0) ++ (0 until 2000).map(_.toDouble / 2000 * 10)
    val bytes = vs.toDF("v").select(expr("kll_agg(v)")).head.getAs[Array[Byte]](0)
    val rows = hist(bytes, 4)
    // duplicate boundaries collapse: rank is <=-based, so the FIRST
    // bucket whose hi is 42 carries the atom's mass and the later
    // [42,42] buckets are empty — pinned, not smoothed into n/B each
    val first42 = rows.find(_.getDouble(2) == 42.0).get
    assert(first42.getLong(3) >= (0.8 * vs.size).toLong)
    rows.filter(r => r.getInt(0) > first42.getInt(0) && r.getDouble(1) == 42.0 &&
        r.getDouble(2) == 42.0)
      .foreach(r => assert(r.getLong(3) == 0L, s"duplicate-boundary bucket not empty: $r"))
    // telescoping conservation (up to per-bucket rounding)
    assert(math.abs(rows.map(_.getLong(3)).sum - vs.size) <= rows.length / 2 + 1)
  }

  test("merge invariance: histogram of merged halves equals one-pass histogram") {
    import spark.implicits._
    val df = spark.range(30000).map(i => (i % 2, math.sqrt(i.toDouble)))
      .toDF("half", "v")
    val one = df.select(expr("kll_agg(v)")).head.getAs[Array[Byte]](0)
    val merged = df.groupBy("half").agg(expr("kll_agg(v)").as("sk"))
      .agg(expr("kll_merge_agg(sk)")).head.getAs[Array[Byte]](0)
    // KLL compaction here is deterministic but ORDER-dependent, so the
    // two sketches need not be byte-equal; the histogram frames must
    // agree within the rank bound of each
    val h1 = hist(one, 6)
    val h2 = hist(merged, 6)
    val n = 30000
    val bound = 2 * (Kll.fromBytes(one).normalizedRankError +
      Kll.fromBytes(merged).normalizedRankError) * n + 1
    h1.zip(h2).foreach { case (a, b) =>
      assert(math.abs(a.getLong(3) - b.getLong(3)) <= bound)
    }
  }

  test("empty sketch yields an empty histogram; bucket-count guard trips") {
    import spark.implicits._
    val bytes = Seq.empty[Double].toDF("v")
      .select(expr("kll_agg(v)")).head.getAs[Array[Byte]](0)
    assert(hist(bytes, 5).isEmpty)
    val err = intercept[Exception] {
      spark.range(1).select(expr(s"kll_histogram(X'${hex(bytes)}', 0)")).collect()
    }
    assert(err.getMessage != null)
  }
}
