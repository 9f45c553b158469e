package graft

import graft.pipeline.SaltedJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O54 — salted equi-join must be row-identical (as a multiset) to the
  * plain join for every supported join type, regardless of which keys
  * are classified hot, how many salts are used, or how the inputs are
  * partitioned — salting only changes row routing.
  */
class SaltedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Zipf-ish fact: key 0 holds half the rows; dim covers keys 0..9,
    * fact also has keys 10..11 with no dim match; dim keys 8..9 have
    * no fact rows; key 5 is many-to-many (two dim rows). */
  private def fact: DataFrame = {
    import spark.implicits._
    ((0 until 300).map(i => (0L, i.toLong)) ++
      (0 until 100).map(i => ((i % 8).toLong, 1000L + i)) ++
      Seq((10L, 9990L), (11L, 9991L), (5L, 9992L)))
      .toDF("k", "fid").repartition(5)
  }
  private def dim: DataFrame = {
    import spark.implicits._
    ((0L until 10L).map(k => (k, s"d$k")) ++ Seq((5L, "d5b")))
      .toDF("k", "payload").repartition(3)
  }
  private def hotOf(ks: Long*): DataFrame = {
    import spark.implicits._
    ks.toDF("k")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  private val types = Seq("inner", "left", "left_semi", "left_anti")

  test("row-identical to the plain join for every type, hot head classified") {
    for (t <- types) {
      val plain = fact.join(dim, Seq("k"), t)
      val salted = SaltedJoin.joinSkewedWithHot(fact, dim, Seq("k"), col("fid"), 7,
        hotOf(0L, 5L), t)
      assert(sortedRows(salted) == sortedRows(plain), s"joinType=$t")
      assert(salted.columns.toSeq == plain.columns.toSeq, s"joinType=$t columns")
    }
  }

  test("hot-set extremes: empty, all keys, and keys absent from both sides") {
    for (hot <- Seq(hotOf(), hotOf(0L to 11L: _*), hotOf(77L, 78L))) {
      val plain = fact.join(dim, Seq("k"), "inner")
      val salted = SaltedJoin.joinSkewedWithHot(fact, dim, Seq("k"), col("fid"), 4, hot)
      assert(sortedRows(salted) == sortedRows(plain))
    }
  }

  test("numSalts = 1 and partitioning invariance") {
    val plain = sortedRows(fact.join(dim, Seq("k"), "left"))
    assert(sortedRows(SaltedJoin.joinSkewedWithHot(
      fact, dim, Seq("k"), col("fid"), 1, hotOf(0L), "left")) == plain)
    assert(sortedRows(SaltedJoin.joinSkewedWithHot(
      fact.repartition(1), dim.repartition(7), Seq("k"), col("fid"), 5,
      hotOf(0L, 3L), "left")) == plain)
  }

  test("sampled detection path is row-identical and deterministic") {
    val plain = sortedRows(fact.join(dim, Seq("k"), "inner"))
    // threshold low enough that the sampled estimate flags the head key
    val a = SaltedJoin.joinSkewed(fact, dim, Seq("k"), col("fid"), 6, "inner",
      hotRowThreshold = 100L, sampleFraction = 0.5)
    val b = SaltedJoin.joinSkewed(fact, dim, Seq("k"), col("fid"), 6, "inner",
      hotRowThreshold = 100L, sampleFraction = 0.5)
    assert(sortedRows(a) == plain)
    assert(sortedRows(a) == sortedRows(b))
  }

  test("null join keys behave exactly like the plain join") {
    import spark.implicits._
    val f = Seq((java.lang.Long.valueOf(0L), 1L), (null.asInstanceOf[java.lang.Long], 2L))
      .toDF("k", "fid")
    val d = Seq((java.lang.Long.valueOf(0L), "x"), (null.asInstanceOf[java.lang.Long], "y"))
      .toDF("k", "payload")
    for (t <- types) {
      val plain = f.join(d, Seq("k"), t)
      val salted = SaltedJoin.joinSkewedWithHot(f, d, Seq("k"), col("fid"), 3, hotOf(0L), t)
      assert(sortedRows(salted) == sortedRows(plain), s"joinType=$t")
    }
  }

  test("right/full outer joins are refused") {
    for (t <- Seq("right", "full", "full_outer"))
      assertThrows[IllegalArgumentException] {
        SaltedJoin.joinSkewedWithHot(fact, dim, Seq("k"), col("fid"), 3, hotOf(0L), t)
      }
  }

  test("hot key's fact rows spread across salts (the skew actually splits)") {
    // peek at the salted fact side via the same construction the join uses
    val hot = broadcast(hotOf(0L).withColumn("__hot", lit(true)))
    val salts = fact.join(hot, Seq("k"), "left")
      .withColumn("__salt",
        when(col("__hot").isNotNull, pmod(xxhash64(col("fid")), lit(7)).cast("int"))
          .otherwise(lit(0)))
      .filter(col("k") === 0L)
      .select(countDistinct(col("__salt"))).head.getLong(0)
    assert(salts == 7L, s"expected the 300-row head key to hit all 7 salts, got $salts")
  }
}
