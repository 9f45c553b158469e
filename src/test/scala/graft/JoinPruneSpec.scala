package graft

import graft.pipeline.JoinPrune
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O31: EBF semi-join reduction. The exactness claim — pruned join ==
  * plain join — must hold when most fact rows have NO match (the case
  * pruning exists for), and the pruned fact side must actually shrink
  * (membership filtering happened, FPR-bounded) while never dropping a
  * matching row (no false negatives).
  */
class JoinPruneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("pruned join result is exactly the plain join; fact side shrinks") {
    import spark.implicits._
    // 50k fact rows over 10k keys; build side holds 300 keys -> ~97% of
    // fact rows are matchless and should be pruned before the exchange
    val fact = spark.range(50000)
      .select((col("id") % 10000).as("fk"), (col("id") * 7).as("payload"))
    val build = spark.range(300).select((col("id") * 33 % 10000).as("bk"))
      .distinct()
    val plain = fact.join(build, fact("fk") === build("bk"))
      .select("fk", "payload").as[(Long, Long)].collect().sorted.toSeq

    val filter = JoinPrune.buildFilter(build, build("bk"))
    val prunedFact = JoinPrune.prunedFact(fact, fact("fk"), filter)
    val prunedCount = prunedFact.count()
    val matchCount = plain.size.toLong
    assert(prunedCount >= matchCount, "no matching row may be pruned (no false negatives)")
    // with ~9700 matchless keys, surviving extras are FPR-bounded; even
    // a lax bound proves real pruning happened before the join
    assert(prunedCount < 50000 / 2,
      s"pruning removed too little: $prunedCount of 50000 survived")

    val pruned = JoinPrune.ebfPrunedJoin(fact, "fk", build, "bk")
      .select("fk", "payload").as[(Long, Long)].collect().sorted.toSeq
    assert(pruned === plain)
  }

  test("null fact keys prune as misses (no NPE), matching the inner join") {
    import spark.implicits._
    val fact = spark.range(2000)
      .select(when(col("id") % 7 === 0, lit(null)).otherwise(col("id") % 97).as("fk"))
    val build = spark.range(40).select((col("id") * 3 % 97).as("bk")).distinct()
    val plain = fact.join(build, fact("fk") === build("bk"))
      .select("fk").as[Long].collect().sorted.toSeq
    val pruned = JoinPrune.ebfPrunedJoin(fact, "fk", build, "bk")
      .select("fk").as[Long].collect().sorted.toSeq
    assert(pruned === plain)
  }

  test("mismatched key types are refused rather than silently losing rows") {
    val fact = spark.range(100).select(col("id").cast("double").as("fk"))
    val build = spark.range(10).select(col("id").as("bk"))
    intercept[IllegalArgumentException] {
      JoinPrune.ebfPrunedJoin(fact, "fk", build, "bk")
    }
  }

  test("left_semi pruned join matches; fact-preserving types are rejected") {
    import spark.implicits._
    val fact = spark.range(5000).select((col("id") % 997).as("fk"))
    val build = spark.range(100).select((col("id") * 13 % 997).as("bk")).distinct()
    val plain = fact.join(build, fact("fk") === build("bk"), "left_semi")
      .as[Long].collect().sorted.toSeq
    val pruned = JoinPrune.ebfPrunedJoin(fact, "fk", build, "bk", "left_semi")
      .as[Long].collect().sorted.toSeq
    assert(pruned === plain)
    intercept[IllegalArgumentException] {
      JoinPrune.ebfPrunedJoin(fact, "fk", build, "bk", "left_outer")
    }
  }
}
