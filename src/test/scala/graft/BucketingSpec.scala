package graft

import graft.pipeline.Bucketing
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O81: bucketed co-located (SMB) joins. The load-bearing claims:
  * (1) joining two tables bucketed on the join key with equal bucket
  * counts produces ZERO shuffle exchanges and the exact plain-join
  * result; (2) with one side bucketed exactly ONE exchange remains
  * (the unbucketed side conforms to the bucketed side's
  * distribution); (3) an equality filter on the bucket key prunes the
  * scan to a single bucket. Claims are asserted on the executed plan,
  * not the optimizer's intent.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_bkt_$tag").toString

  private def facts = {
    import spark.implicits._
    (1 to 5000).map(i => (i % 701L, i.toLong, (i % 97) * 1.5)).toDF("k", "id", "v")
  }
  private def dims = {
    import spark.implicits._
    (0L until 701L).map(k => (k, s"seg_${k % 5}")).toDF("k", "seg")
  }

  test("both sides bucketed: zero exchanges, exact plain-join result") {
    Bucketing.writeBucketed(facts, "graft_bkt_f", freshDir("f"), Seq("k"), 8)
    Bucketing.writeBucketed(dims, "graft_bkt_d", freshDir("d"), Seq("k"), 8)
    Bucketing.withSortMergeOnly(spark) {
      val f = spark.table("graft_bkt_f")
      val d = spark.table("graft_bkt_d")
      val j = f.join(d, f("k") === d("k")).select(f("k"), col("id"), col("v"), col("seg"))
      val got = j.collect()
      assert(Bucketing.countShuffles(j) === 0, j.queryExecution.executedPlan.toString)
      // plain (unbucketed) join over the same rows is the ground truth
      val plain = facts.as("f").join(dims.as("d"), col("f.k") === col("d.k"))
        .select(col("f.k"), col("id"), col("v"), col("seg")).collect()
      def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))
      assert(got.map(key).sortBy(_.toString).toSeq === plain.map(key).sortBy(_.toString).toSeq)
    }
  }

  test("one side bucketed: exactly one exchange (the unbucketed side)") {
    Bucketing.writeBucketed(facts, "graft_bkt_f1", freshDir("f1"), Seq("k"), 8)
    Bucketing.withSortMergeOnly(spark) {
      val f = spark.table("graft_bkt_f1")
      val d = dims
      val j = f.join(d, f("k") === d("k")).select(f("k"), col("id"), col("seg"))
      j.collect()
      assert(Bucketing.countShuffles(j) === 1, j.queryExecution.executedPlan.toString)
    }
  }

  test("plain join of the same inputs shuffles both sides (the baseline O81 removes)") {
    Bucketing.withSortMergeOnly(spark) {
      val j = facts.as("f").join(dims.as("d"), col("f.k") === col("d.k"))
        .select(col("f.k"), col("id"), col("seg"))
      j.collect()
      assert(Bucketing.countShuffles(j) === 2, j.queryExecution.executedPlan.toString)
    }
  }

  test("equality filter on the bucket key prunes to one bucket") {
    Bucketing.writeBucketed(facts, "graft_bkt_fp", freshDir("fp"), Seq("k"), 8)
    // a bare filter has no operator that NEEDS the bucket distribution,
    // so DisableUnnecessaryBucketedScan would turn the bucketed scan
    // (and with it bucket pruning) off — pin it on for the pruning path
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = spark.table("graft_bkt_fp").filter(col("k") === 42L)
      val planStr = q.queryExecution.executedPlan.toString
      assert(planStr.contains("SelectedBucketsCount: 1 out of 8"), planStr)
      // and the pruned scan still returns every matching row
      assert(q.count() === facts.filter(col("k") === 42L).count())
    } finally spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
  }

  test("sketch builds on a bucketed table elide the exchange, bytes unchanged") {
    // the 10^12-row composition: per-key sketch builds grouped by the
    // bucket key read the layout's distribution straight off the scan —
    // a billion per-host HLLs with ZERO shuffled bytes
    graft.functions.Graft.ensure(spark)
    import spark.implicits._
    val docs = (1 to 4000)
      .map(i => (s"host_${i % 37}", s"https://host_${i % 37}/p$i"))
      .toDF("host", "url")
    Bucketing.writeBucketed(docs, "graft_bkt_docs", freshDir("docs"), Seq("host"), 8)
    val g = spark.table("graft_bkt_docs").groupBy("host")
      .agg(expr("hll_agg(url)").as("hll"))
    val got = g.collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1).toSeq)).sortBy(_._1)
    assert(Bucketing.countShuffles(g) === 0, g.queryExecution.executedPlan.toString)
    val plain = docs.groupBy("host").agg(expr("hll_agg(url)").as("hll"))
      .collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1).toSeq)).sortBy(_._1)
    assert(got.toSeq === plain.toSeq)
  }

  test("bucketed groupBy on the bucket key also elides its exchange") {
    Bucketing.writeBucketed(facts, "graft_bkt_fg", freshDir("fg"), Seq("k"), 8)
    val g = spark.table("graft_bkt_fg").groupBy("k").agg(sum("v").as("sv"))
    g.collect()
    assert(Bucketing.countShuffles(g) === 0, g.queryExecution.executedPlan.toString)
    val plain = facts.groupBy("k").agg(sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val got = g.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(got === plain)
  }
}
