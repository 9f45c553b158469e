package graft

import graft.data.WebPagesGen
import graft.functions.Graft
import graft.pipeline.{Flagship, SaltedAgg, ShardedProbe}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native TypedImperativeAggregate forms must produce BYTE-IDENTICAL
  * results to the udaf (ScalaAggregator) forms they replace in the
  * flagship — same inserts, same merge trees, only the row-access path
  * differs. Checked end-to-end through real aggregations, plus the
  * batched CMS kernel across batch sizes. */
class NativeSketchAggsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Graft.ensure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())

  private lazy val wp: DataFrame = {
    val path = WebPagesGen.ensureTable(spark, "/root/repo/data/webpages/spec_native",
      4000L, 300)
    spark.read.parquet(path)
  }

  test("sharded EBF build: native agg byte-identical to udaf agg") {
    val a = ShardedProbe.buildShardTable(wp, col("url"), 8, nativeAgg = true)
      .orderBy("shard").collect()
    val b = ShardedProbe.buildShardTable(wp, col("url"), 8, nativeAgg = false)
      .orderBy("shard").collect()
    assert(a.length === 8 && b.length === 8)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getInt(0) === y.getInt(0))
      assert(java.util.Arrays.equals(x.getAs[Array[Byte]](1), y.getAs[Array[Byte]](1)),
        s"shard ${x.getInt(0)} differs")
    }
  }

  private def hostAgg(native: Boolean): Array[org.apache.spark.sql.Row] = {
    val withHost = wp.select(col("lang"),
      graft.plans.Hash128Expr.h1(col("url"), Graft.SketchSeed).as("__h1"),
      graft.plans.Hash128Expr.h2(col("url"), Graft.SketchSeed).as("__h2"),
      length(col("text")).cast("double").as("text_len"),
      substring_index(substring_index(col("url"), "/", 3), "/", -1).as("host"))
    SaltedAgg.adaptiveSketchAgg(withHost, Seq("lang", "host"), col("__h1"), 8,
      if (native) Flagship.perHostNativeSpecs else Flagship.perHostHashSpecs,
      hotRowThreshold = 200L)
      .select(col("lang"), col("host"), col("sk.ebf"), col("sk.hll"),
        col("sk.kll"), col("sk.td"))
      .orderBy("lang", "host").collect()
  }

  test("per-host fused sketches: native agg byte-identical through salted two-stage") {
    val a = hostAgg(native = true)
    val b = hostAgg(native = false)
    assert(a.length === b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      (2 to 5).foreach { i =>
        assert(java.util.Arrays.equals(x.getAs[Array[Byte]](i), y.getAs[Array[Byte]](i)),
          s"field $i differs for (${x.getString(0)}, ${x.getString(1)})")
      }
    }
  }

  private def tokenAgg(native: Boolean, batch: Int): Array[(String, Array[Byte], Array[Byte])] = {
    val c =
      if (native)
        graft.plans.CmsTopkTokensNativeAgg.column(col("text"), 5, 1024, 64,
          Graft.SketchSeed, batch)
      else {
        val u = udaf(new graft.functions.SketchAggregators.CmsTopkTokensAgg(
          5, 1024, 64, Graft.SketchSeed))
        u(col("text"))
      }
    wp.groupBy("lang").agg(c.as("tok"))
      .select(col("lang"), col("tok.cms"), col("tok.topk"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2)))
  }

  test("token CMS+MG: native and batched kernels byte-identical to udaf") {
    val ref = tokenAgg(native = false, 0)
    for (batch <- Seq(0, 64, 512)) {
      val got = tokenAgg(native = true, batch)
      assert(got.length === ref.length && ref.nonEmpty)
      got.zip(ref).foreach { case ((lg, cms, topk), (lr, cmsR, topkR)) =>
        assert(lg === lr)
        assert(java.util.Arrays.equals(cms, cmsR), s"cms differs lang=$lg batch=$batch")
        assert(java.util.Arrays.equals(topk, topkR), s"topk differs lang=$lg batch=$batch")
      }
    }
  }

  test("fused phase-1+2 (observe side channel) matches the grouped builds") {
    // the side-channel token sketches must match the groupBy-built
    // ones: CMS byte-identically (commutative adds), MG at the
    // heavy-hitter level (merge-order guarantee); host groups equal
    val (hostGroups, langGroups, tops, _, _) = Flagship.phase12Fused(wp, 8)
    assert(hostGroups === Flagship.phase1(wp, 8))
    val grouped = wp.groupBy("lang")
      .agg(graft.plans.CmsTopkTokensNativeAgg.column(col("text"), 5, 16384, 256,
        Graft.SketchSeed, 512).as("tok"))
      .select(col("lang"), col("tok.cms"), col("tok.topk"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2))).toMap
    assert(langGroups === grouped.size.toLong)
    // re-run the fused side channel to get its cms bytes directly
    val obs = org.apache.spark.sql.Observation()
    wp.observe(obs, graft.plans.PerLangTokenSketchesAgg.column(
        col("lang"), col("text"), 5, 16384, 256, Graft.SketchSeed, 512).as("tok"))
      .write.format("noop").mode("overwrite").save()
    val fusedMap = obs.get("tok")
      .asInstanceOf[scala.collection.Map[String, org.apache.spark.sql.Row]]
    assert(fusedMap.keySet === grouped.keySet)
    fusedMap.foreach { case (lang, r) =>
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("cms"), grouped(lang)._1),
        s"cms differs for $lang")
      val fusedTop = graft.core.FreqSketch.fromBytes(r.getAs[Array[Byte]]("topk"))
        .topK(10).map(_._1).toSet
      val groupedTop = graft.core.FreqSketch.fromBytes(grouped(lang)._2)
        .topK(10).map(_._1).toSet
      assert(fusedTop === groupedTop, s"heavy hitters differ for $lang")
    }
    assert(tops.keySet === grouped.keySet)
  }

  test("batched buffer flushes pending tokens on serialize") {
    val agg = graft.plans.CmsTopkTokensNativeAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("a b c"),
      3, 64, 8, 42L, batchTokens = 1000)
    val buf = agg.createAggregationBuffer()
    agg.update(buf, org.apache.spark.sql.catalyst.InternalRow.empty)
    assert(buf.pending === 3) // still unflushed (batch 1000)
    val bytes = agg.serialize(buf)
    val back = agg.deserialize(bytes)
    assert(back.buf.cms.total === 3L)
    assert(back.buf.cms.estimate("b") === 1L)
  }
}
