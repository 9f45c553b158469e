package graft.tools

import graft.core.Cms
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PLAN19 evidence tool — two measurements for the sparse in-memory
  * CMS mode (the O38 twin):
  *
  * 1. Driver-side heap per partial-agg buffer at high group
  *    cardinality: N sketches of a few keys each (the Zipf tail of a
  *    cms-per-group aggregation), adaptive (sparse-start) vs
  *    forced-dense. The dense leg runs at a smaller N (a dense 7x4096
  *    table is 229 KB — 200K of them is 45 GB) and reports per-sketch
  *    bytes for comparison.
  *
  * 2. The ObjectHashAggregate picture: groupBy(1M groups in ONE reduce
  *    task) . agg(cms_agg(...)), at the default
  *    `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  *    (128 — the hash map abandons to sort-based almost immediately)
  *    vs a raised threshold that keeps all 10^6 buffers in the hash
  *    map at once — VIABLE only because the tail buffers are sparse
  *    (10^6 dense tables would be 229 GB).
  *
  * Run: `SPARK_DRIVER_MEM=12g sbt "runMain graft.tools.CmsMemMeasure"`.
  */
object CmsMemMeasure {

  private def used(): Long = {
    val rt = Runtime.getRuntime
    System.gc(); System.gc()
    Thread.sleep(200)
    rt.totalMemory() - rt.freeMemory()
  }

  def main(args: Array[String]): Unit = {
    val nAdaptive = args.headOption.map(_.toInt).getOrElse(200000)
    val nDense = args.lift(1).map(_.toInt).getOrElse(5000)
    val avgKeys = args.lift(2).map(_.toInt).getOrElse(6)

    def build(n: Int, dense: Boolean): Array[Cms] = {
      val out = new Array[Cms](n)
      var i = 0
      while (i < n) {
        val c = Cms.empty()
        if (dense) c.forceDense()
        val k = 1 + (i * 2654435761L % (2 * avgKeys - 1)).toInt.abs
        var j = 0
        while (j < k) { c.add(i.toLong << 32 | j, 1L); j += 1 }
        out(i) = c
        i += 1
      }
      out
    }
    for ((dense, n) <- Seq((true, nDense), (false, nAdaptive))) {
      val before = used()
      val arr = build(n, dense)
      val after = used()
      val sparseCount = arr.count(_.isSparse)
      println(f"[cmsmem] mode=${if (dense) "dense" else "adaptive"} n=$n avgKeys=$avgKeys " +
        f"heap=${(after - before) / 1e6}%.1fMB perSketch=${(after - before).toDouble / n}%.0fB " +
        f"sparse=$sparseCount")
      if (arr.length > 0 && arr(0) == null) println("unreachable")
    }

    // --- ObjectHashAggregate phase: 1M groups in ONE reduce task ---
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cms-fallback-probe")
      .config("spark.sql.shuffle.partitions", "1") // all groups -> one task
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Graft.ensure(spark)
    try {
      val groups = 1000000L
      val rows = 6000000L
      for (threshold <- Seq("128", "2000000")) {
        spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", threshold)
        val t0 = System.nanoTime()
        val forced = spark.range(rows)
          .select((col("id") % groups).as("g"), col("id").cast("string").as("k"))
          .groupBy("g").agg(expr("cms_agg(k)").as("sk"))
          .agg(sum(length(col("sk"))).as("bytes"), count(lit(1)).as("n"))
          .head
        println(f"[cmsmem] fallbackThreshold=$threshold%-8s groups=${forced.getLong(1)} " +
          f"sketchBytes=${forced.getLong(0) / 1e6}%.1fMB " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
      }
    } finally spark.stop()
  }
}
