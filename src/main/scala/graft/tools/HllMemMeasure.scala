package graft.tools

import graft.core.Hll

/** Heap cost of partial-aggregation HLL state at high group
  * cardinality: N sketches of avg-NDV keys each, sparse-start (organic)
  * vs forced-dense — the ObjectHashAggregate's in-memory picture for a
  * Zipf host tail. Run: `runMain graft.tools.HllMemMeasure [nSketches]
  * [avgKeys] [p]`. */
object HllMemMeasure {

  private def used(): Long = {
    val rt = Runtime.getRuntime
    System.gc(); System.gc()
    Thread.sleep(200)
    rt.totalMemory() - rt.freeMemory()
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val avgKeys = args.lift(1).map(_.toInt).getOrElse(26)
    val p = args.lift(2).map(_.toInt).getOrElse(12)
    def build(dense: Boolean): Array[Hll] = {
      val out = new Array[Hll](n)
      var i = 0
      while (i < n) {
        val h = Hll.empty(p)
        if (dense) h.forceDense()
        // deterministic per-sketch key count in [1, 2*avgKeys)
        val k = 1 + (i * 2654435761L % (2 * avgKeys - 1)).toInt.abs
        var j = 0
        while (j < k) { h.add(i.toLong << 32 | j); j += 1 }
        out(i) = h
        i += 1
      }
      out
    }
    for (dense <- Seq(true, false)) {
      val before = used()
      val arr = build(dense)
      val after = used()
      val sparseCount = arr.count(_.isSparse)
      println(f"[hllmem] mode=${if (dense) "dense" else "adaptive"} n=$n avgKeys=$avgKeys p=$p " +
        f"heap=${(after - before) / 1e6}%.1fMB perSketch=${(after - before).toDouble / n}%.0fB " +
        f"sparse=$sparseCount")
      // keep arr alive until after measurement
      if (arr.length > 0 && arr(0) == null) println("unreachable")
    }
  }
}
