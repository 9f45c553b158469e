package graft.tools

import graft.core.{Kll, TDigest}

/** Flakiness probe for the MergeLawsSpec KLL/t-digest bound property:
  * replays the property body over fixed seeds to measure how close the
  * probabilistic rank-error bounds sit to their thresholds (the spec's
  * scalacheck form hit a failing seed whose 2000-element shrink ran for
  * 20+ minutes — see the forAllNoShrink note in MergeLawsSpec). */
object KllTdProbe {
  def main(args: Array[String]): Unit = {
    var worstK = 0.0
    var worstT = 0.0
    var fails = 0
    val trials = args.headOption.map(_.toInt).getOrElse(500)
    for (seed <- 1 to trials) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(1951)
      val vs = List.fill(n)(rnd.nextDouble() * 2e6 - 1e6)
      val assign = List.fill(n)(rnd.nextInt(3))
      val kp = Array.fill(3)(Kll.empty(200))
      val tp = Array.fill(3)(TDigest.empty(100))
      vs.zip(assign).foreach { case (v, p) => kp(p).add(v); tp(p).add(v) }
      val km = kp(0).merge(kp(1).merge(kp(2)))
      val tm = tp(2).merge(tp(0)).merge(tp(1))
      val sorted = vs.sorted
      def rankDist(x: Double, q: Double): Double = {
        val lo = sorted.count(_ < x).toDouble / n
        val hi = sorted.count(_ <= x).toDouble / n
        if (q < lo) lo - q else if (q > hi) q - hi else 0.0
      }
      var bad = false
      Seq(0.25, 0.5, 0.75).foreach { q =>
        val dk = rankDist(km.quantile(q), q)
        val dt = rankDist(tm.quantile(q), q)
        if (dk > worstK) worstK = dk
        if (dt > worstT) worstT = dt
        if (dk > 3 * km.normalizedRankError || dt > 0.06) bad = true
      }
      if (km.quantile(0.0) != sorted.head || tm.quantile(1.0) != sorted.last) bad = true
      if (bad) { fails += 1; println(s"FAIL seed=$seed n=$n") }
    }
    println(f"trials=$trials fails=$fails worstKllRankDist=$worstK%.5f " +
      f"(bound ${3 * Kll.empty(200).normalizedRankError}%.5f) " +
      f"worstTdRankDist=$worstT%.5f (bound 0.06)")
  }
}
