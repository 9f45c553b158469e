package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** O46 — KMV/theta sketch: exactness below capacity, error bounds in
  * estimating mode, EXACT byte-identical merge under arbitrary merge
  * trees (the engine-wide mergeability contract), and the set-algebra
  * estimators HLL cannot provide. All fixed-seed deterministic. */
class ThetaSpec extends AnyFunSuite {

  private def keys(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$tag-$i")

  private def sketch(ks: Seq[String], k: Int = 256): Theta = {
    val t = Theta.empty(k)
    ks.foreach(t.add)
    t
  }

  test("exact below capacity, including duplicates") {
    val t = Theta.empty(256)
    keys("a", 200).foreach(t.add)
    keys("a", 200).foreach(t.add) // duplicates change nothing
    assert(t.estimate === 200.0)
    assert(t.retained === 200)
  }

  test("estimating mode stays within 5 RSE over a range of cardinalities") {
    for (n <- Seq(1000, 10000, 100000)) {
      val t = sketch(keys(s"n$n", n))
      val rel = math.abs(t.estimate / n - 1.0)
      assert(rel <= 5 * t.rse, s"n=$n est=${t.estimate} rel=$rel rse=${t.rse}")
    }
  }

  test("merge is byte-identical under arbitrary merge trees") {
    val all = keys("m", 5000)
    val whole = sketch(all).toBytes
    val rnd = new scala.util.Random(0x7e7a)
    for (_ <- 1 to 10) {
      // random partition of the keys into 5 parts, random merge order
      val parts = Array.fill(5)(Vector.newBuilder[String])
      all.foreach(k => parts(rnd.nextInt(5)) += k)
      val pool = scala.collection.mutable.ArrayBuffer(
        parts.toIndexedSeq.map(b => sketch(b.result())): _*)
      while (pool.size > 1) {
        val i = rnd.nextInt(pool.size)
        val a = pool.remove(i)
        val j = rnd.nextInt(pool.size)
        val b = pool.remove(j)
        pool += a.merge(b)
      }
      assert(java.util.Arrays.equals(pool.head.toBytes, whole))
    }
  }

  test("merge with an empty sketch is identity; below-capacity merge exact") {
    val a = sketch(keys("x", 100))
    val bytes = a.toBytes
    assert(java.util.Arrays.equals(a.merge(Theta.empty(256)).toBytes, bytes))
    val u = sketch(keys("x", 100)).merge(sketch(keys("y", 50)))
    assert(u.estimate === 150.0)
  }

  test("intersection and difference are exact below capacity") {
    val a = sketch(keys("s", 120) ++ keys("both", 30))
    val b = sketch(keys("t", 80) ++ keys("both", 30))
    assert(a.intersectEstimate(b) === 30.0)
    assert(a.differenceEstimate(b) === 120.0)
    assert(b.differenceEstimate(a) === 80.0)
    assert(math.abs(a.jaccardEstimate(b) - 30.0 / 230.0) < 1e-9)
  }

  test("intersection error is bounded in estimating mode") {
    // |A| = |B| = 20000, overlap 10000, k = 1024
    val shared = keys("ov", 10000)
    val a = sketch(shared ++ keys("onlyA", 10000), k = 1024)
    val b = sketch(shared ++ keys("onlyB", 10000), k = 1024)
    val est = a.intersectEstimate(b)
    // intersection RSE is amplified by union/intersection ratio (~2x
    // here); 5x the amplified RSE is a deterministic-safe bar
    val bound = 5 * (1.0 / math.sqrt(1022.0)) * 2 * 10000
    assert(math.abs(est - 10000) <= bound, s"est=$est")
  }

  test("wire round-trip is byte-identical and SketchSerde dispatches") {
    val t = sketch(keys("w", 3000))
    val b = t.toBytes
    val rt = Theta.fromBytes(b)
    assert(java.util.Arrays.equals(rt.toBytes, b))
    assert(rt.estimate === t.estimate)
    assert(SketchSerde.fromBytes(b).isInstanceOf[Theta])
  }

  test("estimating-mode estimate is invariant to add order") {
    val ks = keys("ord", 9000)
    val fwd = sketch(ks)
    val rev = sketch(ks.reverse)
    assert(java.util.Arrays.equals(fwd.toBytes, rev.toBytes))
  }

  test("mismatched-k merge resolves to the coarser sketch") {
    val fine = sketch(keys("f", 5000), k = 1024)
    val coarse = sketch(keys("c", 5000), k = 256)
    val m = fine.merge(coarse)
    assert(m.retained <= 256)
    val rel = math.abs(m.estimate / 10000 - 1.0)
    assert(rel <= 5 / math.sqrt(254.0), s"est=${m.estimate}")
  }
}
