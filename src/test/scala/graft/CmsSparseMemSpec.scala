package graft

import graft.core.{Cms, Hash128}
import org.scalatest.funsuite.AnyFunSuite

/** The sparse in-memory CMS mode (round 5, the O38 sparse-HLL twin)
  * must be observationally identical to the dense mode: same
  * estimates, same wire bytes, same merges — for any insertion volume
  * (below, at, and past the promotion threshold depth*width/8) and any
  * mix of sparse/dense operands. The dense path is the round-4
  * implementation unchanged; these properties pin the sparse path to
  * it. */
class CmsSparseMemSpec extends AnyFunSuite {

  private def keys(seed: Int, n: Int): Seq[String] =
    (0 until n).map(i => s"key-$seed-$i")

  private def organic(d: Int, w: Int, ks: Seq[(String, Long)]): Cms = {
    val c = Cms.empty(d, w)
    ks.foreach { case (k, cnt) => c.add(k, cnt) }
    c
  }

  private def dense(d: Int, w: Int, ks: Seq[(String, Long)]): Cms = {
    val c = Cms.empty(d, w)
    c.forceDense()
    ks.foreach { case (k, cnt) => c.add(k, cnt) }
    c
  }

  private def weighted(seed: Int, n: Int): Seq[(String, Long)] =
    keys(seed, n).zipWithIndex.map { case (k, i) => (k, (i % 7 + 1).toLong) }

  // volumes straddling promoteAt = d*w/8 (in CELLS; each key occupies
  // <= d cells, so n keys ~ d*n cells before collisions)
  private val cases = for {
    (d, w) <- Seq((2, 8), (4, 64), (7, 4096))
    n <- Seq(0, 1, 3, w / 8, w / 4, w, 4 * w)
  } yield (d, w, n)

  test("organic (sparse-start) and forced-dense builds agree on bytes + estimates") {
    for (((d, w, n), i) <- cases.zipWithIndex) {
      val ks = weighted(i, n)
      val a = organic(d, w, ks)
      val b = dense(d, w, ks)
      assert(java.util.Arrays.equals(a.toBytes, b.toBytes),
        s"wire mismatch at d=$d w=$w n=$n (sparse=${a.isSparse})")
      ks.foreach { case (k, _) =>
        assert(a.estimate(k) === b.estimate(k), s"estimate mismatch for $k")
      }
      assert(a.total === b.total)
    }
  }

  test("small sketches stay sparse; token-scale sketches promote") {
    val small = organic(7, 4096, weighted(1, 16))
    assert(small.isSparse, "16-key categorical sketch should stay sparse")
    val big = Cms.empty(7, 4096)
    keys(2, 8000).foreach(k => big.add(k))
    assert(!big.isSparse, "8000-key sketch should have promoted")
  }

  test("merge is byte-identical across every mode pairing") {
    val d = 4
    val w = 256
    val ksA = weighted(10, 12)   // stays sparse
    val ksB = weighted(11, 3000) // promotes
    def build(ks: Seq[(String, Long)], forced: Boolean) =
      if (forced) dense(d, w, ks) else organic(d, w, ks)
    val expect = {
      val c = Cms.empty(d, w)
      (ksA ++ ksB).foreach { case (k, cnt) => c.add(k, cnt) }
      c.toBytes
    }
    for (fa <- Seq(false, true); fb <- Seq(false, true)) {
      val m = build(ksA, fa).merge(build(ksB, fb))
      assert(java.util.Arrays.equals(m.toBytes, expect),
        s"merge mismatch for forced=($fa,$fb)")
      val m2 = build(ksB, fb).merge(build(ksA, fa))
      assert(java.util.Arrays.equals(m2.toBytes, expect),
        s"commuted merge mismatch for forced=($fa,$fb)")
    }
  }

  test("promotion mid-merge keeps counts (the HLL r4 regression shape)") {
    val d = 2
    val w = 32 // promoteAt = 8 cells
    val a = organic(d, w, weighted(20, 3)) // ~6 cells: just under
    assert(a.isSparse)
    val b = organic(d, w, weighted(21, 6)) // pushes the merge past promoteAt
    val merged = a.merge(b)
    val ref = organic(d, w, weighted(20, 3) ++ weighted(21, 6))
    assert(java.util.Arrays.equals(merged.toBytes, ref.toBytes))
  }

  test("wire-sparse blobs load into sparse memory and keep working") {
    val a = organic(7, 4096, weighted(30, 10))
    val rt = Cms.fromBytes(a.toBytes)
    assert(rt.isSparse, "small sparse-wire blob should load sparse")
    weighted(30, 10).foreach { case (k, _) =>
      assert(rt.estimate(k) === a.estimate(k))
    }
    // and keeps accepting writes / promotes organically afterwards
    keys(31, 5000).foreach(k => rt.add(k))
    assert(!rt.isSparse)
    assert(java.util.Arrays.equals(
      Cms.fromBytes(rt.toBytes).toBytes, rt.toBytes))
  }

  test("inner product agrees across modes") {
    val d = 4
    val w = 128
    val a = organic(d, w, weighted(40, 10))
    val b = organic(d, w, weighted(40, 10) ++ weighted(41, 2000))
    val aD = dense(d, w, weighted(40, 10))
    val bD = dense(d, w, weighted(40, 10) ++ weighted(41, 2000))
    assert(a.innerProduct(b) === aD.innerProduct(bD))
    assert(a.innerProduct(bD) === aD.innerProduct(b))
  }

  test("estimateHash path: absent keys read 0 through the sparse map") {
    val a = organic(7, 4096, weighted(50, 5))
    assert(a.estimateHash(Hash128.hashString("never-inserted", Cms.DefaultSeed)) === 0L)
  }
}
