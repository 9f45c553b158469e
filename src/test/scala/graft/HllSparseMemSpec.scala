package graft

import graft.core.Hll
import org.scalatest.funsuite.AnyFunSuite

/** The sparse in-memory HLL mode must be observationally identical to
  * the dense mode: same estimates, same wire bytes, same merges — for
  * any insertion volume (below, at, and past the promotion threshold)
  * and any mix of sparse/dense operands. The dense path itself is the
  * round-3 implementation unchanged; these properties pin the sparse
  * path to it. */
class HllSparseMemSpec extends AnyFunSuite {

  private def keys(seed: Int, n: Int): Seq[String] =
    (0 until n).map(i => s"key-$seed-$i")

  private def organic(p: Int, ks: Seq[String]): Hll = {
    val h = Hll.empty(p)
    ks.foreach(h.add)
    h
  }

  private def dense(p: Int, ks: Seq[String]): Hll = {
    val h = Hll.empty(p)
    h.forceDense()
    ks.foreach(h.add)
    h
  }

  // volumes straddling the promotion threshold m/8 for p in {6, 10, 12}
  private val cases = for {
    p <- Seq(6, 10, 12)
    n <- Seq(0, 1, 3, (1 << p) / 16, (1 << p) / 8, (1 << p) / 4, 1 << p, 4 << p)
  } yield (p, n)

  test("organic (sparse-start) and forced-dense builds agree on bytes + estimate") {
    for (((p, n), i) <- cases.zipWithIndex) {
      val ks = keys(i, n)
      val a = organic(p, ks)
      val b = dense(p, ks)
      assert(a.estimate === b.estimate, s"estimate mismatch p=$p n=$n")
      assert(java.util.Arrays.equals(a.toBytes, b.toBytes), s"bytes mismatch p=$p n=$n")
    }
  }

  test("small sketches stay sparse; big ones promote") {
    val small = organic(12, keys(99, 100))
    assert(small.isSparse)
    val big = organic(12, keys(98, 1 << 13))
    assert(!big.isSparse)
  }

  test("merge agrees across all four mode combinations") {
    val p = 10
    // (100, 100): both operands sparse (threshold m/8 = 128 at p=10)
    // but the union crosses it MID-MERGE — regression for the
    // promotion-during-merge NPE caught by the scaling probe
    for ((na, nb) <- Seq((5, 7), (5, 5000), (5000, 5), (5000, 6000), (0, 50), (50, 0),
                         (100, 100), (127, 2))) {
      val ka = keys(1000 + na, na)
      val kb = keys(2000 + nb, nb)
      val ref = dense(p, ka).merge(dense(p, kb)).toBytes
      assert(java.util.Arrays.equals(organic(p, ka).merge(organic(p, kb)).toBytes, ref),
        s"sparse+sparse mismatch na=$na nb=$nb")
      assert(java.util.Arrays.equals(organic(p, ka).merge(dense(p, kb)).toBytes, ref),
        s"sparse+dense mismatch na=$na nb=$nb")
      assert(java.util.Arrays.equals(dense(p, ka).merge(organic(p, kb)).toBytes, ref),
        s"dense+sparse mismatch na=$na nb=$nb")
    }
  }

  test("round-trip preserves mode choice, bytes, and estimate") {
    for ((p, n) <- Seq((12, 10), (12, 600), (10, 5), (10, 4000))) {
      val h = organic(p, keys(7 * n + p, n))
      val bytes = h.toBytes
      val back = Hll.fromBytes(bytes)
      assert(java.util.Arrays.equals(back.toBytes, bytes))
      assert(back.estimate === h.estimate)
      assert(back.isSparse === (n <= (1 << p) / 8), s"unexpected memory mode p=$p n=$n")
    }
  }

  test("self-merge is the identity") {
    val h = organic(10, keys(5, 20))
    val before = h.toBytes
    h.merge(h)
    assert(java.util.Arrays.equals(h.toBytes, before))
  }

  test("random interleaved add/merge trees match dense reference") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 30) {
      val p = Seq(6, 10, 12)(rnd.nextInt(3))
      val parts = Seq.fill(rnd.nextInt(6) + 1)(
        keys(rnd.nextInt(1 << 20), rnd.nextInt(300)))
      val sketches = parts.map(organic(p, _))
      val merged = sketches.reduce(_ merge _)
      val refAll = dense(p, parts.flatten)
      assert(java.util.Arrays.equals(merged.toBytes, refAll.toBytes), s"trial $trial p=$p")
    }
  }
}
