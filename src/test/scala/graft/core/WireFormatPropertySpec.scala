package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the v2 adaptive wire formats (sparse/dense HLL
  * registers, sparse/dense EBF counts): across random parameters and
  * set sizes, serialization must round-trip to identical bytes, and
  * splitting the key stream into random parts and merging (through
  * serde at every step) must reproduce the direct build byte-for-byte
  * — the canonical-representation claim under the representation
  * BOUNDARY, where a sketch flips between sparse and dense forms.
  */
class WireFormatPropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(30)
  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("HLL: round-trip + split-merge byte canonicality across sizes and p") {
    val gen = for {
      p <- Gen.chooseNum(6, 14)
      n <- Gen.chooseNum(0, 6000)
      seed <- Gen.chooseNum(1L, 1000000L)
      cut <- Gen.chooseNum(0, 100)
    } yield (p, n, seed, cut)
    check("hll-wire", Prop.forAll(gen) { case (p, n, seed, cut) =>
      val direct = Hll.empty(p, seed)
      val a = Hll.empty(p, seed)
      val b = Hll.empty(p, seed)
      var i = 0
      while (i < n) {
        val key = s"k$seed-$i"
        direct.add(key)
        (if (i % 100 < cut) a else b).add(key)
        i += 1
      }
      val bytes = direct.toBytes
      assert(java.util.Arrays.equals(bytes, Hll.fromBytes(bytes).toBytes), "round-trip")
      val merged = Hll.fromBytes(a.toBytes).merge(Hll.fromBytes(b.toBytes))
      assert(java.util.Arrays.equals(bytes, merged.toBytes), "split-merge canonical")
      assert(Hll.fromBytes(bytes).estimate == direct.estimate)
      true
    })
  }

  test("EBF: round-trip + split-merge byte canonicality across sizes and params") {
    val gen = for {
      m0exp <- Gen.chooseNum(5, 11) // m0 in 32..2048
      k <- Gen.chooseNum(2, 7)
      n <- Gen.chooseNum(0, 4000)
      seed <- Gen.chooseNum(1L, 1000000L)
      cut <- Gen.chooseNum(0, 100)
    } yield (1 << m0exp, k, n, seed, cut)
    check("ebf-wire", Prop.forAll(gen) { case (m0, k, n, seed, cut) =>
      val direct = Ebf.empty(m0 = m0, k = k, seed = seed)
      val a = Ebf.empty(m0 = m0, k = k, seed = seed)
      val b = Ebf.empty(m0 = m0, k = k, seed = seed)
      var i = 0
      while (i < n) {
        val key = s"k$seed-$i"
        direct.insert(key)
        (if (i % 100 < cut) a else b).insert(key)
        i += 1
      }
      val bytes = direct.toBytes
      val back = Ebf.fromBytes(bytes)
      assert(java.util.Arrays.equals(bytes, back.toBytes), "round-trip")
      assert(back.n == direct.n && back.level == direct.level)
      val merged = Ebf.fromBytes(a.toBytes).merge(Ebf.fromBytes(b.toBytes))
      assert(java.util.Arrays.equals(bytes, merged.toBytes), "split-merge canonical")
      // no false negatives survive the wire
      var j = 0
      var ok = true
      while (j < n && ok) { ok = back.mightContain(s"k$seed-$j"); j += 1 }
      assert(ok, "false negative after round-trip")
      true
    })
  }
}
