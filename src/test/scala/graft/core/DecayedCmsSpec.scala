package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** O68: exponentially time-decayed CMS. Load-bearing claims: the
  * estimate tracks the exact decayed mass (over-estimate within the
  * CMS bound, applied to decayed weights), merge is value-associative
  * under any split/tree (NOT byte-stable — float rescaling), the
  * overflow rebase fires transparently on large forward time jumps,
  * and the wire format roundtrips.
  */
class DecayedCmsSpec extends AnyFunSuite {

  private val halfLife = 3600.0
  private val lambda = math.log(2.0) / halfLife
  private val t0 = 1700000000.0

  private def events: Seq[(String, Double)] =
    (0 until 5000).map { i =>
      // Zipf-ish token popularity, events one minute apart
      val r = (i * 2654435761L & 0x7fffffffL) % 100
      val tok = if (r < 50) "hot" else if (r < 80) s"warm${r % 3}" else s"cold$r"
      (tok, t0 + i * 60.0)
    }

  private def exactMass(key: String, tNow: Double): Double =
    events.filter(_._1 == key).map { case (_, ts) => math.exp(-lambda * (tNow - ts)) }.sum

  private def build(evs: Seq[(String, Double)]): DecayedCms = {
    val c = DecayedCms.empty(lambda = lambda)
    evs.foreach { case (k, ts) => c.add(k, ts) }
    c
  }

  test("estimate tracks exact decayed mass: over-estimate within the eps bound") {
    val tNow = t0 + 5000 * 60.0
    val c = build(events)
    val totalMass = events.map { case (_, ts) => math.exp(-lambda * (tNow - ts)) }.sum
    assert(math.abs(c.totalAt(tNow) - totalMass) <= 1e-6 * totalMass)
    for (key <- Seq("hot", "warm0", "warm1", "cold85")) {
      val exact = exactMass(key, tNow)
      val est = c.estimate(key, tNow)
      assert(est >= exact * (1 - 1e-9), s"$key: $est < $exact")
      assert(est <= exact + c.eps * totalMass + 1e-6, s"$key over bound: $est vs $exact")
    }
    // an event fully in the past decays: half-life semantics
    val single = build(Seq(("x", t0)))
    val e1 = single.estimate("x", t0 + halfLife)
    assert(math.abs(e1 - 0.5) < 1e-9, s"one half-life should leave 0.5, got $e1")
  }

  test("merge is value-associative under any split and tree shape") {
    val tNow = t0 + 5000 * 60.0
    val one = build(events)
    // merge MUTATES the receiver, so each fold gets fresh parts
    def parts = events.grouped(1700).map(build).toSeq
    val leftFold = parts.reduceLeft(_ merge _)
    val rightFold = parts.reduceRight(_ merge _)
    for (key <- Seq("hot", "warm0", "cold85")) {
      val a = one.estimate(key, tNow)
      assert(math.abs(leftFold.estimate(key, tNow) - a) <= 1e-9 * math.max(a, 1.0))
      assert(math.abs(rightFold.estimate(key, tNow) - a) <= 1e-9 * math.max(a, 1.0))
    }
    // merging an empty sketch is the identity
    val withEmpty = build(events).merge(DecayedCms.empty(lambda = lambda))
    assert(math.abs(withEmpty.estimate("hot", tNow) - one.estimate("hot", tNow)) <= 1e-12)
  }

  test("overflow rebase: a jump of hundreds of half-lives stays finite and correct") {
    val c = DecayedCms.empty(lambda = lambda)
    c.add("old", t0)
    // 400 half-lives later (lambda * dt = 277 > the 200 rebase trigger)
    val far = t0 + 400 * halfLife
    c.add("new", far)
    assert(c.table.forall(v => !v.isInfinite && !v.isNaN))
    assert(math.abs(c.estimate("new", far) - 1.0) <= 1e-9)
    // the old event is ~2^-400 of a unit: indistinguishable from zero
    assert(c.estimate("old", far) <= 1e-100)
    // and mass injected BEFORE the rebase is preserved across it
    val c2 = DecayedCms.empty(lambda = lambda)
    c2.add("k", t0); c2.add("k", t0 + halfLife)
    c2.add("other", t0 + 400 * halfLife)
    val atHl = c2.estimate("k", t0 + halfLife)
    assert(math.abs(atHl - 1.5) <= 1e-9, s"expected 1.5 at one half-life, got $atHl")
  }

  test("wire roundtrip preserves everything") {
    val c = build(events.take(1000))
    val back = DecayedCms.fromBytes(c.toBytes)
    assert(java.util.Arrays.equals(back.toBytes, c.toBytes))
    val tNow = t0 + 86400.0
    assert(back.estimate("hot", tNow) === c.estimate("hot", tNow))
    assert(back.totalAt(tNow) === c.totalAt(tNow))
    // empty roundtrip (NaN t0 survives)
    val e = DecayedCms.empty(lambda = lambda)
    assert(DecayedCms.fromBytes(e.toBytes).estimate("x", t0) === 0.0)
  }
}
