package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** O79 — Count Sketch: point-estimate exactness in the collision-free
  * regime, the published two-sided error bound, unbiased AMS
  * inner-product/F2 estimators, TURNSTILE deletes (exact retraction by
  * linearity), byte-identical merge under arbitrary merge trees, and
  * the dense/sparse wire duality. All fixed-seed deterministic. */
class CountSketchSpec extends AnyFunSuite {

  private def sketch(counts: Map[String, Long],
                     width: Int = CountSketch.DefaultWidth): CountSketch = {
    val cs = CountSketch.empty(width = width)
    // insert in sorted key order so the build is reproducible
    counts.toSeq.sortBy(_._1).foreach { case (k, c) => cs.add(k, c) }
    cs
  }

  private def zipf(tag: String, n: Int): Map[String, Long] =
    (1 to n).map(i => s"$tag-$i" -> (1000L / i + 1L)).toMap

  test("point estimates exact in the collision-free regime") {
    // 50 keys in 8192-wide rows: with the fixed seed every key's median
    // row is collision-free, so estimates are exactly the true counts
    val counts = zipf("cf", 50)
    val cs = sketch(counts, width = 8192)
    counts.foreach { case (k, c) =>
      assert(cs.estimate(k) === c, s"key $k")
    }
  }

  test("two-sided published bound |est - true| <= 3*sqrt(F2/width) on a skewed stream") {
    val counts = zipf("sk", 2000)
    val cs = sketch(counts) // default width 4096 — collisions guaranteed
    val f2 = counts.values.map(c => c.toDouble * c).sum
    val bound = 3.0 * math.sqrt(f2 / cs.width)
    counts.foreach { case (k, c) =>
      assert(math.abs(cs.estimate(k) - c) <= bound, s"key $k est=${cs.estimate(k)} true=$c")
    }
    // and a never-inserted key reads within the same bound of zero
    assert(math.abs(cs.estimate("absent").toDouble) <= bound)
  }

  test("turnstile: add/delete cancels exactly, bytes equal the never-added build") {
    val base = zipf("t", 100)
    val extra = (1 to 40).map(i => s"extra-$i" -> (i.toLong * 3)).toMap
    val withExtra = sketch(base ++ extra.map { case (k, c) => k -> c })
    // retract the extras with negative counts, element by element
    extra.toSeq.sortBy(_._1).foreach { case (k, c) => withExtra.add(k, -c) }
    assert(java.util.Arrays.equals(withExtra.toBytes, sketch(base).toBytes))
    assert(withExtra.estimate("extra-7") === 0L)
  }

  test("subtract retracts a whole sub-multiset byte-exactly") {
    val a = zipf("sa", 300)
    val b = zipf("sa", 300).filter(_._1.stripPrefix("sa-").toInt % 3 == 0)
    val rest = a.map { case (k, c) => k -> (c - b.getOrElse(k, 0L)) }
      .filter(_._2 > 0)
    assert(java.util.Arrays.equals(
      sketch(a).subtract(sketch(b)).toBytes, sketch(rest).toBytes))
  }

  test("merge is byte-identical under arbitrary merge trees (linearity)") {
    val counts = zipf("m", 1000).toSeq.sortBy(_._1)
    val whole = {
      val cs = CountSketch.empty()
      counts.foreach { case (k, c) => cs.add(k, c) }
      cs.toBytes
    }
    val rnd = new scala.util.Random(0x5c5c)
    for (_ <- 1 to 10) {
      val parts = Array.fill(5)(CountSketch.empty())
      counts.foreach { case (k, c) => parts(rnd.nextInt(5)).add(k, c) }
      val pool = scala.collection.mutable.ArrayBuffer(parts.toIndexedSeq: _*)
      while (pool.size > 1) {
        val a = pool.remove(rnd.nextInt(pool.size))
        val b = pool.remove(rnd.nextInt(pool.size))
        pool += a.merge(b)
      }
      assert(java.util.Arrays.equals(pool.head.toBytes, whole))
    }
  }

  test("inner product and F2 are within 4 sigma of their AMS variance bounds") {
    val ca = zipf("ia", 5000)
    val cb = zipf("ia", 5000).collect {
      // overlap on even indices with different counts
      case (k, c) if k.stripPrefix("ia-").toInt % 2 == 0 => k -> (c + 7L)
    }
    val a = sketch(ca)
    val b = sketch(cb)
    val exactIp = ca.map { case (k, c) => c.toDouble * cb.getOrElse(k, 0L).toDouble }.sum
    val f2a = ca.values.map(c => c.toDouble * c).sum
    val f2b = cb.values.map(c => c.toDouble * c).sum
    assert(math.abs(a.innerProduct(b) - exactIp) <= 4.0 * math.sqrt(2.0 * f2a * f2b / a.width))
    assert(math.abs(a.f2 - f2a) <= 4.0 * math.sqrt(2.0 / a.width) * f2a)
  }

  test("wire roundtrip: dense and sparse modes, empty sketch, negative cells") {
    // sparse: a handful of keys, including net-negative cells
    val sp = CountSketch.empty()
    sp.add("a", 5L)
    sp.add("b", -9L)
    val spBytes = sp.toBytes
    assert(spBytes.length < 200, s"expected sparse wire, got ${spBytes.length} B")
    val spBack = CountSketch.fromBytes(spBytes)
    assert(java.util.Arrays.equals(spBack.toBytes, spBytes))
    assert(spBack.estimate("a") === 5L)
    assert(spBack.estimate("b") === -9L)
    assert(spBack.total === -4L)

    // dense: enough distinct keys that fixed cells win
    val dn = sketch(zipf("d", 3000))
    val dnBytes = dn.toBytes
    val dnBack = CountSketch.fromBytes(dnBytes)
    assert(java.util.Arrays.equals(dnBack.toBytes, dnBytes))
    assert(dnBack.total === dn.total)

    // empty
    val em = CountSketch.empty()
    assert(java.util.Arrays.equals(CountSketch.fromBytes(em.toBytes).toBytes, em.toBytes))
    assert(CountSketch.fromBytes(em.toBytes).estimate("x") === 0L)

    // SketchSerde magic dispatch covers the new type
    assert(SketchSerde.fromBytes(spBytes).isInstanceOf[CountSketch])
  }

  test("addTextTokens is byte-identical to per-token adds, skipping empties") {
    val texts = Seq("the cat  sat", "", " leading and trailing ", "one", null)
    val kernel = CountSketch.empty()
    texts.foreach(kernel.addTextTokens)
    val perToken = CountSketch.empty()
    texts.filter(_ != null).flatMap(_.split(" ")).filter(_.nonEmpty)
      .foreach(perToken.add(_))
    assert(java.util.Arrays.equals(kernel.toBytes, perToken.toBytes))
    assert(kernel.estimate("the") === 1L)
    assert(kernel.estimate("sat") === 1L)
  }

  test("parameter mismatches are refused") {
    val a = CountSketch.empty(depth = 5)
    val b = CountSketch.empty(depth = 7)
    intercept[IllegalArgumentException](a.merge(b))
    intercept[IllegalArgumentException](a.innerProduct(b))
    intercept[IllegalArgumentException](a.subtract(b))
  }
}
