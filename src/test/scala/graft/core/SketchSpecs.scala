package graft.core

import org.scalatest.funsuite.AnyFunSuite

class HllSpec extends AnyFunSuite {

  test("estimate within 3 sigma of exact over a cardinality sweep") {
    for (trueN <- Seq(10, 100, 1000, 10000, 100000)) {
      val h = Hll.empty()
      (0 until trueN).foreach(i => h.add(s"item-$i"))
      val est = h.estimate
      val tol = math.max(3.0, 3.0 * h.standardError * trueN)
      assert(math.abs(est - trueN) <= tol,
        s"n=$trueN est=$est tol=$tol")
    }
  }

  test("agrees with DataSketches HLL oracle within combined bounds") {
    val trueN = 50000
    val ours = Hll.empty()
    val ds = new org.apache.datasketches.hll.HllSketch(12)
    for (i <- 0 until trueN) { ours.add(s"v$i"); ds.update(s"v$i") }
    val combined = 4.0 * 1.04 / math.sqrt(4096.0) * trueN
    assert(math.abs(ours.estimate - ds.getEstimate) <= combined,
      s"ours=${ours.estimate} ds=${ds.getEstimate}")
  }

  test("merge is byte-identical under random partitioning and merge trees") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 10) {
      val ks = (0 until 5000).map(i => s"t$trial-$i")
      val ref = Hll.empty(p = 10)
      ks.foreach(ref.add)
      val parts = Array.fill(1 + rnd.nextInt(6))(Hll.empty(p = 10))
      ks.foreach(k => parts(rnd.nextInt(parts.length)).add(k))
      val pool = scala.collection.mutable.ArrayBuffer(parts.toIndexedSeq: _*)
      while (pool.size > 1) {
        val a = pool.remove(rnd.nextInt(pool.size))
        val b = pool.remove(rnd.nextInt(pool.size))
        pool += a.merge(b)
      }
      assert(java.util.Arrays.equals(ref.toBytes, pool.head.toBytes))
    }
  }

  test("sparse wire format: small sketches shrink ~60x, round-trip, and stay canonical") {
    // tiny sketch -> sparse wire bytes, far under the 4 KiB dense form
    val small = Hll.empty()
    (1 to 10).foreach(i => small.add(s"url$i"))
    val smallBytes = small.toBytes
    assert(smallBytes.length < 100, s"sparse form is ${smallBytes.length}B")
    assert(Hll.fromBytes(smallBytes).estimate === small.estimate)
    assert(Hll.fromBytes(smallBytes).toBytes.toSeq === smallBytes.toSeq)

    // large sketch -> dense wire form, also round-trips
    val big = Hll.empty()
    (1 to 50000).foreach(i => big.add(s"url$i"))
    assert(big.toBytes.length > 4000)
    assert(Hll.fromBytes(big.toBytes).toBytes.toSeq === big.toBytes.toSeq)

    // canonical across the sparse/dense boundary: many sparse parts
    // merged in random trees == the directly-built sketch, byte-equal
    val rnd = new scala.util.Random(7)
    val keys = (1 to 3000).map(i => s"k$i")
    val direct = Hll.empty()
    keys.foreach(direct.add)
    val parts = keys.grouped(50).map { g =>
      val h = Hll.empty(); g.foreach(h.add); h
    }.toBuffer
    while (parts.size > 1) {
      val i = rnd.nextInt(parts.size)
      val a = parts.remove(i)
      val b = parts.remove(rnd.nextInt(parts.size))
      // exercise the wire format at every internal merge step
      parts.append(Hll.fromBytes(a.toBytes).merge(Hll.fromBytes(b.toBytes)))
    }
    assert(parts.head.toBytes.toSeq === direct.toBytes.toSeq)
  }

  test("serde round-trip; duplicates don't change estimate") {
    val h = Hll.empty()
    (0 until 1000).foreach(i => h.add(i.toLong))
    (0 until 1000).foreach(i => h.add(i.toLong)) // idempotent
    val back = Hll.fromBytes(h.toBytes)
    assert(java.util.Arrays.equals(h.toBytes, back.toBytes))
    assert(back.estimate === h.estimate)
    assert(math.abs(h.estimate - 1000) <= 3 * h.standardError * 1000 + 3)
  }
}

class CmsSpec extends AnyFunSuite {

  test("never under-estimates; within eps*N with margin on Zipf data") {
    val rnd = new scala.util.Random(3)
    val c = Cms.empty()
    val exact = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    // Zipf-ish: token i frequency ~ 1/(i+1)
    val tokens = (0 until 500).flatMap(i => Seq.fill(2000 / (i + 1))(s"tok$i"))
    val shuffled = rnd.shuffle(tokens)
    shuffled.foreach { t => c.add(t); exact(t) += 1 }
    val nTotal = shuffled.size
    assert(c.total === nTotal)
    var overBudgetViolations = 0
    exact.foreach { case (t, cnt) =>
      val est = c.estimate(t)
      assert(est >= cnt, s"CMS under-estimated $t: $est < $cnt")
      if (est > cnt + c.eps * nTotal) overBudgetViolations += 1
    }
    // delta = e^-7 ~ 9e-4; allow a couple out of 500
    assert(overBudgetViolations <= 3, s"$overBudgetViolations eps-bound violations")
  }

  test("inner product: exact on collision-free data, bounded overestimate on join-sized data") {
    val rnd = new scala.util.Random(11)
    // A: key i with multiplicity fA(i); B: overlapping key range, fB(i)
    val fA = (0 until 300).map(i => s"k$i" -> (1 + rnd.nextInt(5))).toMap
    val fB = (150 until 450).map(i => s"k$i" -> (1 + rnd.nextInt(4))).toMap
    val a = Cms.empty()
    val b = Cms.empty()
    fA.foreach { case (k, n) => (1 to n).foreach(_ => a.add(k)) }
    fB.foreach { case (k, n) => (1 to n).foreach(_ => b.add(k)) }
    val exact = fA.keysIterator.map(k => fA(k).toLong * fB.getOrElse(k, 0).toLong).sum
    val est = a.innerProduct(b)
    assert(est >= exact, s"inner product under-estimated: $est < $exact")
    assert(est <= exact + a.eps * a.total * b.total,
      s"inner product above published bound: $est vs $exact + ${a.eps * a.total * b.total}")
    // splitting A's stream and merging the parts must not change it
    val a1 = Cms.empty()
    val a2 = Cms.empty()
    fA.foreach { case (k, n) => (1 to n).foreach(_ => (if (rnd.nextBoolean()) a1 else a2).add(k)) }
    assert(a1.merge(a2).innerProduct(b) === est)
    // mismatched parameters refuse rather than silently mis-estimate
    intercept[IllegalArgumentException] {
      a.innerProduct(Cms.empty(width = Cms.DefaultWidth * 2))
    }
  }

  test("inner product saturates instead of wrapping past Long range") {
    val a = Cms.empty()
    val b = Cms.empty()
    a.add("x", Long.MaxValue / 4)
    b.add("x", Long.MaxValue / 4)
    // the cell product overflows 64 bits; wrapping would return a
    // negative/small under-estimate
    assert(a.innerProduct(b) === Long.MaxValue)
  }

  test("merge = elementwise add, byte-identical under random merge trees") {
    val rnd = new scala.util.Random(11)
    val items = (0 until 20000).map(i => s"i${rnd.nextInt(300)}")
    val ref = Cms.empty(depth = 5, width = 512)
    items.foreach(ref.add(_))
    val parts = Array.fill(5)(Cms.empty(depth = 5, width = 512))
    items.foreach(i => parts(rnd.nextInt(5)).add(i))
    val merged = parts.reduceLeft((a, b) => a.merge(b))
    assert(java.util.Arrays.equals(ref.toBytes, merged.toBytes))
  }

  test("agrees with spark.util.sketch CountMinSketch oracle on heavy hitters") {
    val items = (0 until 300).flatMap(i => Seq.fill(1000 / (i + 1))(s"w$i"))
    val ours = Cms.empty()
    val theirs = org.apache.spark.util.sketch.CountMinSketch.create(0.001, 0.001, 42)
    items.foreach { s => ours.add(s); theirs.addString(s) }
    for (i <- 0 until 20) {
      val t = s"w$i"
      val exact = items.count(_ == t).toLong
      // both over-estimate-only; both should be close to exact on heavy hitters
      assert(ours.estimate(t) >= exact)
      assert(ours.estimate(t) <= exact + ours.eps * items.size + 1)
      assert(theirs.estimateCount(t) >= exact)
    }
  }

  test("serde round-trip byte-identical") {
    val c = Cms.empty(depth = 3, width = 64)
    (0 until 1000).foreach(i => c.add(s"x${i % 50}"))
    val back = Cms.fromBytes(c.toBytes)
    assert(java.util.Arrays.equals(c.toBytes, back.toBytes))
    assert(back.estimate("x1") === c.estimate("x1"))
  }
}

class KllSpec extends AnyFunSuite {

  private def rankErrorCheck(data: IndexedSeq[Double], k: Int, label: String): Unit = {
    val s = Kll.empty(k)
    data.foreach(s.add)
    val sorted = data.sorted
    val n = data.size
    val eps = s.normalizedRankError * 2.0 // deterministic-coin margin
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = s.quantile(q)
      // true rank of the estimate
      val trueRank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(trueRank - q) <= eps,
        s"$label q=$q est=$est trueRank=$trueRank eps=$eps")
    }
  }

  test("rank error within 2x published bound on uniform data") {
    val rnd = new scala.util.Random(5)
    rankErrorCheck((0 until 100000).map(_ => rnd.nextDouble()), 200, "uniform")
  }

  test("rank error within bound on skewed (lognormal-ish) data") {
    val rnd = new scala.util.Random(6)
    rankErrorCheck((0 until 100000).map(_ => math.exp(rnd.nextGaussian() * 2)), 200, "lognormal")
  }

  test("rank error within bound on sorted adversarial input") {
    rankErrorCheck((0 until 50000).map(_.toDouble), 200, "sorted")
  }

  test("published bound constant matches the DataSketches helper") {
    val ds = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
    val helper = org.apache.datasketches.kll.KllSketch.getNormalizedRankError(200, false)
    val ours = Kll.empty(200).normalizedRankError
    assert(math.abs(helper - ours) / helper < 0.05, s"ours=$ours ds=$helper")
    val _ = ds
  }

  test("merge under random partitioning/merge trees stays within bound") {
    val rnd = new scala.util.Random(9)
    val data = (0 until 80000).map(_ => rnd.nextDouble() * 1000)
    val sorted = data.sorted
    for (trial <- 0 until 5) {
      val parts = Array.fill(2 + rnd.nextInt(6))(Kll.empty(200))
      data.foreach(v => parts(rnd.nextInt(parts.length)).add(v))
      val pool = scala.collection.mutable.ArrayBuffer(parts.toIndexedSeq: _*)
      while (pool.size > 1) {
        val a = pool.remove(rnd.nextInt(pool.size))
        val b = pool.remove(rnd.nextInt(pool.size))
        pool += a.merge(b)
      }
      val s = pool.head
      assert(s.n === data.size)
      val eps = s.normalizedRankError * 3.0 // merge + deterministic margin
      for (q <- Seq(0.05, 0.5, 0.95)) {
        val est = s.quantile(q)
        val trueRank = sorted.count(_ <= est).toDouble / data.size
        assert(math.abs(trueRank - q) <= eps, s"trial $trial q=$q rank=$trueRank")
      }
    }
  }

  test("serde round-trip preserves estimates and bytes") {
    val s = Kll.empty(150)
    (0 until 30000).foreach(i => s.add(math.sin(i.toDouble)))
    val bytes = s.toBytes
    val back = Kll.fromBytes(bytes)
    assert(java.util.Arrays.equals(bytes, back.toBytes))
    for (q <- Seq(0.1, 0.5, 0.9)) assert(back.quantile(q) === s.quantile(q))
    assert(back.n === s.n && back.minV === s.minV && back.maxV === s.maxV)
  }

  test("min/max and extreme quantiles exact") {
    val s = Kll.empty(100)
    val data = (0 until 10000).map(_.toDouble)
    scala.util.Random.shuffle(data).foreach(s.add)
    assert(s.quantile(0.0) === 0.0)
    assert(s.quantile(1.0) === 9999.0)
  }
}

class TDigestSpec extends AnyFunSuite {

  test("adversarial merges never overflow the centroid array (capacity guard)") {
    // tiny compression (10 -> 28 centroid slots) + many merges of
    // heavy-weighted wide-magnitude points: the mergeBuffer guard must
    // force absorption at capacity instead of emitting past the array,
    // and quantiles must stay monotone
    val rnd = new scala.util.Random(0xad5e)
    for (_ <- 1 to 50) {
      val td = TDigest.empty(10.0)
      for (_ <- 1 to rnd.nextInt(40) + 5) {
        val other = TDigest.empty(10.0)
        for (_ <- 1 to rnd.nextInt(400) + 1)
          other.add(rnd.nextGaussian() * math.pow(10, rnd.nextInt(8)),
            rnd.nextInt(1000000).toLong + 1)
        td.merge(other)
      }
      assert(td.centroidCount <= 28, s"centroid overflow: ${td.centroidCount}")
      val qs = Seq(0.0, 0.01, 0.5, 0.99, 1.0).map(td.quantile)
      qs.zip(qs.tail).foreach { case (a, b) => assert(a <= b, s"non-monotone: $qs") }
    }
  }

  test("quantile rank error small, tails tighter than middle") {
    val rnd = new scala.util.Random(13)
    val data = (0 until 100000).map(_ => rnd.nextGaussian())
    val t = TDigest.empty(100)
    data.foreach(t.add)
    val sorted = data.sorted
    def trueRank(v: Double) = sorted.count(_ <= v).toDouble / data.size
    for ((q, tol) <- Seq(0.001 -> 0.001, 0.01 -> 0.005, 0.5 -> 0.02, 0.99 -> 0.005, 0.999 -> 0.001)) {
      val est = t.quantile(q)
      assert(math.abs(trueRank(est) - q) <= tol, s"q=$q est=$est rank=${trueRank(est)}")
    }
    assert(t.centroidCount <= 2 * 100 + 8)
  }

  test("comparable accuracy to DataSketches TDigestDouble oracle") {
    val rnd = new scala.util.Random(17)
    val data = (0 until 50000).map(_ => math.exp(rnd.nextGaussian()))
    val ours = TDigest.empty(100)
    val ds = new org.apache.datasketches.tdigest.TDigestDouble(100.toShort)
    data.foreach { v => ours.add(v); ds.update(v) }
    val sorted = data.sorted
    def trueRank(v: Double) = sorted.count(_ <= v).toDouble / data.size
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
      val ourErr = math.abs(trueRank(ours.quantile(q)) - q)
      val dsErr = math.abs(trueRank(ds.getQuantile(q)) - q)
      assert(ourErr <= math.max(0.02, 4 * dsErr + 0.005),
        s"q=$q ourErr=$ourErr dsErr=$dsErr")
    }
  }

  test("merge under random merge trees stays accurate; n/min/max exact") {
    val rnd = new scala.util.Random(19)
    val data = (0 until 60000).map(_ => rnd.nextDouble() * 100)
    val sorted = data.sorted
    val parts = Array.fill(6)(TDigest.empty(100))
    data.foreach(v => parts(rnd.nextInt(6)).add(v))
    val pool = scala.collection.mutable.ArrayBuffer(parts.toIndexedSeq: _*)
    while (pool.size > 1) {
      val a = pool.remove(rnd.nextInt(pool.size))
      val b = pool.remove(rnd.nextInt(pool.size))
      pool += a.merge(b)
    }
    val t = pool.head
    assert(t.n === data.size)
    assert(t.quantile(0.0) === data.min)
    assert(t.quantile(1.0) === data.max)
    for (q <- Seq(0.01, 0.5, 0.99)) {
      val est = t.quantile(q)
      val r = sorted.count(_ <= est).toDouble / data.size
      assert(math.abs(r - q) <= 0.03, s"q=$q rank=$r")
    }
  }

  test("serde round-trip byte-identical") {
    val t = TDigest.empty(50)
    (0 until 20000).foreach(i => t.add(i.toDouble % 1000))
    val bytes = t.toBytes
    val back = TDigest.fromBytes(bytes)
    assert(java.util.Arrays.equals(bytes, back.toBytes))
    assert(back.quantile(0.5) === t.quantile(0.5))
  }
}
