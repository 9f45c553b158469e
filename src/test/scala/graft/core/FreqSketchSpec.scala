package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries heavy-hitter guarantees: never overestimates, undercount
  * bounded by the sketch's own tracked maxError, maxError <=
  * n/(capacity+1), heavy hitters never evicted — exhaustively vs exact
  * counts, on skewed streams, and across arbitrary merge splits. */
class FreqSketchSpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(40)
    .withInitialSeed(org.scalacheck.rng.Seed(20260817L)) // deterministic CI gate
  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def exactCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  /** Zipf-ish stream: item i drawn with weight ~ 1/(i+1). */
  private def zipfStream(n: Int, universe: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val weights = Array.tabulate(universe)(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    (0 until n).map { _ =>
      val x = rnd.nextDouble() * total
      var lo = 0; var hi = universe - 1
      while (lo < hi) { val mid = (lo + hi) / 2; if (cum(mid) < x) lo = mid + 1 else hi = mid }
      s"item$lo"
    }
  }

  private def assertGuarantees(f: FreqSketch, exact: Map[String, Long]): Unit = {
    val n = exact.values.sum
    assert(f.n == n)
    assert(f.maxError <= n / (f.capacity + 1),
      s"maxError ${f.maxError} > n/(cap+1) ${n / (f.capacity + 1)}")
    exact.foreach { case (item, c) =>
      val est = f.estimate(item)
      assert(est <= c, s"overestimate for $item: $est > $c")
      assert(c - est <= f.maxError, s"undercount for $item: $c - $est > ${f.maxError}")
      if (c > f.maxError) assert(est > 0, s"heavy hitter $item evicted (c=$c, err=${f.maxError})")
    }
    assert(f.numTracked <= f.capacity)
  }

  test("exact when the universe fits the capacity") {
    val stream = zipfStream(20000, universe = 50, seed = 1)
    val f = FreqSketch.empty(64)
    stream.foreach(f.add)
    val exact = exactCounts(stream)
    assert(f.maxError == 0)
    exact.foreach { case (item, c) => assert(f.estimate(item) == c) }
    // topK order matches exact (count desc, item asc)
    val exactTop = exact.toSeq.sortBy { case (i, c) => (-c, i) }.take(10)
    assert(f.topK(10) == exactTop)
  }

  test("guarantees hold on skewed streams with capacity << universe") {
    for (seed <- 1 to 5) {
      val stream = zipfStream(30000, universe = 5000, seed = seed)
      val f = FreqSketch.empty(32)
      stream.foreach(f.add)
      assertGuarantees(f, exactCounts(stream))
    }
  }

  test("weighted adds equal repeated unit adds (counts exact under capacity)") {
    val f1 = FreqSketch.empty(16)
    val f2 = FreqSketch.empty(16)
    val items = Seq("a" -> 5L, "b" -> 3L, "c" -> 1L)
    items.foreach { case (i, w) => f1.add(i, w) }
    items.foreach { case (i, w) => (1L to w).foreach(_ => f2.add(i)) }
    assert(java.util.Arrays.equals(f1.toBytes, f2.toBytes))
  }

  test("tokenizing add matches split-on-space semantics") {
    val f = FreqSketch.empty(16)
    f.addTextTokens("the cat  the dog ")
    assert(f.estimate("the") == 2 && f.estimate("cat") == 1 && f.estimate("dog") == 1)
    assert(f.n == 4)
  }

  test("merge preserves the guarantees for arbitrary 3-way splits") {
    val gen = for {
      n <- Gen.chooseNum(500, 4000)
      universe <- Gen.chooseNum(8, 2000)
      seed <- Gen.chooseNum(1L, 100000L)
      assign <- Gen.listOfN(n, Gen.chooseNum(0, 2))
    } yield (zipfStream(n, universe, seed), assign)
    check("mg-merge", Prop.forAll(gen) { case (stream, assign) =>
      val parts = Array.fill(3)(FreqSketch.empty(24))
      stream.zip(assign).foreach { case (item, p) => parts(p).add(item) }
      // both association orders, through serde round trips
      val left = FreqSketch.fromBytes(parts(0).toBytes)
        .merge(FreqSketch.fromBytes(parts(1).toBytes))
        .merge(FreqSketch.fromBytes(parts(2).toBytes))
      val right = FreqSketch.fromBytes(parts(0).toBytes).merge(
        FreqSketch.fromBytes(parts(1).toBytes).merge(FreqSketch.fromBytes(parts(2).toBytes)))
      val exact = exactCounts(stream)
      assertGuarantees(left, exact)
      assertGuarantees(right, exact)
      true
    })
  }

  test("agrees with the DataSketches frequent-items oracle on heavy hitters") {
    // same Zipf stream into our Misra-Gries and the independent Apache
    // DataSketches ItemsSketch; both must (a) bracket every true count
    // within their own error bounds and (b) surface the same top-5
    import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
    import org.apache.datasketches.common.ArrayOfStringsSerDe
    val stream = zipfStream(50000, universe = 3000, seed = 11)
    val exact = exactCounts(stream)
    val ours = FreqSketch.empty(64)
    val ds = new ItemsSketch[String](128) // power-of-2 map size, ~64 counters usable
    stream.foreach { s => ours.add(s); ds.update(s) }
    exact.foreach { case (item, c) =>
      assert(ours.estimate(item) <= c && c <= ours.estimate(item) + ours.maxError)
      assert(ds.getLowerBound(item) <= c && c <= ds.getUpperBound(item))
    }
    val exactTop = exact.toSeq.sortBy { case (i, c) => (-c, i) }.take(5).map(_._1)
    val ourTop = ours.topK(5).map(_._1)
    val dsTop = ds.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem)).take(5).map(_.getItem).toSeq
    assert(ourTop === exactTop)
    assert(dsTop === exactTop)
    // serde sanity against their serde too (both round-trip)
    val rt = ItemsSketch.getInstance(
      org.apache.datasketches.memory.Memory.wrap(ds.toByteArray(new ArrayOfStringsSerDe)),
      new ArrayOfStringsSerDe)
    assert(rt.getEstimate(exactTop.head) === ds.getEstimate(exactTop.head))
  }

  test("serde round-trips byte-identically and dispatches by magic") {
    val stream = zipfStream(5000, universe = 300, seed = 7)
    val f = FreqSketch.empty(32)
    stream.foreach(f.add)
    val b = f.toBytes
    val rt = FreqSketch.fromBytes(b)
    assert(java.util.Arrays.equals(b, rt.toBytes))
    assert(rt.n == f.n && rt.maxError == f.maxError && rt.topK(32) == f.topK(32))
    assert(SketchSerde.fromBytes(b).isInstanceOf[FreqSketch])
  }

  test("interim FQS1-magic blobs with the seeded layout still load") {
    // the round-4 build briefly persisted the seeded layout under the
    // v1 magic — those blobs must load identically (re-serialization
    // normalizes to FQS2)
    val f = FreqSketch.empty(32)
    zipfStream(2000, universe = 200, seed = 11).foreach(f.add)
    val b = f.toBytes
    val v1 = b.clone()
    java.nio.ByteBuffer.wrap(v1).putInt(FreqSketch.MagicV1)
    val rt = FreqSketch.fromBytes(v1)
    assert(rt.n == f.n && rt.topK(32) == f.topK(32))
    assert(java.util.Arrays.equals(rt.toBytes, b))
  }
}
