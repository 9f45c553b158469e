package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** O73 — mergeable bottom-k distinct-key sample: exactness below
  * capacity, keep-k-smallest vs a naive reference, the full merge-law
  * battery (byte-stability under any merge tree — the Theta posture),
  * and wire roundtrips. */
class BottomKSampleSpec extends AnyFunSuite {

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def naive(keys: Seq[String], k: Int): Seq[String] =
    keys.distinct.sortBy(md5).take(k)

  private def keysFor(n: Int, tag: String = "key"): Seq[String] =
    (0 until n).map(i => s"$tag-$i")

  test("exact below capacity; duplicates collapse") {
    val s = BottomKSample.empty(100)
    val ks = keysFor(40)
    (ks ++ ks ++ ks).foreach(s.add)
    assert(s.size === 40)
    assert(s.keys.toSet === ks.toSet)
  }

  test("keep-k-smallest matches the naive reference, in hash order") {
    for (k <- Seq(1, 7, 64); n <- Seq(5, 64, 500)) {
      val s = BottomKSample.empty(k)
      val ks = keysFor(n)
      ks.foreach(s.add)
      assert(s.keys.toSeq === naive(ks, k), s"k=$k n=$n")
    }
  }

  test("null keys are skipped") {
    val s = BottomKSample.empty(8)
    s.add(null); s.add("a"); s.add(null)
    assert(s.keys.toSeq === Seq("a"))
  }

  test("merge laws: byte-identical under any merge tree, idempotent") {
    val ks = keysFor(300, "m")
    val rnd = new scala.util.Random(7)
    def build(keys: Seq[String]): BottomKSample = {
      val s = BottomKSample.empty(32); keys.foreach(s.add); s
    }
    val reference = build(ks).toBytes
    (1 to 10).foreach { _ =>
      // random partitioning into random-size groups, merged in random order
      val parts = rnd.shuffle(ks).grouped(1 + rnd.nextInt(80)).map(build).toBuffer
      while (parts.size > 1) {
        val i = rnd.nextInt(parts.size - 1)
        val b = parts.remove(i + 1)
        parts(i) = parts(i).merge(b)
      }
      assert(java.util.Arrays.equals(parts.head.toBytes, reference),
        "merge tree changed the bytes")
    }
    // idempotent: merging a copy of itself is a no-op
    val a = build(ks)
    val before = a.toBytes
    assert(java.util.Arrays.equals(a.merge(BottomKSample.fromBytes(before)).toBytes, before))
  }

  test("wire roundtrip, empty sketch, mismatched-k merge refused") {
    val s = BottomKSample.empty(16)
    keysFor(50).foreach(s.add)
    val back = BottomKSample.fromBytes(s.toBytes)
    assert(back.keys.toSeq === s.keys.toSeq && back.size === 16)
    val e = BottomKSample.empty(16)
    assert(BottomKSample.fromBytes(e.toBytes).size === 0)
    intercept[IllegalArgumentException] {
      s.merge(BottomKSample.empty(8))
    }
  }

  test("sample is unbiased across disjoint key populations (KMV uniformity smoke)") {
    // two equal-size populations; retained counts from each should be
    // close to k/2 (binomial, sigma = sqrt(k)/2 ~ 5.7 at k=128)
    val s = BottomKSample.empty(128)
    keysFor(5000, "pop_a").foreach(s.add)
    keysFor(5000, "pop_b").foreach(s.add)
    val a = s.keys.count(_.startsWith("pop_a"))
    assert(math.abs(a - 64) <= 20, s"population a retained $a of 128")
  }
}
