package graft

import graft.dedup.Dedup
import graft.functions.{Graft, TextFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O72 — winnowing document fingerprints (Schleimer/Wilkerson/Aiken
  * 2003): kernel properties against a naive reference, the local
  * substring-match guarantee, edge conventions, and the winnowPairs
  * candidate generator. */
class WinnowingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Graft.ensure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate())

  /** Naive reference: materialize all window minima, distinct. */
  private def naive(text: String, k: Int, w: Int): Set[String] = {
    val norm = TextFunctions.normalizeAlnum(text)
    if (norm.isEmpty) return Set.empty
    if (norm.length < k) return Set(hash(norm))
    val grams = (0 to norm.length - k).map(i => hash(norm.substring(i, i + k)))
    val eff = math.min(w, grams.length)
    (0 to grams.length - eff).map(j => grams.slice(j, j + eff).min).toSet
  }

  private def hash(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.take(8).map(b => f"$b%02x").mkString
  }

  // deterministic pseudo-random text: hash-derived letters
  private def randText(seed: Int, n: Int): String =
    (0 until n).map { i =>
      val h = graft.core.Hash128.hash64(s"$seed-$i", 9L)
      if (h % 7 == 0) ' ' else ('a' + math.floorMod(h, 26)).toChar
    }.mkString

  test("kernel equals the naive reference on varied inputs") {
    for (seed <- 1 to 40; n <- Seq(5, 8, 20, 60, 300, 1200)) {
      val t = randText(seed, n)
      assert(TextFunctions.winnowFingerprints(t, 8, 16).toSet === naive(t, 8, 16),
        s"mismatch at seed=$seed n=$n")
    }
    // varied (k, w) too
    for (seed <- 1 to 10; (k, w) <- Seq((3, 4), (5, 10), (8, 16), (12, 3)))
      assert(TextFunctions.winnowFingerprints(randText(seed, 200), k, w).toSet ===
        naive(randText(seed, 200), k, w), s"mismatch at seed=$seed k=$k w=$w")
  }

  test("edge conventions: null, empty, shorter than k, fewer than w grams") {
    assert(TextFunctions.winnowFingerprints(null, 8, 16).isEmpty)
    assert(TextFunctions.winnowFingerprints("  .,!  ", 8, 16).isEmpty)
    val short = TextFunctions.winnowFingerprints("abc", 8, 16)
    assert(short.length === 1 && short.head === hash("abc"))
    // 10 chars, k=8 -> 3 grams < w=16 -> single min fingerprint
    val few = TextFunctions.winnowFingerprints("abcdefghij", 8, 16)
    assert(few.length === 1)
  }

  test("winnowing guarantee: a shared substring of length >= w + k - 1 shares a fingerprint") {
    val k = 8; val w = 16
    val common = randText(99, w + k - 1 + 5) // comfortably past the bound
    for (seed <- 1 to 20) {
      val a = randText(seed, 150) + common + randText(seed + 1000, 150)
      val b = randText(seed + 2000, 150) + common + randText(seed + 3000, 150)
      val shared = TextFunctions.winnowFingerprints(a, k, w).toSet
        .intersect(TextFunctions.winnowFingerprints(b, k, w).toSet)
      assert(shared.nonEmpty, s"guarantee violated at seed=$seed")
    }
  }

  test("density bounds: between ceil(windows/w) and windows fingerprints") {
    for (seed <- 1 to 20) {
      val t = randText(seed, 500)
      val norm = TextFunctions.normalizeAlnum(t)
      val p = norm.length - 8 + 1
      val windows = p - 16 + 1
      val nfp = TextFunctions.winnowFingerprints(t, 8, 16).length
      assert(nfp <= windows)
      // each selected fingerprint can cover at most w consecutive windows
      assert(nfp >= math.ceil(windows / 16.0).toInt, s"too sparse at seed=$seed")
    }
  }

  test("fingerprints survive reformatting (whitespace/punctuation/case)") {
    val a = "The quick brown Fox, jumps over the lazy dog! " * 4
    val b = a.toLowerCase.replace(", ", "\n").replace("! ", "  ...  ")
    assert(TextFunctions.winnowFingerprints(a, 8, 16).toSet ===
      TextFunctions.winnowFingerprints(b, 8, 16).toSet)
  }

  test("winnowPairs finds local partial copies that whole-doc LSH misses; maxBucket drops boilerplate") {
    import spark.implicits._
    // 30 distinct docs; doc 100 and 101 share ONE long passage
    // (~25% of each doc); every doc carries the same short boilerplate
    val passage = randText(7, 420)
    val boiler = randText(8, 120)
    val docs = (1 to 30).map(i => (i.toLong, randText(i, 1200) + boiler)) ++
      Seq((100L, randText(50, 900) + passage + boiler),
        (101L, passage + randText(51, 900) + boiler))
    val df = docs.toDF("doc_id", "text").repartition(4)
    val pairs = Dedup.winnowPairs(df, "text", "doc_id", minShared = 3, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 101L)), "partial-copy pair must surface")
    // the shared boilerplate is in ALL 32 docs -> its fingerprints blow
    // past maxBucket=10 and are dropped, so unrelated docs don't pair up
    assert(pairs.size < 20, s"boilerplate must not pair everyone: ${pairs.size}")
  }

  test("pair shared-counts are partitioning-invariant") {
    import spark.implicits._
    val docs = (1 to 12).map(i => (i.toLong,
      randText(i, 600) + (if (i % 3 == 0) randText(77, 200) else "")))
    val df1 = docs.toDF("doc_id", "text").repartition(1)
    val df8 = docs.toDF("doc_id", "text").repartition(8)
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.winnowPairs(df, "text", "doc_id", minShared = 2, maxBucket = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(run(df1) === run(df8))
  }
}
