package graft

import graft.dedup.Decontaminate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O51 — benchmark decontamination pinned on hand-computable corpora:
  * planted cross-doc contamination, exact-boundary shingle counts,
  * shorter-than-n docs, case/whitespace normalization, per-doc distinct
  * shingles (repeats counted once), and full-containment score. */
class DecontaminateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(rows: Seq[(Long, String)], id: String): DataFrame = {
    import spark.implicits._
    rows.toDF(id, "text")
  }

  private def pairs(corpus: DataFrame, bench: DataFrame, n: Int): Map[(Long, Long), (Long, Long)] =
    Decontaminate.contaminatedPairs(corpus, "doc_id", bench, "bench_id", "text", n)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("shingleSet: sliding windows, distinct per doc, short docs dropped") {
    val s = Decontaminate.shingleSet(
      df(Seq(
        (1L, "a b c d"),        // 3 shingles: "a b", "b c", "c d"
        (2L, "x y x y x"),      // windows: xy yx xy yx -> distinct 2
        (3L, "solo")),          // < n tokens -> none
      "doc_id"), "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s === Set((1L, "a b"), (1L, "b c"), (1L, "c d"),
                     (2L, "x y"), (2L, "y x")))
  }

  test("planted contamination found, clean docs untouched, counts exact") {
    val corpus = df(Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "completely unrelated words with zero overlap here indeed"),
      (12L, "prefix filler then quick brown fox jumps inside this doc")),
      "doc_id")
    val bench = df(Seq((100L, "quick brown fox jumps")), "bench_id") // 2 shingles at n=3
    val got = pairs(corpus, bench, 3)
    // bench shingles: "quick brown fox", "brown fox jumps" — both in 10 and 12
    assert(got === Map((10L, 100L) -> (2L, 2L), (12L, 100L) -> (2L, 2L)))
  }

  test("normalization: case and whitespace runs do not break matches") {
    val corpus = df(Seq((1L, "  Alpha   BETA gamma\tdelta ")), "doc_id")
    val bench = df(Seq((2L, "alpha beta GAMMA")), "bench_id")
    assert(pairs(corpus, bench, 3) === Map((1L, 2L) -> (1L, 1L)))
  }

  test("partial overlap scores below full containment") {
    val corpus = df(Seq((1L, "a b c d zz yy xx ww")), "doc_id")
    val bench = df(Seq((2L, "a b c d e f")), "bench_id") // n=4: "a b c d","b c d e","c d e f"
    val got = pairs(corpus, bench, 4)
    assert(got === Map((1L, 2L) -> (1L, 3L))) // 1 of 3 shared
  }

  test("EBF-prefiltered path returns byte-identical pairs to the plain path") {
    val corpus = df(Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "completely unrelated words with zero overlap here indeed"),
      (12L, "prefix filler then quick brown fox jumps inside this doc")),
      "doc_id")
    val bench = df(Seq((100L, "quick brown fox jumps"), (101L, "zero overlap here indeed")), "bench_id")
    val plain = Decontaminate.contaminatedPairs(corpus, "doc_id", bench, "bench_id", "text", 3)
      .collect().map(_.toString).sorted
    val viaEbf = Decontaminate.contaminatedPairsViaEbf(corpus, "doc_id", bench, "bench_id", "text", 3)
      .collect().map(_.toString).sorted
    assert(viaEbf === plain)
    assert(plain.nonEmpty)
  }

  test("repeated shingles in a corpus doc count once (post-join dedup)") {
    // "a b" appears 3x in doc 1 and the bench doc shares it: n_shared
    // must be 1, not 3 — pins the countDistinct that replaced the
    // corpus-wide pre-join distinct
    val corpus = df(Seq((1L, "a b a b a b c")), "doc_id")
    val bench = df(Seq((2L, "a b z")), "bench_id") // shingles: "a b", "b z"
    assert(pairs(corpus, bench, 2) === Map((1L, 2L) -> (1L, 2L)))
    val viaEbf = Decontaminate.contaminatedPairsViaEbf(
        corpus, "doc_id", bench, "bench_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(viaEbf === Map((1L, 2L) -> (1L, 2L)))
  }

  test("no match below shingle length, exact-n match at the boundary") {
    val corpus = df(Seq((1L, "p q r s")), "doc_id")
    val benchShort = df(Seq((2L, "q r s")), "bench_id")      // 3 < n -> no shingles
    assert(pairs(corpus, benchShort, 4).isEmpty)
    val benchExact = df(Seq((3L, "p q r s")), "bench_id")    // exactly n tokens
    assert(pairs(corpus, benchExact, 4) === Map((1L, 3L) -> (1L, 1L)))
  }

  test("winnow path survives reformatting edits that blind the exact-shingle sweep") {
    val passage = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val corpus = df(Seq(
      (1L, s"leading filler words here $passage trailing filler words here"),
      (2L, "completely unrelated content with no overlap whatsoever at all today")), "corpus_id")
    // the benchmark copy is re-cased and re-flowed: upper + newlines +
    // extra punctuation — zero verbatim token runs survive
    val bench = df(Seq(
      (10L, passage.toUpperCase.replace(" ", ",\n"))), "bench_id")
    val shingle = Decontaminate.contaminatedPairs(
      corpus, "corpus_id", bench, "bench_id", "text", n = 4).collect()
    assert(shingle.isEmpty, "exact token shingles must find nothing under these edits")
    val winnow = Decontaminate.contaminatedPairsViaWinnow(
        corpus, "corpus_id", bench, "bench_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(winnow.contains((1L, 10L)), "winnow fingerprints must match through the reformat")
    assert(!winnow.keySet.exists(_._1 == 2L), "the unrelated doc must not pair")
  }
}
