package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class TextFunctionsSpec extends AnyFunSuite {
  import TextFunctions._

  private def ext(s: String): String = extractText(s.getBytes(UTF_8))

  test("extract_text strips tags, keeps content, collapses whitespace") {
    assert(ext("<html><body><p>hello   world</p></body></html>") === "hello world")
    assert(ext("<p>a</p><p>b</p>") === "a b")
    assert(ext("  <div> padded </div>  ") === "padded")
    assert(ext("no markup at all") === "no markup at all")
  }

  test("extract_text drops script/style content entirely") {
    assert(ext("<p>keep</p><script>var x = 'drop me';</script><p>this</p>") === "keep this")
    assert(ext("<style>.c { color: red }</style>body") === "body")
    assert(ext("<SCRIPT>UPPER</script>tail") === "tail")
  }

  test("extract_text decodes entities (named, decimal, hex)") {
    assert(ext("a &amp; b") === "a & b")
    assert(ext("&lt;tag&gt;") === "<tag>")
    assert(ext("&#65;&#x42;") === "AB")
    assert(ext("x&nbsp;&nbsp;y") === "x y")
    // malformed entities pass through unchanged
    assert(ext("AT&T and &bogus; stay") === "AT&T and &bogus; stay")
  }

  test("extract_text edge cases: unterminated tag, empty, null") {
    assert(ext("head<unclosed attr") === "head")
    assert(ext("") === "")
    assert(extractText(null) === null)
  }

  test("extract_text is byte-deterministic (same input, same output, twice)") {
    val html = "<html><head><title>t1 z</title></head><body><p>alpha beta</p></body></html>"
    assert(ext(html) === ext(html))
    assert(ext(html) === "t1 z alpha beta")
  }

  test("token counts: whitespace and BPE-ish") {
    assert(tokenCount("a b c") === 3)
    assert(tokenCount("  a   b  ") === 2)
    assert(tokenCount("") === 0)
    assert(tokenCount(null) === 0)
    assert(bpeishTokenCount("hello, world42!") === 5) // hello , world 42 !
    assert(bpeishTokenCount("") === 0)
  }

  test("fingerprint: deterministic, content-sensitive") {
    assert(fingerprint("abc") === fingerprint("abc"))
    assert(fingerprint("abc") !== fingerprint("abd"))
    assert(fingerprint(null) === 0L)
  }

  test("simhash: near-duplicates have small Hamming distance, unrelated texts large") {
    val base = (0 until 100).map(i => s"tok${i % 40}").mkString(" ")
    val near = base + " extra"
    val far = (0 until 100).map(i => s"other${i % 40}").mkString(" ")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(simhash(base), simhash(near)) <= 6)
    assert(ham(simhash(base), simhash(far)) >= 20)
  }

  test("minhash estimates Jaccard within sampling error") {
    // two texts sharing ~half their 3-shingles
    val shared = (0 until 60).map(i => s"s$i").mkString(" ")
    val a = shared + " " + (0 until 30).map(i => s"a$i").mkString(" ")
    val b = shared + " " + (0 until 30).map(i => s"b$i").mkString(" ")
    val exact = ngramJaccard(a, b, 3)
    val est = minhashJaccard(minhash(a, 128, 3), minhash(b, 128, 3))
    // sigma ~= sqrt(J(1-J)/128) ~= 0.044
    assert(math.abs(est - exact) <= 4 * math.sqrt(exact * (1 - exact) / 128) + 0.02,
      s"exact=$exact est=$est")
  }

  test("ngramJaccard: identity 1.0, disjoint 0.0, empty-vs-empty 1.0") {
    val t = "a b c d e"
    assert(ngramJaccard(t, t, 3) === 1.0)
    assert(ngramJaccard("a b c d", "x y z w", 2) === 0.0)
    assert(ngramJaccard("", "", 3) === 1.0)
  }

  test("langId: stopword-driven languages and CJK") {
    assert(langId("the cat and the dog sat on the mat with his hat") === "en")
    assert(langId("le chat et la souris dans une maison pour le roi") === "fr")
    assert(langId("el gato y el perro en una casa con su amigo") === "es")
    assert(langId("der hund und die katze sind nicht in das haus") === "de")
    assert(langId("一丁丂 七丄丅") === "zh")
    assert(langId("") === "und")
    assert(langId("zzz qqq xxx") === "und")
  }

  test("topNgramCount: repetition counted, short/empty texts score 0, normalization") {
    assert(topNgramCount("click here click here click here", 2) === 3) // "click here" x3
    assert(topNgramCount("click here click here click here", 3) === 2) // "here click here" x2
    assert(topNgramCount("a b c d", 2) === 1)       // all grams unique
    assert(topNgramCount("a a a a", 1) === 4)       // unigram mode
    assert(topNgramCount("a b", 3) === 0)           // shorter than n
    assert(topNgramCount("", 2) === 0)
    assert(topNgramCount(null, 2) === 0)
    assert(topNgramCount("  A  b   a B ", 2) === 2) // case + whitespace runs fold
  }

  test("qualityScore: clean prose beats garbage; bounded in [0,1]") {
    val clean = (0 until 80).map(i => s"word${i % 30}").mkString(" ")
    val garbage = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    assert(qualityScore(clean) > qualityScore(garbage))
    for (t <- Seq(clean, garbage, "", "a")) {
      val q = qualityScore(t)
      assert(q >= 0.0 && q <= 1.0)
    }
  }
}
