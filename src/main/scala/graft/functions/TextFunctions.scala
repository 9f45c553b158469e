package graft.functions

import graft.core.Hash128
import java.nio.charset.StandardCharsets

/** Deterministic text analysis for web-scale training-data pipelines.
  *
  * Every function here is a pure function of its input bytes/string —
  * no locale, no RNG, no library versions — because the north rule pins
  * "byte-identical per-url extracted text" as a per-row invariant and
  * the synthetic webpages generator stores `text = extractText(html)`
  * at generation time, making any nondeterminism a test failure.
  */
object TextFunctions {

  /** HTML -> text: UTF-8 decode, drop tags (including script/style
    * content), decode the five named entities + numeric entities,
    * collapse whitespace runs to single spaces, trim. */
  def extractText(html: Array[Byte]): String = {
    if (html == null) return null
    val s = new String(html, StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    var lastWasSpace = true // leading whitespace trimmed
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        // find tag end; handle script/style by skipping to closing tag
        val close = s.indexOf('>', i + 1)
        if (close < 0) { i = n } // unterminated tag: drop rest
        else {
          val tag = s.substring(i + 1, close).trim.toLowerCase
          val name = tag.takeWhile(ch => ch.isLetter)
          if (name == "script" || name == "style") {
            val end = s.toLowerCase.indexOf(s"</$name", close + 1)
            i = if (end < 0) n else {
              val e2 = s.indexOf('>', end)
              if (e2 < 0) n else e2 + 1
            }
          } else i = close + 1
          // tags act as word separators
          if (!lastWasSpace) { sb.append(' '); lastWasSpace = true }
        }
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 8) {
          val ent = s.substring(i + 1, semi)
          val decoded: Int = ent match {
            case "amp"  => '&'
            case "lt"   => '<'
            case "gt"   => '>'
            case "quot" => '"'
            case "apos" => '\''
            case "nbsp" => ' '
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try Integer.parseInt(e.substring(2), 16) catch { case _: NumberFormatException => -1 }
            case e if e.startsWith("#") =>
              try Integer.parseInt(e.substring(1)) catch { case _: NumberFormatException => -1 }
            case _ => -1
          }
          if (decoded >= 0) {
            val isWs = decoded == ' '
            if (isWs) { if (!lastWasSpace) { sb.append(' '); lastWasSpace = true } }
            else { sb.appendCodePoint(decoded); lastWasSpace = false }
            i = semi + 1
          } else { sb.append(c); lastWasSpace = false; i += 1 }
        } else { sb.append(c); lastWasSpace = false; i += 1 }
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\u000B' || c == '\f') {
        if (!lastWasSpace) { sb.append(' '); lastWasSpace = true }
        i += 1
      } else {
        sb.append(c)
        lastWasSpace = false
        i += 1
      }
    }
    // trim trailing space
    var end = sb.length
    while (end > 0 && sb.charAt(end - 1) == ' ') end -= 1
    sb.substring(0, end)
  }

  // ------------------------------------------------------ language ID

  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "his", "on", "be", "at", "by", "had", "not", "are"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "un", "une", "du", "en", "est", "que", "qui", "dans", "pour", "pas", "sur", "avec", "au", "ce"),
    "es" -> Set("el", "la", "los", "las", "de", "y", "que", "en", "un", "una", "es", "del", "se", "por", "con", "para", "su", "al", "lo", "como"),
    "de" -> Set("der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit", "sich", "des", "auf", "für", "ein", "eine", "nicht", "als", "auch", "es"),
  )

  /** N-gram/stopword language heuristic over {en,fr,es,zh,de}.
    * CJK-codepoint ratio decides zh; otherwise the language whose
    * stopword set hits the most tokens (ties broken by fixed order). */
  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var letters = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        letters += 1
        val b = Character.UnicodeScript.of(c)
        if (b == Character.UnicodeScript.HAN || b == Character.UnicodeScript.HIRAGANA ||
            b == Character.UnicodeScript.KATAKANA) cjk += 1
      }
      i += 1
    }
    if (letters > 0 && cjk.toDouble / letters > 0.3) return "zh"
    val tokens = text.toLowerCase.split("[^\\p{L}]+")
    val order = Seq("en", "fr", "es", "de")
    var best = "und"
    var bestScore = 0
    for (lang <- order) {
      val sw = stopwords(lang)
      val score = tokens.count(sw.contains)
      if (score > bestScore) { best = lang; bestScore = score }
    }
    best
  }

  // -------------------------------------------------- quality scoring

  /** Composite document quality in [0,1]: blend of length signal,
    * alphabetic ratio, punctuation ratio sanity, mean-word-length
    * sanity, and repetition (distinct-token ratio). Deterministic. */
  def qualityScore(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    val len = text.length
    var alpha = 0
    var punct = 0
    var i = 0
    while (i < len) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) alpha += 1
      else if (!Character.isWhitespace(c) && !Character.isDigit(c)) punct += 1
      i += 1
    }
    val tokens = text.split(' ')
    val nTok = tokens.length
    val meanWordLen = if (nTok == 0) 0.0 else tokens.map(_.length).sum.toDouble / nTok
    val distinctRatio = if (nTok == 0) 0.0 else tokens.distinct.length.toDouble / nTok
    val lengthSignal = math.min(1.0, len / 500.0)
    val alphaRatio = alpha.toDouble / len
    val punctPenalty = math.max(0.0, 1.0 - 4.0 * punct.toDouble / len)
    val wordLenSanity = if (meanWordLen >= 2.5 && meanWordLen <= 12.0) 1.0 else 0.5
    val score = 0.25 * lengthSignal + 0.25 * alphaRatio + 0.2 * punctPenalty +
      0.15 * wordLenSanity + 0.15 * math.min(1.0, distinctRatio * 2.0)
    math.max(0.0, math.min(1.0, score))
  }

  // ----------------------------------------------------- tokenization

  /** Whitespace token count. */
  def tokenCount(text: String): Int =
    if (text == null || text.isEmpty) 0
    else {
      var count = 0
      var inTok = false
      var i = 0
      while (i < text.length) {
        val ws = Character.isWhitespace(text.charAt(i))
        if (!ws && !inTok) { count += 1; inTok = true }
        else if (ws) inTok = false
        i += 1
      }
      count
    }

  private val bpeish = java.util.regex.Pattern.compile(
    "[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]")

  /** BPE-ish token count: letter runs, digit runs, and single
    * punctuation marks — a deterministic proxy for subword tokenizers. */
  def bpeishTokenCount(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    val m = bpeish.matcher(text)
    var count = 0
    while (m.find()) count += 1
    count
  }

  /** Occurrence count of the single most frequent n-token gram in the
    * document — the Gopher-style repetition quality signal: the
    * fraction topNgramCount / (tokens - n + 1) flags boilerplate and
    * degenerate repetition (nav bars, keyword stuffing, generation
    * loops). Tokenization matches the shingle/decontamination kernels:
    * trim, lowercase, split on whitespace runs; texts shorter than n
    * tokens score 0. Per-row and allocation-bounded by the doc's own
    * distinct n-grams — no shuffle, no cross-row state. */
  def topNgramCount(text: String, n: Int): Int = {
    if (text == null || n < 1) return 0
    val toks = text.trim.toLowerCase.split("\\s+")
    if (toks.length < n) return 0
    val m = new java.util.HashMap[String, Integer]()
    var max = 0
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val c = m.merge(sb.toString, 1, (a, b) => a + b)
      if (c > max) max = c
      i += 1
    }
    max
  }

  // -------------------------------------------------- fingerprinting

  /** 64-bit rolling polynomial fingerprint of the text (content hash for
    * exact dedup and chunk lineage). */
  def fingerprint(text: String): Long = {
    if (text == null) return 0L
    var h = 1125899906842597L // prime
    var i = 0
    while (i < text.length) { h = 31 * h + text.charAt(i); i += 1 }
    h
  }

  /** First 16 hex chars (8 bytes) of the md5 of the UTF-8 text — the
    * winnowing gram hash. md5, not Hash128: the same choice the
    * md5-threshold sampling and PII oracles made, so the whole
    * fingerprint construction is reproducible verbatim in any engine
    * with md5 (the DuckDB oracle recomputes it exactly). */
  private val tlMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def md5Hex16(s: String): String = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    md5Hex16(b, 0, b.length)
  }

  /** md5 hex prefix over a byte RANGE — the winnowing hot loop feeds
    * gram windows of the normalized bytes directly (no per-gram
    * substring + getBytes copies; digest instance reused per thread). */
  private def md5Hex16(bytes: Array[Byte], off: Int, len: Int): String = {
    val md = tlMd5.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i < 8) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    * the MOSS algorithm): hash every character k-gram of the
    * normalized text (lowercased, non-alphanumerics stripped — the
    * standard winnowing preprocessing), then keep the MINIMUM hash of
    * each sliding window of w consecutive grams, distinct.
    *
    * The selection guarantee that makes this the local fingerprinting
    * scheme: any substring match of length >= w + k - 1 between two
    * documents yields at least one SHARED fingerprint (both windows
    * over the common region select the same minimum), while expected
    * density is only 2/(w+1) of the grams — position-robust overlap
    * detection at a fraction of the full gram set, which is what the
    * exact-shingle decontamination sweep cannot give under edits.
    * Hash ties select one fingerprint VALUE regardless of position, so
    * the distinct fingerprint SET is tie-order independent (the
    * property the cross-engine oracle relies on).
    *
    * Defaults k=16, w=8: on a Zipf small-vocab corpus short grams are
    * corpus-common and the window-min favors globally small hashes, so
    * k=8 fingerprints mostly landed in ubiquitous buckets (measured:
    * the bucket filter then broke planted recall); 16-char grams (~3
    * tokens) are doc-specific, guarantee threshold w+k-1 = 23
    * normalized chars, density 2/(w+1) ~ 22% of grams.
    *
    * Edge conventions (spec-pinned): null/empty-normalized -> empty;
    * shorter than k -> the whole-text hash; fewer than w grams -> one
    * fingerprint (min over all grams). O(p) via a monotonic deque.
    * Per-row, no shuffle; ~p md5 calls per doc. */
  def winnowFingerprints(text: String, k: Int = 16, w: Int = 8): Array[String] = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    if (text == null) return Array.empty
    val norm = normalizeAlnum(text)
    if (norm.isEmpty) return Array.empty
    if (norm.length < k) return Array(md5Hex16(norm))
    val p = norm.length - k + 1
    // normalized text is pure [a-z0-9], so chars ARE the UTF-8 bytes:
    // hash gram windows of one byte array instead of p substring copies
    val nb = norm.getBytes(StandardCharsets.UTF_8)
    val grams = new Array[String](p)
    var i = 0
    while (i < p) { grams(i) = md5Hex16(nb, i, k); i += 1 }
    val eff = math.min(w, p)
    val out = new scala.collection.mutable.LinkedHashSet[String]
    val dq = new java.util.ArrayDeque[Int]
    i = 0
    while (i < p) {
      // pop >= (not >): on ties the min VALUE is unchanged either way
      while (!dq.isEmpty && grams(dq.peekLast) >= grams(i)) dq.pollLast()
      dq.addLast(i)
      if (dq.peekFirst <= i - eff) dq.pollFirst()
      if (i >= eff - 1) out += grams(dq.peekFirst)
      i += 1
    }
    out.toArray
  }

  /** Winnowing preprocessing: lowercase, strip every non-alphanumeric
    * (whitespace, punctuation, markup residue) so fingerprints survive
    * reflowing/reformatting. ASCII-range semantics match Spark's
    * lower() + regexp_replace and DuckDB's — the corpus is ASCII. */
  def normalizeAlnum(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') sb.append(c)
      else if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      i += 1
    }
    sb.toString
  }

  /** 64-bit SimHash over whitespace tokens (near-dup detection: small
    * Hamming distance ~ high cosine similarity of token sets). */
  def simhash(text: String): Long = {
    if (text == null || text.isEmpty) return 0L
    val counts = new Array[Int](64)
    val tokens = text.split(' ')
    var t = 0
    while (t < tokens.length) {
      val h = Hash128.hash64(tokens(t), 0x51)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  /** Word n-gram shingles (for MinHash / Jaccard). */
  def shingles(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    val tokens = text.split(' ').filter(_.nonEmpty)
    if (tokens.length < n) return if (tokens.isEmpty) Array.empty else Array(tokens.mkString(" "))
    (0 to tokens.length - n).map(i => tokens.slice(i, i + n).mkString(" ")).toArray
  }

  /** MinHash signature: k 64-bit minima over derived hash functions. */
  def minhash(text: String, numHashes: Int, shingleN: Int): Array[Long] = {
    val sh = shingles(text, shingleN)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val h = Hash128.hashString(sh(i), 0x77)
      var j = 0
      while (j < numHashes) {
        val v = h.derived(j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** Estimated Jaccard from two MinHash signatures. */
  def minhashJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    var same = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }

  /** Exact n-gram Jaccard similarity. */
  def ngramJaccard(a: String, b: String, n: Int): Double = {
    val sa = shingles(a, n).toSet
    val sb = shingles(b, n).toSet
    if (sa.isEmpty && sb.isEmpty) return 1.0
    val inter = sa.intersect(sb).size
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
