package graft.data

import graft.core.Hash128
import graft.functions.TextFunctions
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

/** A Common-Crawl-style web page row — the exact shape pinned by
  * BASELINE.json:input_hint: (url, warc_ts, html, text, lang). */
case class WebPage(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** Deterministic synthetic webpages generator (FIXTURES.md §1).
  *
  * Every field is a pure function of (row id, fixed seed) — any row is
  * reproducible in isolation, so the table is identical across runs,
  * partitionings, and parallelism levels. Key properties engineered in:
  *
  *  - hosts follow a Zipf(s=1.1) distribution over `numHosts` synthetic
  *    hosts, so groupBy(host) is genuinely skewed (exercises the salted
  *    two-stage aggregation the north rule mandates);
  *  - token frequencies are Zipf-skewed over a per-language vocabulary
  *    whose head is that language's stopword list (heavy hitters exist
  *    for CMS; lang_id has real signal; zh uses CJK codepoints);
  *  - `text` is `TextFunctions.extractText(html)` applied AT GENERATION
  *    TIME — the stored column and any later re-extraction must match
  *    byte-for-byte (the north rule's per-row invariant);
  *  - written as parquet partitioned by `lang` (the Iceberg-shaped
  *    layout; no Iceberg jars exist in this sandbox — SURVEY.md §A.2).
  */
object WebPagesGen {

  val Seed = 42L
  val Langs: Array[String] = Array("en", "fr", "es", "zh", "de")
  private val LangCum = Array(0.40, 0.55, 0.70, 0.85, 1.0)

  /** Per-language vocabulary: stopword head (most frequent under Zipf)
    * + shared synthetic tail. Sorted heads for determinism. */
  private lazy val vocabs: Map[String, Array[String]] = {
    val syll = Array("ba", "co", "di", "fu", "ga", "he", "ji", "ka", "lo", "mu",
      "na", "pe", "qi", "ro", "su", "ta", "vu", "wa", "xe", "zo")
    val base = (0 until 480).map { i =>
      val a = syll(i % 20); val b = syll((i / 20) % 20); val c = syll((i / 400) % 20)
      if (i < 400) a + b else a + b + c
    }.toArray
    val sw = Map(
      "en" -> Array("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "his", "on", "be", "at", "by", "had", "not", "are"),
      "fr" -> Array("le", "la", "les", "de", "des", "et", "un", "une", "du", "en", "est", "que", "qui", "dans", "pour", "pas", "sur", "avec", "au", "ce"),
      "es" -> Array("el", "la", "los", "las", "de", "y", "que", "en", "un", "una", "es", "del", "se", "por", "con", "para", "su", "al", "lo", "como"),
      "de" -> Array("der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit", "sich", "des", "auf", "für", "ein", "eine", "nicht", "als", "auch", "es"),
      "zh" -> (0x4e00 until 0x4e00 + 20).map(cp => new String(Character.toChars(cp))).toArray,
    )
    sw.map { case (lang, head) =>
      lang -> (head ++ (if (lang == "zh")
        (0 until 480).map(i => new String(Character.toChars(0x4e20 + i))).toArray
      else base))
    }
  }

  /** Zipf(s) CDF over ranks 0..n-1. */
  private[data] def zipfCdf(n: Int, s: Double): Array[Double] = {
    val w = new Array[Double](n)
    var sum = 0.0
    var i = 0
    while (i < n) { w(i) = 1.0 / math.pow((i + 1).toDouble, s); sum += w(i); i += 1 }
    val cdf = new Array[Double](n)
    var acc = 0.0
    i = 0
    while (i < n) { acc += w(i) / sum; cdf(i) = acc; i += 1 }
    cdf(n - 1) = 1.0
    cdf
  }

  @inline private def uniform(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  @inline private def pick(cdf: Array[Double], u: Double): Int = {
    val idx = java.util.Arrays.binarySearch(cdf, u)
    if (idx >= 0) idx else math.min(cdf.length - 1, -idx - 1)
  }

  private def base36(v: Long): String = java.lang.Long.toUnsignedString(v, 36)

  /** The row function: fully deterministic per id. */
  def rowFor(id: Long, hostCdf: Array[Double], tokenCdf: Array[Double]): WebPage = {
    val h0 = Hash128.hashLong(id, Seed)
    val lang = Langs(pick(LangCum, uniform(h0.derived(1))))
    val host = s"h${pick(hostCdf, uniform(h0.derived(2)))}.example.org"
    val url = s"https://$host/${base36(h0.derived(3))}-${base36(id)}"
    // warc_ts uniform over 2024 (UTC), microsecond granularity
    val t0 = 1704067200000L // 2024-01-01T00:00:00Z
    val span = 31622400000L // 366 days in ms
    val ts = new java.sql.Timestamp(t0 + (uniform(h0.derived(4)) * span).toLong)
    // paragraphs: 1..5, each 20..80 Zipf-picked tokens
    val vocab = vocabs(lang)
    val hTok = Hash128.hashLong(id, Seed + 1)
    val nPara = 1 + (uniform(hTok.derived(1)) * 5).toInt.min(4)
    val sb = new StringBuilder(1024)
    sb.append("<html><head><title>")
    sb.append(vocab(pick(tokenCdf, uniform(hTok.derived(2)))))
    sb.append(' ')
    sb.append(base36(id))
    sb.append("</title></head><body>")
    var p = 0
    var tokCounter = 0
    while (p < nPara) {
      sb.append("<p>")
      val hPara = Hash128.hashLong(id * 31 + p, Seed + 2)
      val nTok = 20 + (uniform(hPara.derived(1)) * 61).toInt.min(60)
      var t = 0
      while (t < nTok) {
        if (t > 0) sb.append(' ')
        val hT = hPara.derived(2 + tokCounter)
        sb.append(vocab(pick(tokenCdf, uniform(hT))))
        tokCounter += 1
        t += 1
      }
      sb.append("</p>")
      p += 1
    }
    sb.append("</body></html>")
    val html = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val text = TextFunctions.extractText(html)
    WebPage(url, ts, html, text, lang)
  }

  /** Generate n rows as a Dataset (no files). */
  def dataset(spark: SparkSession, n: Long, numHosts: Int = 10000,
              numPartitions: Int = 0): Dataset[WebPage] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val hostCdf = zipfCdf(numHosts, 1.1)
    val tokenCdf = zipfCdf(500, 1.05)
    spark.range(0L, n, 1L, parts).mapPartitions { it =>
      it.map(id => rowFor(id, hostCdf, tokenCdf))
    }
  }

  /** Member/non-member probe urls (disjoint id ranges; FIXTURES.md §1). */
  def probeUrls(spark: SparkSession, n: Long, member: Boolean,
                numHosts: Int = 10000): Dataset[String] = {
    import spark.implicits._
    val hostCdf = zipfCdf(numHosts, 1.1)
    val offset = if (member) 0L else 1000000000000L // never-generated id range
    spark.range(0L, n).map { i =>
      val id = i + offset
      val h0 = Hash128.hashLong(id, Seed)
      val host = s"h${pick(hostCdf, uniform(h0.derived(2)))}.example.org"
      s"https://$host/${base36(h0.derived(3))}-${base36(id)}"
    }
  }

  /** Write (or reuse) the parquet table, partitioned by lang. The
    * reuse check goes through the Hadoop FileSystem API so it resolves
    * against the same (possibly distributed) filesystem the write
    * targets — a driver-local java.io.File check would silently
    * re-generate on any cluster whose storage is not the driver's
    * local disk. */
  def ensureTable(spark: SparkSession, path: String, n: Long,
                  numHosts: Int = 10000): String = {
    val done = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(done)) {
      dataset(spark, n, numHosts)
        .write.mode(SaveMode.Overwrite)
        // zstd over snappy: the 32M-row table shrinks 21 -> 13 GB,
        // which converts page-cached scan DRAM traffic (the shared,
        // non-scaling resource at 32 threads on one socket) into
        // decode CPU (which scales): text-scan phases measured
        // 10-15% faster at BOTH parallelism levels and +0.09 absolute
        // 8->32 efficiency (PLAN15). 32MB row groups cap partitionBy
        // writer buffering (5 langs x tasks x one buffered row group
        // each measured as an OOM at the 128MB default).
        .option("compression", "zstd")
        .option("parquet.block.size", (32 * 1024 * 1024).toString)
        .partitionBy("lang")
        .parquet(path)
    }
    path
  }
}
