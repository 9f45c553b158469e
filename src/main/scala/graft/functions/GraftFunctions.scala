package graft.functions

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** Session registration for the graft sketch library.
  *
  * `Graft.ensure(spark)` is idempotent per session: registers every
  * aggregate and scalar function for both the Column API and SQL, and
  * tunes the one Catalyst config that matters for object-buffer
  * aggregation at scale (SURVEY.md §4): the ObjectHashAggregate
  * sort-based fallback threshold, which defaults to 128 distinct groups
  * per task — far below the per-task (lang, host) group counts this
  * engine aggregates — and would silently degrade partial aggregation
  * to sort-based with per-group spill churn.
  */
object Graft {

  val SketchSeed = 42L

  def ensure(spark: SparkSession): SparkSession = synchronized {
    if (!spark.conf.getOption("graft.registered").contains("true")) {
      // object-agg groups per task routinely exceed the 128 default;
      // sort-based fallback would serialize buffers per row
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      registerAll(spark)
      // literal-sketch probes rewrite to a once-per-task deserialized
      // native expression (see ReplaceLiteralEbfProbe); also available
      // config-only via spark.sql.extensions=graft.plans.GraftExtensions
      if (!spark.experimental.extraOptimizations.contains(graft.plans.ReplaceLiteralEbfProbe)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.ReplaceLiteralEbfProbe
      }
      // opt-in EBF semi-join reduction (fires only when
      // spark.graft.joinPrune.enabled=true; see EbfJoinPruneRule)
      if (!spark.experimental.extraOptimizations.contains(graft.plans.EbfJoinPruneRule)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.EbfJoinPruneRule
      }
      // opt-in COUNT(DISTINCT) -> HLL estimate (fires only when
      // spark.graft.approxDistinct.enabled=true; CHANGES RESULTS to a
      // bounded estimate — see ApproxDistinctRewriteRule)
      if (!spark.experimental.extraOptimizations.contains(graft.plans.ApproxDistinctRewriteRule)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.ApproxDistinctRewriteRule
      }
      // opt-in exact percentile/median -> KLL estimate (fires only when
      // spark.graft.approxPercentile.enabled=true; CHANGES RESULTS to a
      // rank-bounded estimate — see ApproxPercentileRewriteRule)
      if (!spark.experimental.extraOptimizations.contains(graft.plans.ApproxPercentileRewriteRule)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.ApproxPercentileRewriteRule
      }
      // opt-in mode(x) -> Misra-Gries top-1 (fires only when
      // spark.graft.approxMode.enabled=true; exact below capacity,
      // heavy-hitter estimate beyond — see ApproxModeRewriteRule)
      if (!spark.experimental.extraOptimizations.contains(graft.plans.ApproxModeRewriteRule)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.ApproxModeRewriteRule
      }
      // opt-in top-k-by-count -> Misra-Gries (fires only when
      // spark.graft.approxTopK.enabled=true; exact below capacity,
      // heavy-hitter estimate beyond — see ApproxTopKRewriteRule)
      if (!spark.experimental.extraOptimizations.contains(graft.plans.ApproxTopKRewriteRule)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.ApproxTopKRewriteRule
      }
      // native codegen'd SQL expressions (the UDF registry can't host
      // Expression builders; goes through the sessionState shim)
      val natives = Seq(
        graft.plans.Hash128Expr.sqlDescriptor("graft_hash128_h1", 0),
        graft.plans.Hash128Expr.sqlDescriptor("graft_hash128_h2", 1),
        graft.plans.GraftShardExpr.sqlDescriptor,
        graft.plans.ZOrderKeyExpr.sqlDescriptor)
      for ((id, info, builder) <- natives)
        org.apache.spark.sql.graftshim.FunctionShim.register(spark, id.funcName, info, builder)
      spark.conf.set("graft.registered", "true")
    }
    spark
  }

  def registerAll(spark: SparkSession): Unit = {
    import SketchAggregators._
    val r = spark.udf

    // build aggregators (default parameters; parameterized variants can
    // be constructed directly via the Column API)
    r.register("ebf_agg", udaf(new EbfAgg(Ebf.DefaultM0, Ebf.DefaultK, Ebf.DefaultL0,
      Ebf.DefaultAlphaNum, Ebf.DefaultAlphaDen, SketchSeed)))
    r.register("hll_agg", udaf(new HllAgg(Hll.DefaultP, SketchSeed)))
    r.register("theta_agg", udaf(new ThetaAgg(Theta.DefaultK, SketchSeed)))
    r.register("cms_agg", udaf(new CmsAgg(Cms.DefaultDepth, Cms.DefaultWidth, SketchSeed)))
    // O79: Count Sketch, the unbiased/turnstile frequency sketch
    r.register("cs_agg", udaf(new CountSketchAgg(
      CountSketch.DefaultDepth, CountSketch.DefaultWidth, SketchSeed)))
    r.register("cs_tokens_agg", udaf(new CsTokensAgg(
      CountSketch.DefaultDepth, CountSketch.DefaultWidth, SketchSeed)))
    // O68: time-decayed CMS, 1-hour half-life (lambda = ln2/3600);
    // other half-lives go through the Column API with a custom udaf
    r.register("dcms_agg", udaf(new DecayedCmsAgg(
      DecayedCms.DefaultDepth, DecayedCms.DefaultWidth, SketchSeed, math.log(2.0) / 3600.0)))
    r.register("cms_tokens_agg", udaf(new CmsTokensAgg(Cms.DefaultDepth, Cms.DefaultWidth, SketchSeed)))
    r.register("kll_agg", udaf(new KllAgg(Kll.DefaultK)))
    r.register("tdigest_agg", udaf(new TDigestAgg(TDigest.DefaultCompression)))
    r.register("tdigest_weighted_agg", udaf(new TDigestWeightedAgg(TDigest.DefaultCompression)))
    r.register("topk_agg", udaf(new TopKAgg(FreqSketch.DefaultCapacity)))
    r.register("topk_tokens_agg", udaf(new TopKTokensAgg(FreqSketch.DefaultCapacity)))
    r.register("cms_topk_tokens_agg", udaf(new CmsTopkTokensAgg(
      Cms.DefaultDepth, Cms.DefaultWidth, FreqSketch.DefaultCapacity, SketchSeed)))
    // O73: grouped uniform sampling as a mergeable aggregate (k smallest
    // md5(key) of the distinct-key set — deterministic, cross-engine
    // exact); other k go through the Column API with a custom udaf
    r.register("sample_agg", udaf(new BottomKAgg(BottomKSample.DefaultK)))

    // merge aggregators (sketch-bytes -> sketch-bytes re-aggregation)
    r.register("ebf_merge_agg", udaf(new EbfMergeAgg))
    r.register("hll_merge_agg", udaf(new HllMergeAgg))
    r.register("theta_merge_agg", udaf(new ThetaMergeAgg))
    r.register("cms_merge_agg", udaf(new CmsMergeAgg))
    r.register("dcms_merge_agg", udaf(new DecayedCmsMergeAgg))
    r.register("kll_merge_agg", udaf(new KllMergeAgg))
    r.register("tdigest_merge_agg", udaf(new TDigestMergeAgg))
    r.register("topk_merge_agg", udaf(new TopKMergeAgg))
    r.register("sample_merge_agg", udaf(new BottomKMergeAgg))
    r.register("cs_merge_agg", udaf(new CountSketchMergeAgg))

    // scalar functions over serialized sketches. Each deserializes via a
    // per-thread cache keyed by content hash, so probing N rows against
    // one broadcast sketch deserializes once per task, not once per row.
    // null-guarded to mirror the aggregators' null-skipping: a null key
    // is never inserted, so probing one answers "not a member" rather
    // than NPE-ing (build/probe symmetry on tables with null keys)
    r.register("ebf_might_contain",
      (sk: Array[Byte], key: String) =>
        sk != null && key != null && SketchCache.ebf(sk).mightContain(key))
    r.register("ebf_expand", (sk: Array[Byte]) => {
      val e = Ebf.fromBytes(sk); e.expand(); e.toBytes
    })
    r.register("ebf_compress", (sk: Array[Byte]) => {
      val e = Ebf.fromBytes(sk); e.compress(); e.toBytes
    })
    r.register("ebf_delete", (sk: Array[Byte], key: String) => {
      val e = Ebf.fromBytes(sk); e.delete(key); e.toBytes
    })
    r.register("ebf_info", (sk: Array[Byte]) => {
      val e = SketchCache.ebf(sk)
      EbfInfo(e.level, e.numBuckets, e.n, e.bitsSet, e.fpWidth, e.fprBound, sk.length)
    })
    r.register("ebf_fpr", (sk: Array[Byte]) => SketchCache.ebf(sk).fprBound)
    // deterministic shard router (same function drives groupBy-side
    // sharding and probe-side routing of the sharded EBF); null keys
    // route to a null shard so they join no shard and probe as misses
    // instead of NPE-ing. Registered as a NATIVE codegen'd expression
    // (GraftShardExpr) — the router sits on the map side of every
    // shard build/probe, where a UDF would break whole-stage codegen.
    r.register("hll_estimate", (sk: Array[Byte]) => SketchCache.hll(sk).estimate)
    // O73 extractors: retained sample keys (canonical hash order) and
    // the retained count. Reads only — cached instances stay unmutated.
    r.register("sample_keys", (sk: Array[Byte]) => SketchCache.bks(sk).keys.toSeq)
    r.register("sample_size", (sk: Array[Byte]) => SketchCache.bks(sk).size)
    // O72: winnowing fingerprints as a SQL surface (the Column/library
    // paths use TextFunctions directly)
    r.register("winnow_fingerprints", (text: String, k: Int, w: Int) =>
      TextFunctions.winnowFingerprints(text, k, w).toSeq)
    // O46 theta set algebra. Estimates round to LONG (hll_estimate
    // convention). The set-op functions deserialize through the cache
    // (loaded sketches are canonical: compact() is a no-op, so the
    // shared instances are never mutated); theta_union builds a FRESH
    // left operand because merge mutates the receiver.
    r.register("theta_estimate",
      (sk: Array[Byte]) => math.rint(SketchCache.theta(sk).estimate).toLong)
    r.register("theta_intersect_estimate", (a: Array[Byte], b: Array[Byte]) =>
      math.rint(SketchCache.theta(a).intersectEstimate(SketchCache.theta(b))).toLong)
    r.register("theta_diff_estimate", (a: Array[Byte], b: Array[Byte]) =>
      math.rint(SketchCache.theta(a).differenceEstimate(SketchCache.theta(b))).toLong)
    r.register("theta_jaccard", (a: Array[Byte], b: Array[Byte]) =>
      SketchCache.theta(a).jaccardEstimate(SketchCache.theta(b)))
    r.register("theta_union", (a: Array[Byte], b: Array[Byte]) =>
      Theta.fromBytes(a).merge(SketchCache.theta(b)).toBytes)
    // null key -> 0: never inserted, so its count is zero (build/probe
    // symmetry, same rationale as ebf_might_contain's null guard; the
    // literal-sketch rewrite mirrors this exactly — SketchScalarKinds)
    r.register("cms_estimate",
      (sk: Array[Byte], key: String) =>
        if (key == null) 0L else SketchCache.cms(sk).estimate(key))
    r.register("cms_total", (sk: Array[Byte]) => SketchCache.cms(sk).total)
    // equi-join size estimate from two sketches alone (row-wise dot
    // product, min over rows): never under-estimates, within
    // eps*totalA*totalB whp — sketch-driven join planning
    r.register("cms_inner_product",
      (a: Array[Byte], b: Array[Byte]) => SketchCache.cms(a).innerProduct(SketchCache.cms(b)))
    // O79 Count Sketch scalars: the estimators are signed/unbiased —
    // cs_estimate can read negative on a never-inserted key (CMS
    // cannot); null key -> 0 for build/probe symmetry as above. The
    // inner-product / F2 estimators are the AMS unbiased join-size /
    // self-join-size estimators (Double: real-valued by nature, and a
    // signed Long row-dot would wrap at 10^12-row totals).
    r.register("cs_estimate",
      (sk: Array[Byte], key: String) =>
        if (key == null) 0L else SketchCache.cs(sk).estimate(key))
    r.register("cs_total", (sk: Array[Byte]) => SketchCache.cs(sk).total)
    r.register("cs_inner_product",
      (a: Array[Byte], b: Array[Byte]) => SketchCache.cs(a).innerProduct(SketchCache.cs(b)))
    r.register("cs_f2", (sk: Array[Byte]) => SketchCache.cs(sk).f2)
    r.register("dcms_estimate",
      (sk: Array[Byte], key: String, tNow: Double) =>
        if (key == null) 0.0 else SketchCache.dcms(sk).estimate(key, tNow))
    r.register("dcms_total",
      (sk: Array[Byte], tNow: Double) => SketchCache.dcms(sk).totalAt(tNow))
    r.register("kll_quantile",
      (sk: Array[Byte], q: Double) => SketchCache.kll(sk).quantile(q))
    r.register("kll_rank",
      (sk: Array[Byte], v: Double) => SketchCache.kll(sk).rank(v))
    // equi-height histogram export (the ANALYZE-stats / CBO role):
    // B buckets at the i/B quantiles of ONE mergeable sketch — where
    // an exact equi-height histogram needs a full sort or Spark's
    // sampling-based percentile pass per column. Boundaries are
    // deterministic (KLL compaction is); rows_est comes from rank
    // differences of the boundary values, which TELESCOPE: masses
    // sum to n (up to per-bucket rounding), and a heavy tied value
    // that duplicates boundaries puts all its mass in the FIRST
    // bucket ending at that value (rank is <=-based), leaving the
    // duplicate-boundary buckets empty rather than smearing n/B
    // into them. Each boundary carries the sketch's rank error, so
    // a bucket's true mass is within n/B +- 2*eps*n (gated in
    // kll_histogram_check).
    r.register("kll_histogram", (sk: Array[Byte], b: Int) => {
      require(b >= 1 && b <= 100000, s"bucket count out of range: $b")
      val k = SketchCache.kll(sk)
      if (k.n == 0L) Array.empty[HistBucket]
      else {
        val qs = Array.tabulate(b + 1)(i => k.quantile(i.toDouble / b))
        Array.tabulate(b) { i =>
          val rLo = if (i == 0) 0.0 else k.rank(qs(i))
          val rHi = if (i == b - 1) 1.0 else k.rank(qs(i + 1))
          HistBucket(i, qs(i), qs(i + 1), math.round((rHi - rLo) * k.n))
        }
      }
    })
    r.register("tdigest_quantile",
      (sk: Array[Byte], q: Double) => SketchCache.td(sk).quantile(q))
    r.register("tdigest_cdf",
      (sk: Array[Byte], v: Double) => SketchCache.td(sk).cdf(v))
    // heavy-hitter extractors: enumerate the sketch's own candidate set
    // (array of (item, lower-bound estimate), est desc / item asc)
    r.register("topk_items", (sk: Array[Byte], k: Int) =>
      SketchCache.freq(sk).topK(k).map { case (item, est) => TopKItem(item, est) })
    r.register("topk_estimate",
      (sk: Array[Byte], item: String) =>
        if (item == null) 0L else SketchCache.freq(sk).estimate(item))
    r.register("topk_error", (sk: Array[Byte]) => SketchCache.freq(sk).maxError)

    // text / web functions
    r.register("extract_text", (html: Array[Byte]) => TextFunctions.extractText(html))
    r.register("lang_id", (text: String) => TextFunctions.langId(text))
    r.register("quality_score", (text: String) => TextFunctions.qualityScore(text))
    r.register("token_count", (text: String) => TextFunctions.tokenCount(text))
    r.register("bpe_token_count", (text: String) => TextFunctions.bpeishTokenCount(text))
    r.register("doc_fingerprint", (text: String) => TextFunctions.fingerprint(text))
    r.register("top_ngram_count", (text: String, n: Int) => TextFunctions.topNgramCount(text, n))
    r.register("simhash64", (text: String) => TextFunctions.simhash(text))
    r.register("hamming64", (a: Long, b: Long) => java.lang.Long.bitCount(a ^ b))
  }

  /** Probe UDF over a BROADCAST sketch: the E2 pattern — sketch built
    * once, shipped via TorrentBroadcast (deserialized once per executor
    * JVM, through the compact wire format thanks to BytesSerde), zero
    * per-row and zero per-task deserialization. A plain closure capture
    * would instead re-ship and re-deserialize the sketch inside every
    * task binary — measured as the dominant cost of the probe phase at
    * 10^6 rows. Preferred over `ebf_might_contain(lit(bytes), col)` in
    * hot probe paths. */
  def ebfProbe(spark: SparkSession, sketch: Ebf): UserDefinedFunction = {
    val bc = spark.sparkContext.broadcast(sketch)
    // null key -> miss, not NPE: a null was never inserted (the
    // aggregators skip nulls), mirroring ebf_might_contain's guard —
    // and an inner join would drop the null-key row anyway, which is
    // what makes JoinPrune's null handling exact
    org.apache.spark.sql.functions.udf(
      (key: String) => key != null && bc.value.mightContain(key))
  }
}

/** Output row of `ebf_info` — the "sketch-size/FPR metrics" the north
  * star requires jobs to carry. */
case class EbfInfo(level: Int, numBuckets: Int, n: Long, bitsSet: Int,
                   fpWidth: Int, fprBound: Double, sizeBytes: Int)

/** Output element of `topk_items`. */
case class TopKItem(item: String, est: Long)

/** Output element of `kll_histogram` — one equi-height bucket. */
case class HistBucket(bucket: Int, lo: Double, hi: Double, rows_est: Long)

/** Per-thread deserialized-sketch cache. Sketch bytes arriving from a
  * Column are re-materialized per row by the UDF boundary, so identity
  * caching fails; instead the key is (length, murmur128 of up to four
  * 256-byte windows) — O(1) regardless of sketch size, so probing rows
  * against multi-MB sketches doesn't hash the whole blob per row. The
  * windows cover header (with n and level), middle and tail; two
  * *distinct* sketches colliding on all four windows AND length is
  * negligible for cache-keying within a query. */
object SketchCache {
  // `token` (the deserialized class) is part of the identity: the same
  // byte blob probed as two different sketch types must never serve one
  // type's cached instance for the other (the tlLast fast path would
  // otherwise asInstanceOf-throw; the content-keyed map had the same
  // latent hazard)
  private final case class Key(len: Int, h1: Long, h2: Long, token: Class[_])
  // bytes kept alongside the deserialized value: a hit is confirmed with
  // Arrays.equals before being served, so two distinct sketches whose
  // differences all fall outside the sampled hash windows can never
  // alias to each other's deserialized form (deserialization — the
  // expensive part — is still skipped on a genuine hit)
  private final case class Entry(bytes: Array[Byte], value: AnyRef)

  private val tl = new ThreadLocal[java.util.HashMap[Key, Entry]] {
    override def initialValue(): java.util.HashMap[Key, Entry] = new java.util.HashMap()
  }

  private def sampleKey(bytes: Array[Byte], token: Class[_]): Key = {
    val n = bytes.length
    if (n <= 1024) {
      val h = Hash128.hashBytes(bytes, 0x5eed)
      Key(n, h.h1, h.h2, token)
    } else {
      var h1 = 0x5eedL
      var h2 = 0L
      var w = 0
      while (w < 4) {
        val off = (n - 256).toLong * w / 3
        val h = Hash128.hashBytesRange(bytes, off.toInt, 256, h1)
        h1 = h.h1
        h2 ^= h.h2
        w += 1
      }
      Key(n, h1, h2, token)
    }
  }

  // reference fast path: when the SAME byte-array instance recurs row
  // after row (a scalar-subquery constant, a broadcast value, a literal
  // evaluated once per batch) the per-row content verification is pure
  // overhead — `eq` proves identity without reading a single byte. One
  // entry per thread suffices: the pattern this serves is a run of rows
  // probing one sketch.
  private val tlLast = new ThreadLocal[Entry]

  // JVM-global cache for BIG blobs (the scalar-subquery / broadcast
  // sharded-filter case): the per-thread cache below would deserialize
  // a 100 MB+ sketch once per task THREAD — core-count x blob bytes of
  // heap, the difference between "one 400 MB filter per executor" and
  // an OOM at 32 local threads (measured: JoinPruneMeasure at a 50M-key
  // build). Identity-keyed (array equals IS reference equality) with
  // WEAK keys, so a blob is freed when the stage that shipped it drops
  // the reference. All probe structures are read-only after
  // construction (ShardedEbf is explicitly thread-safe; Ebf probes are
  // pure reads) and the synchronized map publishes them safely.
  // Deserialization happens under the map lock: every thread wants the
  // same blob, so one builds and the rest wait instead of duplicating.
  private val BigBlobBytes: Int = 8 << 20
  private val globalBig = new java.util.WeakHashMap[Array[Byte], AnyRef]
  // second level for big blobs arriving as content-equal but DISTINCT
  // instances (a per-row UnsafeRow.getBinary copy): tiny bound — these
  // entries pin >=8MB blobs strongly, and more than a couple of live
  // big filters at once means the query is in trouble anyway
  private val globalBigByContent = new java.util.HashMap[Key, Entry]

  private def getBig[S <: AnyRef](bytes: Array[Byte], token: Class[S],
                                  from: Array[Byte] => S): S =
    globalBig.synchronized {
      val byId = globalBig.get(bytes)
      if (token.isInstance(byId)) byId.asInstanceOf[S]
      else {
        val key = sampleKey(bytes, token)
        val e = globalBigByContent.get(key)
        val v =
          if (e != null && java.util.Arrays.equals(bytes, e.bytes))
            e.value.asInstanceOf[S]
          else {
            if (globalBigByContent.size() > 4) globalBigByContent.clear()
            val built = from(bytes)
            globalBigByContent.put(key, Entry(bytes, built))
            built
          }
        globalBig.put(bytes, v)
        v
      }
    }

  private def get[S <: AnyRef](bytes: Array[Byte], token: Class[S],
                               from: Array[Byte] => S): S = {
    if (bytes.length >= BigBlobBytes) return getBig(bytes, token, from)
    val last = tlLast.get()
    if (last != null && (last.bytes eq bytes) && token.isInstance(last.value))
      return last.value.asInstanceOf[S]
    val key = sampleKey(bytes, token)
    val m = tl.get()
    val e = m.get(key)
    if (e != null && java.util.Arrays.equals(bytes, e.bytes)) {
      tlLast.set(e)
      e.value.asInstanceOf[S]
    } else {
      // 256: a 64-shard table probed alongside a handful of other
      // sketches must fit without evicting (eviction clears the map)
      if (m.size() > 256) m.clear()
      val v = from(bytes)
      val entry = Entry(bytes, v)
      m.put(key, entry)
      tlLast.set(entry)
      v.asInstanceOf[S]
    }
  }

  def ebf(b: Array[Byte]): Ebf = get(b, classOf[Ebf], Ebf.fromBytes)
  def freq(b: Array[Byte]): FreqSketch = get(b, classOf[FreqSketch], FreqSketch.fromBytes)
  def hll(b: Array[Byte]): Hll = get(b, classOf[Hll], Hll.fromBytes)
  def cms(b: Array[Byte]): Cms = get(b, classOf[Cms], Cms.fromBytes)
  def kll(b: Array[Byte]): Kll = get(b, classOf[Kll], Kll.fromBytes)
  def td(b: Array[Byte]): TDigest = get(b, classOf[TDigest], TDigest.fromBytes)
  def sharded(b: Array[Byte]): graft.core.ShardedEbf =
    get(b, classOf[graft.core.ShardedEbf], graft.core.ShardedEbf.fromWire)
  def theta(b: Array[Byte]): Theta = get(b, classOf[Theta], Theta.fromBytes)
  def dcms(b: Array[Byte]): DecayedCms = get(b, classOf[DecayedCms], DecayedCms.fromBytes)
  def bks(b: Array[Byte]): BottomKSample = get(b, classOf[BottomKSample], BottomKSample.fromBytes)
  def cs(b: Array[Byte]): CountSketch = get(b, classOf[CountSketch], CountSketch.fromBytes)
}
