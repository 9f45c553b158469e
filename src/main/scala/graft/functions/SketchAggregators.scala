package graft.functions

import graft.core._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.reflect.ClassTag

/** Typed `Aggregator`s wrapping the graft.core sketch kernels.
  *
  * Spark-first design (SURVEY.md §3 E1): `functions.udaf(agg)` turns each
  * of these into a `ScalaAggregator` — a `TypedImperativeAggregate` — so
  * Catalyst plans partial aggregation per input task, serializes the
  * object buffer (Kryo) for the shuffle by group key, and merges on the
  * reduce side via our associative `merge`. That partial+final pipeline
  * IS the distributed sketch build; no RDD code anywhere.
  *
  * All merge functions are associative and commutative (EBF/HLL/CMS
  * byte-identically so), which is what makes the result independent of
  * partitioning, task scheduling, and AQE re-planning — the north rule's
  * "arbitrary partition merge orderings".
  */
object SketchAggregators {

  // ---------------- build aggregators (raw column -> sketch bytes) ----

  final class EbfAgg(m0: Int, k: Int, l0: Int, aNum: Int, aDen: Int, seed: Long)
      extends Aggregator[String, Ebf, Array[Byte]] {
    def zero: Ebf = Ebf.empty(m0, k, l0, aNum, aDen, seed)
    def reduce(b: Ebf, key: String): Ebf = { if (key != null) b.insert(key); b }
    def merge(a: Ebf, b: Ebf): Ebf = a.merge(b)
    def finish(b: Ebf): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[Ebf] = Encoders.kryo[Ebf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** [[EbfAgg]] fed pre-computed `Hash128` halves instead of the key
    * string ("shuffle hashes, not strings" — see Hash128Expr): 16 bytes
    * through a clustering exchange instead of the raw key,
    * byte-identical output. Null h1 (null key) rows are skipped. */
  final class EbfHashAgg(m0: Int, k: Int, l0: Int, aNum: Int, aDen: Int, seed: Long)
      extends Aggregator[(java.lang.Long, java.lang.Long), Ebf, Array[Byte]] {
    def zero: Ebf = Ebf.empty(m0, k, l0, aNum, aDen, seed)
    def reduce(b: Ebf, in: (java.lang.Long, java.lang.Long)): Ebf = {
      // both halves guarded: callers derive them from one key, but a
      // hand-written (non-null, null) pair must skip, not NPE
      if (in._1 != null && in._2 != null)
        b.insertHash(Hash128.H(in._1.longValue(), in._2.longValue()))
      b
    }
    def merge(a: Ebf, b: Ebf): Ebf = a.merge(b)
    def finish(b: Ebf): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[Ebf] = Encoders.kryo[Ebf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class HllAgg(p: Int, seed: Long) extends Aggregator[String, Hll, Array[Byte]] {
    def zero: Hll = Hll.empty(p, seed)
    def reduce(b: Hll, key: String): Hll = { if (key != null) b.add(key); b }
    def merge(a: Hll, b: Hll): Hll = a.merge(b)
    def finish(b: Hll): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[Hll] = Encoders.kryo[Hll]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** O46: KMV/theta distinct-count sketch with set algebra (see
    * [[graft.core.Theta]]). */
  final class ThetaAgg(k: Int, seed: Long) extends Aggregator[String, Theta, Array[Byte]] {
    def zero: Theta = Theta.empty(k, seed)
    def reduce(b: Theta, key: String): Theta = { if (key != null) b.add(key); b }
    def merge(a: Theta, b: Theta): Theta = a.merge(b)
    def finish(b: Theta): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[Theta] = Encoders.kryo[Theta]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** O79: Count Sketch — the unbiased/turnstile twin of [[CmsAgg]]
    * (see [[graft.core.CountSketch]]). */
  final class CountSketchAgg(depth: Int, width: Int, seed: Long)
      extends Aggregator[String, CountSketch, Array[Byte]] {
    def zero: CountSketch = CountSketch.empty(depth, width, seed)
    def reduce(b: CountSketch, key: String): CountSketch = { if (key != null) b.add(key); b }
    def merge(a: CountSketch, b: CountSketch): CountSketch = a.merge(b)
    def finish(b: CountSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[CountSketch] = Encoders.kryo[CountSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** [[CountSketchAgg]] over the TOKENS of a text column — the same
    * no-exploded-relation rationale as [[CmsTokensAgg]]; byte-identical
    * to the exploded `cs_agg(token)` build by linearity. */
  final class CsTokensAgg(depth: Int, width: Int, seed: Long)
      extends Aggregator[String, CountSketch, Array[Byte]] {
    def zero: CountSketch = CountSketch.empty(depth, width, seed)
    def reduce(b: CountSketch, text: String): CountSketch = {
      if (text != null) b.addTextTokens(text); b
    }
    def merge(a: CountSketch, b: CountSketch): CountSketch = a.merge(b)
    def finish(b: CountSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[CountSketch] = Encoders.kryo[CountSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class CmsAgg(depth: Int, width: Int, seed: Long)
      extends Aggregator[String, Cms, Array[Byte]] {
    def zero: Cms = Cms.empty(depth, width, seed)
    def reduce(b: Cms, key: String): Cms = { if (key != null) b.add(key); b }
    def merge(a: Cms, b: Cms): Cms = a.merge(b)
    def finish(b: Cms): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[Cms] = Encoders.kryo[Cms]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** CMS over the TOKENS of a text column — tokenization happens inside
    * `reduce`, so the 100x-larger exploded token relation never exists
    * as rows. One document row in, `token_count(text)` counter updates,
    * zero per-token allocations (byte-range hashing). This is the
    * scalable path for "heavy-hitter token frequencies from extracted
    * text" at 10^12 documents; the exploded `cms_agg(token)` form stays
    * available for ad-hoc SQL. */
  final class CmsTokensAgg(depth: Int, width: Int, seed: Long)
      extends Aggregator[String, Cms, Array[Byte]] {
    def zero: Cms = Cms.empty(depth, width, seed)
    def reduce(b: Cms, text: String): Cms = { if (text != null) b.addTextTokens(text); b }
    def merge(a: Cms, b: Cms): Cms = a.merge(b)
    def finish(b: Cms): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[Cms] = Encoders.kryo[Cms]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class TopKAgg(capacity: Int) extends Aggregator[String, FreqSketch, Array[Byte]] {
    def zero: FreqSketch = FreqSketch.empty(capacity)
    def reduce(b: FreqSketch, item: String): FreqSketch = { if (item != null) b.add(item); b }
    def merge(a: FreqSketch, b: FreqSketch): FreqSketch = a.merge(b)
    def finish(b: FreqSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[FreqSketch] = Encoders.kryo[FreqSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Misra-Gries over the TOKENS of a text column — same no-exploded-
    * relation rationale as [[CmsTokensAgg]]. */
  final class TopKTokensAgg(capacity: Int)
      extends Aggregator[String, FreqSketch, Array[Byte]] {
    def zero: FreqSketch = FreqSketch.empty(capacity)
    def reduce(b: FreqSketch, text: String): FreqSketch = { if (text != null) b.addTextTokens(text); b }
    def merge(a: FreqSketch, b: FreqSketch): FreqSketch = a.merge(b)
    def finish(b: FreqSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[FreqSketch] = Encoders.kryo[FreqSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Buffer/output of the fused per-lang token pass. */
  final class TokenSketchBuf(val cms: Cms, val topk: FreqSketch) extends Serializable
  final case class TokenSketches(cms: Array[Byte], topk: Array[Byte])

  /** CMS point-query sketch AND Misra-Gries heavy-hitter enumeration
    * over the tokens of a text column in ONE aggregation pass: CMS
    * answers "how often did token X occur", MG answers "which tokens
    * are the heavy hitters" — the flagship's phase 2 needs both.
    *
    * The fusion is at the KERNEL level, not just the plan level: one
    * UTF-8 encoding of the document, one tokenization walk, and ONE
    * 128-bit token hash feeding both sketches (both are constructed
    * with the same `seed`, so `Cms.addHash` and
    * `FreqSketch.addRangeHashed` consume the same `Hash128`). The
    * phase is token-kernel-bound at 10^8+ documents — measured on the
    * 4.8G-token flagship table, plan-level fusion alone (two
    * independent `addTextTokens` walks) cost cms-only + mg-only with
    * no saving at all. The CMS sub-sketch is byte-identical to
    * standalone CmsTokensAgg; MG heavy hitters match standalone
    * TopKTokensAgg — spec-asserted. */
  final class CmsTopkTokensAgg(depth: Int, width: Int, capacity: Int, seed: Long)
      extends Aggregator[String, TokenSketchBuf, TokenSketches] {
    def zero: TokenSketchBuf =
      new TokenSketchBuf(Cms.empty(depth, width, seed), FreqSketch.empty(capacity, seed))
    def reduce(b: TokenSketchBuf, text: String): TokenSketchBuf = {
      if (text == null || text.isEmpty) return b
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var start = 0
      var i = 0
      val len = bytes.length
      while (i <= len) {
        if (i == len || bytes(i) == ' ') {
          if (i > start) {
            val h = Hash128.hashBytesRange(bytes, start, i - start, seed)
            b.cms.addHash(h, 1L)
            b.topk.addRangeHashed(bytes, start, i - start, 1L, h.h1)
          }
          start = i + 1
        }
        i += 1
      }
      b
    }
    def merge(a: TokenSketchBuf, b: TokenSketchBuf): TokenSketchBuf = {
      a.cms.merge(b.cms); a.topk.merge(b.topk)
      a
    }
    def finish(b: TokenSketchBuf): TokenSketches =
      TokenSketches(b.cms.toBytes, b.topk.toBytes)
    def bufferEncoder: Encoder[TokenSketchBuf] = Encoders.kryo[TokenSketchBuf]
    def outputEncoder: Encoder[TokenSketches] = Encoders.product[TokenSketches]
  }

  final class KllAgg(k: Int) extends Aggregator[java.lang.Double, Kll, Array[Byte]] {
    def zero: Kll = Kll.empty(k)
    def reduce(b: Kll, v: java.lang.Double): Kll = { if (v != null) b.add(v.doubleValue()); b }
    def merge(a: Kll, b: Kll): Kll = a.merge(b)
    def finish(b: Kll): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[Kll] = Encoders.kryo[Kll]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class TDigestAgg(compression: Double)
      extends Aggregator[java.lang.Double, TDigest, Array[Byte]] {
    def zero: TDigest = TDigest.empty(compression)
    def reduce(b: TDigest, v: java.lang.Double): TDigest = { if (v != null) b.add(v.doubleValue()); b }
    def merge(a: TDigest, b: TDigest): TDigest = a.merge(b)
    def finish(b: TDigest): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Weight-carrying t-digest: quantiles of `value` where each row
    * counts `weight` times. The workhorse of token-budget corpus
    * selection — "find the quality cutoff c such that documents with
    * quality >= c hold ~B tokens" is the weighted (1 - B/T) quantile of
    * quality weighted by token count, computed in one mergeable pass
    * with no global sort. */
  final class TDigestWeightedAgg(compression: Double)
      extends Aggregator[(java.lang.Double, java.lang.Long), TDigest, Array[Byte]] {
    def zero: TDigest = TDigest.empty(compression)
    def reduce(b: TDigest, in: (java.lang.Double, java.lang.Long)): TDigest = {
      if (in._1 != null && in._2 != null) b.add(in._1.doubleValue(), in._2.longValue())
      b
    }
    def merge(a: TDigest, b: TDigest): TDigest = a.merge(b)
    def finish(b: TDigest): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ---------------- fused per-host aggregator ------------------------

  /** Mutable buffer holding all four flagship sketches; Kryo routes
    * each field through its compact wire format (KryoSerializable). */
  final class HostSketchBuf(val ebf: Ebf, val hll: Hll, val kll: Kll,
                            val td: TDigest) extends Serializable

  /** Output of the fused aggregator: one struct of four sketch blobs. */
  final case class HostSketches(ebf: Array[Byte], hll: Array[Byte],
                                kll: Array[Byte], td: Array[Byte])

  /** All four flagship per-host sketches in ONE aggregator: one
    * catalyst->scala converter crossing and one 128-bit url hash per
    * row instead of four crossings and two hashes (`Ebf.insertHash` and
    * `Hll.addHash` consume the same `Hash128.H`), one buffer lookup
    * instead of four. Byte-equality with the unfused build is asserted
    * in SparkPipelineSpec (same row order either way: both forms run
    * inside a single ObjectHashAggregate).
    *
    * Measured honestly (32M-row flagship, this sandbox): throughput is
    * NEUTRAL vs four separate UDAFs — the phase is bound by the
    * clustering shuffle and sketch inserts, not the UDAF boundary. Kept
    * because the fused form wins exactly when per-row converter cost is
    * a larger share (many small sketches, cheap inserts) and it halves
    * the stage-2 merge row count.
    */
  final class PerHostSketchesAgg(m0: Int, k: Int, l0: Int, aNum: Int, aDen: Int,
                                 hllP: Int, kllK: Int, tdCompression: Double, seed: Long)
      extends Aggregator[(String, java.lang.Double), HostSketchBuf, HostSketches] {
    def zero: HostSketchBuf = new HostSketchBuf(
      Ebf.empty(m0, k, l0, aNum, aDen, seed), Hll.empty(hllP, seed),
      Kll.empty(kllK), TDigest.empty(tdCompression))
    def reduce(b: HostSketchBuf, in: (String, java.lang.Double)): HostSketchBuf = {
      val key = in._1
      if (key != null) {
        val h = Hash128.hashString(key, seed)
        b.ebf.insertHash(h)
        b.hll.addHash(h.h1)
      }
      val v = in._2
      if (v != null) { b.kll.add(v.doubleValue()); b.td.add(v.doubleValue()) }
      b
    }
    def merge(a: HostSketchBuf, b: HostSketchBuf): HostSketchBuf = {
      a.ebf.merge(b.ebf); a.hll.merge(b.hll); a.kll.merge(b.kll); a.td.merge(b.td)
      a
    }
    def finish(b: HostSketchBuf): HostSketches =
      HostSketches(b.ebf.toBytes, b.hll.toBytes, b.kll.toBytes, b.td.toBytes)
    def bufferEncoder: Encoder[HostSketchBuf] = Encoders.kryo[HostSketchBuf]
    def outputEncoder: Encoder[HostSketches] = Encoders.product[HostSketches]
  }

  /** [[PerHostSketchesAgg]] fed PRE-COMPUTED url hashes instead of the
    * url string — the "shuffle hashes, not strings" form. The flagship
    * projects `Hash128Expr.h1/h2(url)` (16 bytes) before the clustering
    * exchange instead of shipping the ~60-byte url to the reduce side
    * only to hash it there; EBF and HLL consume `Hash128.H` directly,
    * so the resulting sketches are byte-identical to the string-fed
    * build (spec-asserted). Null hash (null url) rows skip the key
    * sketches, mirroring the string form's null-skip. */
  final class PerHostSketchesHashAgg(m0: Int, k: Int, l0: Int, aNum: Int, aDen: Int,
                                     hllP: Int, kllK: Int, tdCompression: Double, seed: Long)
      extends Aggregator[(java.lang.Long, java.lang.Long, java.lang.Double),
        HostSketchBuf, HostSketches] {
    def zero: HostSketchBuf = new HostSketchBuf(
      Ebf.empty(m0, k, l0, aNum, aDen, seed), Hll.empty(hllP, seed),
      Kll.empty(kllK), TDigest.empty(tdCompression))
    def reduce(b: HostSketchBuf,
               in: (java.lang.Long, java.lang.Long, java.lang.Double)): HostSketchBuf = {
      val h1 = in._1
      if (h1 != null && in._2 != null) {
        b.ebf.insertHash(Hash128.H(h1.longValue(), in._2.longValue()))
        b.hll.addHash(h1.longValue())
      }
      val v = in._3
      if (v != null) { b.kll.add(v.doubleValue()); b.td.add(v.doubleValue()) }
      b
    }
    def merge(a: HostSketchBuf, b: HostSketchBuf): HostSketchBuf = {
      a.ebf.merge(b.ebf); a.hll.merge(b.hll); a.kll.merge(b.kll); a.td.merge(b.td)
      a
    }
    def finish(b: HostSketchBuf): HostSketches =
      HostSketches(b.ebf.toBytes, b.hll.toBytes, b.kll.toBytes, b.td.toBytes)
    def bufferEncoder: Encoder[HostSketchBuf] = Encoders.kryo[HostSketchBuf]
    def outputEncoder: Encoder[HostSketches] = Encoders.product[HostSketches]
  }

  /** Stage-2 counterpart: re-merge fused sketch structs (input is the
    * four blob fields of [[HostSketches]]). */
  final class PerHostMergeAgg
      extends Aggregator[(Array[Byte], Array[Byte], Array[Byte], Array[Byte]),
        HostSketchBuf, HostSketches] {
    def zero: HostSketchBuf = null
    def reduce(b: HostSketchBuf,
               in: (Array[Byte], Array[Byte], Array[Byte], Array[Byte])): HostSketchBuf = {
      if (in._1 == null) return b
      val incoming = new HostSketchBuf(Ebf.fromBytes(in._1), Hll.fromBytes(in._2),
        Kll.fromBytes(in._3), TDigest.fromBytes(in._4))
      merge(b, incoming)
    }
    def merge(a: HostSketchBuf, b: HostSketchBuf): HostSketchBuf =
      if (a == null) b
      else if (b == null) a
      else {
        a.ebf.merge(b.ebf); a.hll.merge(b.hll); a.kll.merge(b.kll); a.td.merge(b.td)
        a
      }
    def finish(b: HostSketchBuf): HostSketches =
      if (b == null) null
      else HostSketches(b.ebf.toBytes, b.hll.toBytes, b.kll.toBytes, b.td.toBytes)
    def bufferEncoder: Encoder[HostSketchBuf] = Encoders.kryo[HostSketchBuf]
    def outputEncoder: Encoder[HostSketches] = Encoders.product[HostSketches]
  }

  // ---------------- merge aggregators (sketch bytes -> sketch bytes) --
  //
  // These make re-aggregation of per-partition / per-chunk / per-salt
  // sketches a pure SQL operation — the second stage of the salted
  // two-stage aggregation (O11) and the final pass of the checkpoint
  // runner (O12). The buffer starts null (parameters come from the
  // first sketch seen), which Kryo round-trips fine.

  /** O68: exponentially time-decayed CMS build — (key, eventTime
    * seconds) pairs; null key or time skipped, mirroring the other
    * aggregators. lambda is fixed at registration (ln 2 / halfLife). */
  final class DecayedCmsAgg(depth: Int, width: Int, seed: Long, lambda: Double)
      extends Aggregator[(String, java.lang.Double), DecayedCms, Array[Byte]] {
    def zero: DecayedCms = DecayedCms.empty(depth, width, seed, lambda = lambda)
    def reduce(b: DecayedCms, in: (String, java.lang.Double)): DecayedCms = {
      if (in._1 != null && in._2 != null) b.add(in._1, in._2.doubleValue())
      b
    }
    def merge(a: DecayedCms, b: DecayedCms): DecayedCms = a.merge(b)
    def finish(b: DecayedCms): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[DecayedCms] = Encoders.kryo[DecayedCms]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** O73: mergeable bottom-k uniform sample of distinct keys (see
    * [[graft.core.BottomKSample]]) — the grouped-sampling aggregator:
    * one pass, map-side partial, k smallest md5(key) per group, so the
    * sample is a deterministic function of the key set and exactly
    * reproducible cross-engine (ORDER BY md5(key) LIMIT k). */
  final class BottomKAgg(k: Int) extends Aggregator[String, BottomKSample, Array[Byte]] {
    def zero: BottomKSample = BottomKSample.empty(k)
    def reduce(b: BottomKSample, key: String): BottomKSample = { b.add(key); b }
    def merge(a: BottomKSample, b: BottomKSample): BottomKSample = a.merge(b)
    def finish(b: BottomKSample): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[BottomKSample] = Encoders.kryo[BottomKSample]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  sealed class BytesMergeAgg[S <: AnyRef : ClassTag](
      from: Array[Byte] => S,
      mrg: (S, S) => S,
      to: S => Array[Byte]
  ) extends Aggregator[Array[Byte], S, Array[Byte]] {
    def zero: S = null.asInstanceOf[S]
    def reduce(b: S, bytes: Array[Byte]): S =
      if (bytes == null) b
      else if (b == null) from(bytes)
      else mrg(b, from(bytes))
    def merge(a: S, b: S): S =
      if (a == null) b else if (b == null) a else mrg(a, b)
    def finish(b: S): Array[Byte] = if (b == null) null else to(b)
    def bufferEncoder: Encoder[S] = Encoders.kryo[S]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class EbfMergeAgg extends BytesMergeAgg[Ebf](Ebf.fromBytes, _ merge _, _.toBytes)
  final class HllMergeAgg extends BytesMergeAgg[Hll](Hll.fromBytes, _ merge _, _.toBytes)
  final class CmsMergeAgg extends BytesMergeAgg[Cms](Cms.fromBytes, _ merge _, _.toBytes)
  final class KllMergeAgg extends BytesMergeAgg[Kll](Kll.fromBytes, _ merge _, _.toBytes)
  final class TDigestMergeAgg
      extends BytesMergeAgg[TDigest](TDigest.fromBytes, _ merge _, _.toBytes)
  final class TopKMergeAgg
      extends BytesMergeAgg[FreqSketch](FreqSketch.fromBytes, _ merge _, _.toBytes)
  final class ThetaMergeAgg
      extends BytesMergeAgg[Theta](Theta.fromBytes, _ merge _, _.toBytes)
  final class DecayedCmsMergeAgg
      extends BytesMergeAgg[DecayedCms](DecayedCms.fromBytes, _ merge _, _.toBytes)
  final class BottomKMergeAgg
      extends BytesMergeAgg[BottomKSample](BottomKSample.fromBytes, _ merge _, _.toBytes)
  final class CountSketchMergeAgg
      extends BytesMergeAgg[CountSketch](CountSketch.fromBytes, _ merge _, _.toBytes)
}
