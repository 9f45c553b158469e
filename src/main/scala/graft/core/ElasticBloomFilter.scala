package graft.core

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

/** Elastic Bloom Filter — a dynamically resizable Bloom filter with
  * bucket-level expansion/compression and fingerprint-preserving rehash,
  * re-implemented from scratch from the published Elastic Bloom Filter
  * design (Tong Yang's group, PKU) as specified by the project's north
  * rule. NOT a port: the reference is a single-node in-memory structure;
  * this implementation is designed as an associative, commutative merge
  * monoid so it can serve as a distributed Spark aggregation buffer.
  *
  * == Structure ==
  * `m = m0 * 2^level` buckets. For each of `k` derived hash functions,
  * a key consumes `log2(m0)` bits for base addressing and up to `l0`
  * further bits as a fingerprint. At `level` L the bucket index is
  * `b0 + (fp & (2^L - 1)) * m0` and the remaining stored fingerprint is
  * `fp >>> L` — so expansion (L -> L+1) routes each stored fingerprint
  * `f` in bucket `b` to bucket `b + (f & 1) * m` with fingerprint
  * `f >>> 1` ("fingerprint-preserving rehash"), and compression is its
  * exact inverse. A bucket is "set" iff it holds >= 1 fingerprint, so
  * expansion clears bits in child buckets that receive no fingerprints
  * and the false-positive rate drops after growth.
  *
  * == Normal form (the distributed-merge theorem) ==
  * After every insert/merge the filter expands while `n > alpha * m`
  * (and `level < l0`). Because expansion routes fingerprints by their
  * own content, the state at level L is a pure function of the inserted
  * key multiset — `expand(union(A,B)) == union(expand(A), expand(B))` —
  * hence merge is associative and commutative and the serialized bytes
  * are identical under arbitrary partition merge orderings.
  *
  * == Deviations from the paper (documented deliberately) ==
  *  - Buckets hold exact unbounded fingerprint multisets (the paper
  *    bounds per-bucket capacity); exactness is what makes distributed
  *    merge lossless.
  *  - Expansion triggers on global load `n/m > alpha` rather than
  *    per-bucket overflow, so the trigger is content-determined (a
  *    requirement for merge associativity, which the single-node paper
  *    does not need).
  *  - `delete` is supported but is NOT merge-safe across partitions
  *    (deleting in partition B a key inserted in partition A would
  *    violate multiset semantics); distributed aggregation is
  *    insert-only and delete is a post-merge local operation.
  *
  * Query checks the k bucket bits only (standard Bloom semantics):
  * no false negatives, one-sided error with
  * FPR <= (1 - e^(-k*n/m))^k at the current load.
  */
final class Ebf(
    val m0: Int,          // base bucket count, power of two
    val k: Int,           // number of derived hash functions
    val l0: Int,          // initial fingerprint width in bits (max expansions)
    val alphaNum: Int,    // load threshold alpha = alphaNum / alphaDen
    val alphaDen: Int,
    val seed: Long
) extends Serializable {
  require(Integer.bitCount(m0) == 1, s"m0 must be a power of two, got $m0")
  require(l0 >= 0 && l0 <= 30, s"l0 must be in [0,30], got $l0")
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  private val log2m0 = Integer.numberOfTrailingZeros(m0)

  var level: Int = 0
  var n: Long = 0L                        // total inserted keys (multiset size)
  // fps(b) holds counts(b) fingerprints (unsorted in memory; sorted at serialization)
  private var counts: Array[Int] = new Array[Int](m0)
  private var fps: Array[Array[Int]] = new Array[Array[Int]](m0)

  @inline def numBuckets: Int = m0 << level
  @inline def fpWidth: Int = l0 - level

  @inline private def bucketAndFp(h: Hash128.H, i: Int): (Int, Int) = {
    val hi = h.derived(i)
    val b0 = (hi & (m0 - 1)).toInt
    val fpFull = ((hi >>> log2m0) & ((1L << l0) - 1)).toInt
    val b = b0 + ((fpFull & ((1 << level) - 1)) * m0)
    (b, fpFull >>> level)
  }

  @inline private def push(b: Int, f: Int): Unit = {
    var arr = fps(b)
    val c = counts(b)
    if (arr == null) { arr = new Array[Int](4); fps(b) = arr }
    else if (c == arr.length) {
      val grown = new Array[Int](c * 2)
      System.arraycopy(arr, 0, grown, 0, c)
      arr = grown; fps(b) = arr
    }
    arr(c) = f
    counts(b) = c + 1
  }

  def insertHash(h: Hash128.H): Unit = {
    var i = 0
    while (i < k) {
      val (b, f) = bucketAndFp(h, i)
      push(b, f)
      i += 1
    }
    n += 1
    normalize()
  }

  def insert(key: String): Unit = insertHash(Hash128.hashString(key, seed))
  def insert(key: Array[Byte]): Unit = insertHash(Hash128.hashBytes(key, seed))
  def insert(key: Long): Unit = insertHash(Hash128.hashLong(key, seed))

  def mightContainHash(h: Hash128.H): Boolean = {
    var i = 0
    while (i < k) {
      val (b, _) = bucketAndFp(h, i)
      if (counts(b) == 0) return false
      i += 1
    }
    true
  }

  def mightContain(key: String): Boolean = mightContainHash(Hash128.hashString(key, seed))
  def mightContain(key: Array[Byte]): Boolean = mightContainHash(Hash128.hashBytes(key, seed))
  def mightContain(key: Long): Boolean = mightContainHash(Hash128.hashLong(key, seed))

  /** Expand while over the load threshold — the content-determined
    * normal form that makes merge associative. */
  private def normalize(): Unit = {
    while (level < l0 && n * alphaDen > alphaNum.toLong * numBuckets) expand()
  }

  /** Double the bucket array; route each fingerprint by its low bit. */
  def expand(): Unit = {
    require(level < l0, s"cannot expand past level $l0 (fingerprint exhausted)")
    val m = numBuckets
    val newCounts = new Array[Int](m * 2)
    val newFps = new Array[Array[Int]](m * 2)
    var b = 0
    while (b < m) {
      val c = counts(b)
      if (c > 0) {
        val arr = fps(b)
        var j = 0
        while (j < c) {
          val f = arr(j)
          val nb = b + ((f & 1) * m)
          // inline push into new arrays
          var na = newFps(nb)
          val nc = newCounts(nb)
          if (na == null) { na = new Array[Int](4); newFps(nb) = na }
          else if (nc == na.length) {
            val grown = new Array[Int](nc * 2)
            System.arraycopy(na, 0, grown, 0, nc)
            na = grown; newFps(nb) = na
          }
          na(nc) = f >>> 1
          newCounts(nb) = nc + 1
          j += 1
        }
      }
      b += 1
    }
    counts = newCounts
    fps = newFps
    level += 1
  }

  /** Halve the bucket array; fingerprints regain their routing bit.
    * Exact inverse of [[expand]] on the fingerprint multiset. */
  def compress(): Unit = {
    require(level > 0, "cannot compress below level 0")
    val half = numBuckets / 2
    val newCounts = new Array[Int](half)
    val newFps = new Array[Array[Int]](half)
    var b = 0
    while (b < half) {
      val cLo = counts(b)
      val cHi = counts(b + half)
      val c = cLo + cHi
      if (c > 0) {
        val merged = new Array[Int](math.max(4, c))
        var j = 0
        var t = 0
        while (j < cLo) { merged(t) = fps(b)(j) << 1; j += 1; t += 1 }
        j = 0
        while (j < cHi) { merged(t) = (fps(b + half)(j) << 1) | 1; j += 1; t += 1 }
        newFps(b) = merged
        newCounts(b) = c
      }
      b += 1
    }
    counts = newCounts
    fps = newFps
    level -= 1
  }

  /** Remove one inserted key. Returns false (and leaves the filter
    * unchanged) if the key's fingerprints are not all present. NOT
    * merge-safe across partitions — local post-merge use only. */
  def delete(key: String): Boolean = deleteHash(Hash128.hashString(key, seed))
  def delete(key: Long): Boolean = deleteHash(Hash128.hashLong(key, seed))

  def deleteHash(h: Hash128.H): Boolean = {
    // phase 1: verify all k fingerprints present
    val pos = new Array[Int](k)   // index within bucket of a matching fp
    val bks = new Array[Int](k)
    var i = 0
    while (i < k) {
      val (b, f) = bucketAndFp(h, i)
      val c = counts(b)
      val arr = fps(b)
      var found = -1
      var j = 0
      while (j < c && found < 0) { if (arr(j) == f) found = j; j += 1 }
      if (found < 0) return false
      bks(i) = b; pos(i) = found
      i += 1
    }
    // phase 2: remove one matching fp from each bucket.
    // Re-find per bucket because an earlier removal in the SAME bucket
    // shifts indices (k hash functions can collide on a bucket).
    i = 0
    while (i < k) {
      val b = bks(i)
      val (_, f) = bucketAndFp(h, i)
      val c = counts(b)
      val arr = fps(b)
      var found = -1
      var j = 0
      while (j < c && found < 0) { if (arr(j) == f) found = j; j += 1 }
      // found >= 0 guaranteed: phase 1 verified and we only remove matching copies
      arr(found) = arr(c - 1)
      counts(b) = c - 1
      i += 1
    }
    n -= 1
    true
  }

  /** In-place merge: align levels upward, union fingerprint multisets,
    * re-normalize. Associative and commutative (see class doc). */
  def merge(other: Ebf): Ebf = {
    require(m0 == other.m0 && k == other.k && l0 == other.l0 &&
      alphaNum == other.alphaNum && alphaDen == other.alphaDen && seed == other.seed,
      "cannot merge EBFs with different parameters")
    val a = this
    val b = other
    while (a.level < b.level) a.expand()
    while (b.level < a.level) b.expand()
    val m = numBuckets
    var i = 0
    while (i < m) {
      val c = b.counts(i)
      if (c > 0) {
        val arr = b.fps(i)
        var j = 0
        while (j < c) { a.push(i, arr(j)); j += 1 }
      }
      i += 1
    }
    a.n += b.n
    normalize()
    a
  }

  def bitsSet: Int = {
    var s = 0
    var i = 0
    while (i < numBuckets) { if (counts(i) > 0) s += 1; i += 1 }
    s
  }

  /** One-sided FPR bound at the current load: (1 - e^(-k n / m))^k. */
  def fprBound: Double =
    math.pow(1.0 - math.exp(-k.toDouble * n / numBuckets), k.toDouble)

  /** Canonical serialization: fingerprints sorted ascending per bucket,
    * bit-packed at the current width. Byte-identical for equal content. */
  def toBytes: Array[Byte] = {
    val m = numBuckets
    val w = fpWidth
    val bos = new ByteArrayOutputStream(64 + m)
    val out = new DataOutputStream(bos)
    out.writeInt(Ebf.MAGIC)
    out.writeInt(m0); out.writeInt(k); out.writeInt(l0); out.writeInt(level)
    out.writeInt(alphaNum); out.writeInt(alphaDen)
    out.writeLong(seed); out.writeLong(n)
    // varint counts
    var b = 0
    while (b < m) { writeVarInt(out, counts(b)); b += 1 }
    // bit-packed sorted fingerprints
    var acc = 0L
    var accBits = 0
    b = 0
    while (b < m) {
      val c = counts(b)
      if (c > 0) {
        val sorted = java.util.Arrays.copyOf(fps(b), c)
        java.util.Arrays.sort(sorted)
        var j = 0
        while (j < c) {
          if (w > 0) {
            acc |= (sorted(j).toLong & ((1L << w) - 1)) << accBits
            accBits += w
            while (accBits >= 8) {
              out.writeByte((acc & 0xff).toInt)
              acc >>>= 8
              accBits -= 8
            }
          }
          j += 1
        }
      }
      b += 1
    }
    if (accBits > 0) out.writeByte((acc & 0xff).toInt)
    out.flush()
    bos.toByteArray
  }

  def sizeBytes: Int = toBytes.length

  private def writeVarInt(out: DataOutputStream, v0: Int): Unit = {
    var v = v0
    while ((v & ~0x7f) != 0) { out.writeByte((v & 0x7f) | 0x80); v >>>= 7 }
    out.writeByte(v)
  }

  def copyOf: Ebf = Ebf.fromBytes(toBytes)

  private[core] def setState(newCounts: Array[Int], newFps: Array[Array[Int]]): Unit = {
    counts = newCounts
    fps = newFps
  }
}

object Ebf {
  val MAGIC: Int = 0x45424631 // "EBF1"

  // Defaults: ~10 buckets/key at threshold (alpha = 1/8), k = 5
  // => bound FPR (1 - e^(-5/8))^5 ~= 2.2e-2 worst-case right at the
  // threshold, dropping after each expansion. l0 = 16 allows 16
  // doublings (m0 * 65536 buckets).
  val DefaultM0 = 1024
  val DefaultK = 5
  val DefaultL0 = 16
  val DefaultAlphaNum = 1
  val DefaultAlphaDen = 8
  val DefaultSeed = 42L

  def empty(m0: Int = DefaultM0, k: Int = DefaultK, l0: Int = DefaultL0,
            alphaNum: Int = DefaultAlphaNum, alphaDen: Int = DefaultAlphaDen,
            seed: Long = DefaultSeed): Ebf =
    new Ebf(m0, k, l0, alphaNum, alphaDen, seed)

  def fromBytes(bytes: Array[Byte]): Ebf = {
    val in = ByteBuffer.wrap(bytes)
    val magic = in.getInt()
    require(magic == MAGIC, f"bad EBF magic 0x$magic%08x")
    val m0 = in.getInt(); val k = in.getInt(); val l0 = in.getInt(); val level = in.getInt()
    val aN = in.getInt(); val aD = in.getInt()
    val seed = in.getLong(); val n = in.getLong()
    val e = new Ebf(m0, k, l0, aN, aD, seed)
    val m = m0 << level
    e.level = level
    e.n = n
    val counts = new Array[Int](m)
    val fps = new Array[Array[Int]](m)
    var b = 0
    while (b < m) { counts(b) = readVarInt(in); b += 1 }
    val w = l0 - level
    var acc = 0L
    var accBits = 0
    b = 0
    while (b < m) {
      val c = counts(b)
      if (c > 0) {
        val arr = new Array[Int](c)
        var j = 0
        while (j < c) {
          if (w > 0) {
            while (accBits < w) {
              acc |= (in.get() & 0xffL) << accBits
              accBits += 8
            }
            arr(j) = (acc & ((1L << w) - 1)).toInt
            acc >>>= w
            accBits -= w
          }
          j += 1
        }
        fps(b) = arr
      }
      b += 1
    }
    e.setState(counts, fps)
    e
  }

  private def readVarInt(in: ByteBuffer): Int = {
    var v = 0
    var shift = 0
    var b = in.get()
    while ((b & 0x80) != 0) {
      v |= (b & 0x7f) << shift
      shift += 7
      b = in.get()
    }
    v | ((b & 0x7f) << shift)
  }
}
