package graft.core

import java.nio.ByteBuffer

/** Count-Min sketch, implemented from the published algorithm
  * (Cormode & Muthukrishnan 2005). `depth` rows x `width` counters;
  * row hashes derived from one 128-bit hash (Kirsch-Mitzenmacher).
  * Merge = element-wise add: associative and commutative, so serialized
  * bytes are identical under arbitrary partition merge orderings.
  *
  * Guarantees (N = total added count):
  *   true <= estimate              (never under-estimates)
  *   estimate <= true + eps * N    with prob >= 1 - delta,
  * where eps = e / width and delta = e^(-depth).
  */
final class Cms(var depth: Int, var width: Int, var seed: Long) extends BytesSerde {
  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 8, s"width must be >= 8, got $width")

  private[core] var table: Array[Long] = new Array[Long](depth * width)
  var total: Long = 0L

  @inline private def idx(h: Hash128.H, row: Int): Int = {
    val hr = h.derived(row + 1)
    // non-negative mod
    val m = (hr % width).toInt
    row * width + (if (m < 0) m + width else m)
  }

  def addHash(h: Hash128.H, count: Long): Unit = {
    var r = 0
    while (r < depth) {
      table(idx(h, r)) += count
      r += 1
    }
    total += count
  }

  /** Single-row count bump from an already-derived row hash
    * (`h.derived(row + 1)`) — the row-major batched kernel's inner
    * step (see BatchedTokenBuf): the caller iterates rows in the OUTER
    * loop so each pass touches only one width-sized row slice, and
    * adds the batch size to `total` itself after all rows. Equivalent
    * to `addHash` per element by commutativity of addition. */
  @inline def bumpRow(row: Int, hr: Long): Unit = {
    val m = (hr % width).toInt
    table(row * width + (if (m < 0) m + width else m)) += 1L
  }

  def add(key: String, count: Long = 1L): Unit = addHash(Hash128.hashString(key, seed), count)
  def add(key: Long, count: Long): Unit = addHash(Hash128.hashLong(key, seed), count)

  def estimateHash(h: Hash128.H): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = table(idx(h, r))
      if (v < min) min = v
      r += 1
    }
    min
  }

  def estimate(key: String): Long = estimateHash(Hash128.hashString(key, seed))
  def estimate(key: Long): Long = estimateHash(Hash128.hashLong(key, seed))

  /** Add every space-separated token of `text` (count 1 each) without
    * materializing per-token strings: tokens are hashed as byte ranges
    * of one UTF-8 encoding of the document. Equivalent to exploding the
    * text and adding each non-empty token — but with one allocation per
    * document instead of one per token, which is what lets the token
    * phase scale with cores instead of with the allocator (measured on
    * the 152M-token bench: the exploded-row pipeline was
    * allocation-bound and did not speed up from 8 to 32 threads). */
  def addTextTokens(text: String): Unit = {
    if (text == null || text.isEmpty) return
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (i > start) addHash(Hash128.hashBytesRange(bytes, start, i - start, seed), 1L)
        start = i + 1
      }
      i += 1
    }
  }

  def merge(other: Cms): Cms = {
    require(depth == other.depth && width == other.width && seed == other.seed,
      "cannot merge CMS with different parameters")
    var i = 0
    while (i < table.length) { table(i) += other.table(i); i += 1 }
    total += other.total
    this
  }

  /** Inner-product (equi-join size) estimate between two frequency
    * sketches over the same parameters: min over rows of the row-wise
    * dot product (Cormode & Muthukrishnan 2005, section on inner
    * products). Estimates sum_k fA(k) * fB(k) — the cardinality of the
    * equi-join between the two sketched key multisets — from the
    * sketches ALONE: never under-estimates (collision cross-terms are
    * non-negative), and over-estimates by at most eps * totalA * totalB
    * with prob >= 1 - delta. This is join-size estimation for free off
    * sketches the engine already collects per partition/snapshot. */
  def innerProduct(other: Cms): Long = {
    require(depth == other.depth && width == other.width && seed == other.seed,
      "cannot inner-product CMS with different parameters")
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      // saturating arithmetic: at 10^12-row totals a row's dot product
      // can exceed Long range; wrapping would return a small/negative
      // value and silently break the never-under-estimates guarantee.
      // A saturated row reads as Long.MaxValue ("at least this"), so
      // the returned estimate stays >= the true inner product.
      var s = 0L
      var j = r * width
      val end = j + width
      while (j < end && s != Long.MaxValue) {
        val a = table(j)
        val b = other.table(j)
        if (a != 0L && b != 0L) {
          if (a > Long.MaxValue / b) s = Long.MaxValue
          else {
            val p = a * b
            s = if (s + p < s) Long.MaxValue else s + p
          }
        }
        j += 1
      }
      if (s < min) min = s
      r += 1
    }
    min
  }

  def eps: Double = math.E / width
  def delta: Double = math.exp(-depth.toDouble)

  // Wire format v2: dense fixed 8-byte cells, or a sparse
  // (nnz, index-delta/count varints) list when byte-cheaper — chosen by
  // exact byte cost, a pure function of table content, so equal tables
  // serialize identically under any merge ordering. The win case is
  // categorical counting (cms_agg over a low-cardinality column):
  // ~n_keys*depth occupied cells out of depth*width, e.g. a 10-source
  // CMS ships ~600 B instead of 229 KB through the merge exchange.
  // Token-counting CMS tables are near-full and stay dense.
  def toBytes: Array[Byte] = {
    var nnz = 0
    var sparseCost = 0
    var prev = -1
    var i = 0
    while (i < table.length) {
      val c = table(i)
      if (c != 0L) {
        nnz += 1
        sparseCost += Cms.varintLen(i - prev - 1) + Cms.varintLen(c)
        prev = i
      }
      i += 1
    }
    sparseCost += Cms.varintLen(nnz.toLong)
    val dense = 8 * table.length
    val sparseMode = sparseCost < dense
    val buf = ByteBuffer.allocate(4 + 4 + 4 + 8 + 8 + 1 + (if (sparseMode) sparseCost else dense))
    buf.putInt(Cms.MAGIC)
    buf.putInt(depth)
    buf.putInt(width)
    buf.putLong(seed)
    buf.putLong(total)
    buf.put(if (sparseMode) 1.toByte else 0.toByte)
    if (sparseMode) {
      Cms.writeVarint(buf, nnz.toLong)
      prev = -1
      i = 0
      while (i < table.length) {
        if (table(i) != 0L) {
          Cms.writeVarint(buf, (i - prev - 1).toLong)
          Cms.writeVarint(buf, table(i))
          prev = i
        }
        i += 1
      }
    } else {
      i = 0
      while (i < table.length) { buf.putLong(table(i)); i += 1 }
    }
    java.util.Arrays.copyOf(buf.array(), buf.position())
  }

  private[core] def loadBytes(bytes: Array[Byte]): Unit = {
    val in = ByteBuffer.wrap(bytes)
    val magic = in.getInt()
    require(magic == Cms.MAGIC, f"bad CMS magic 0x$magic%08x")
    depth = in.getInt()
    width = in.getInt()
    seed = in.getLong()
    total = in.getLong()
    table = new Array[Long](depth * width)
    val mode = in.get()
    if (mode == 1.toByte) {
      val nnz = Cms.readVarint(in)
      var prev = -1
      var e = 0L
      while (e < nnz) {
        val idx = prev + 1 + Cms.readVarint(in).toInt
        table(idx) = Cms.readVarint(in)
        prev = idx
        e += 1
      }
    } else {
      require(mode == 0.toByte, s"bad CMS wire mode $mode")
      var i = 0
      while (i < table.length) { table(i) = in.getLong(); i += 1 }
    }
  }
}

object Cms {
  val MAGIC: Int = 0x434d5332 // "CMS2" — v2 wire format (mode byte +
  // optional sparse cell list); v1 bytes fail the magic check loudly
  // instead of being misparsed

  private[core] def varintLen(v0: Long): Int = {
    var v = v0
    var len = 1
    while ((v & ~0x7fL) != 0L) { v >>>= 7; len += 1 }
    len
  }
  private[core] def writeVarint(buf: ByteBuffer, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { buf.put(((v & 0x7f) | 0x80).toByte); v >>>= 7 }
    buf.put(v.toByte)
  }
  private[core] def readVarint(in: ByteBuffer): Long = {
    var v = 0L
    var shift = 0
    var b = in.get()
    while ((b & 0x80) != 0) {
      v |= (b & 0x7fL) << shift
      shift += 7
      b = in.get()
    }
    v | ((b & 0x7fL) << shift)
  }
  val DefaultDepth = 7        // delta ~= 9.1e-4
  val DefaultWidth = 4096     // eps ~= 6.6e-4
  val DefaultSeed = 42L

  def empty(depth: Int = DefaultDepth, width: Int = DefaultWidth,
            seed: Long = DefaultSeed): Cms = new Cms(depth, width, seed)

  def fromBytes(bytes: Array[Byte]): Cms = {
    val c = new Cms(1, 8, 0L)
    c.loadBytes(bytes)
    c
  }
}
