package graft.core

import java.nio.ByteBuffer

/** HyperLogLog cardinality sketch, implemented from the published
  * algorithm (Flajolet et al. 2007; small-range linear-counting
  * correction per the HLL++ paper, Heule et al. 2013). In memory the
  * representation is always dense (2^p byte registers — simple, O(1)
  * insert); the WIRE format is adaptive, HLL++-style: a sketch with k
  * non-zero registers serializes as a sorted (idx, rho) entry list
  * when that is smaller (4 + 4k < 2^p bytes), dense otherwise. At the
  * 10^12-document scale most per-(lang, host) groups are tiny — a
  * 10-url host costs ~60 wire bytes instead of 4 KiB, which is the
  * difference between shuffling GBs and shuffling TBs of phase-1
  * sketch state.
  *
  * Merge = register-wise max: associative, commutative, idempotent.
  * The wire representation is chosen by a rule over register CONTENT
  * alone, so equal register sets serialize to identical bytes and the
  * byte-identity-under-arbitrary-merge-orderings guarantee survives
  * the sparse encoding.
  *
  * Standard error sigma = 1.04 / sqrt(2^p); p = 12 (4 KiB dense) gives
  * ~1.6%. Header fields are vars solely for [[BytesSerde]] re-init.
  */
final class Hll(var p: Int, var seed: Long) extends BytesSerde {
  require(p >= 4 && p <= 18, s"p must be in [4,18], got $p")

  @inline def m: Int = 1 << p
  private[core] var regs: Array[Byte] = new Array[Byte](m)

  @inline def addHash(h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    // rho = leading zeros of remaining (64-p) bits + 1; w==0 -> 64-p+1
    val rho = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rho > regs(idx)) regs(idx) = rho.toByte
  }

  def add(key: String): Unit = addHash(Hash128.hash64(key, seed))
  def add(key: Long): Unit = addHash(Hash128.hash64(key, seed))
  def add(key: Array[Byte]): Unit = addHash(Hash128.hashBytes(key, seed).h1)

  def merge(other: Hll): Hll = {
    require(p == other.p && seed == other.seed, "cannot merge HLLs with different parameters")
    var i = 0
    while (i < m) {
      if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
      i += 1
    }
    this
  }

  def estimate: Long = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i)
      sum += java.lang.Double.longBitsToDouble((1023L - r) << 52) // 2^-r
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else e
    math.round(corrected)
  }

  /** Relative standard error of the estimator. */
  def standardError: Double = 1.04 / math.sqrt(m.toDouble)

  def toBytes: Array[Byte] = {
    var k = 0
    var i = 0
    while (i < m) { if (regs(i) != 0) k += 1; i += 1 }
    // canonical representation rule — a pure function of register
    // content, so any merge order yields identical bytes
    val sparse = 4 + 4 * k < m
    val buf = ByteBuffer.allocate(4 + 4 + 8 + 1 + (if (sparse) 4 + 4 * k else m))
    buf.putInt(Hll.MAGIC)
    buf.putInt(p)
    buf.putLong(seed)
    buf.put(if (sparse) 1.toByte else 0.toByte)
    if (sparse) {
      buf.putInt(k)
      i = 0
      while (i < m) { // index-ascending: deterministic entry order
        if (regs(i) != 0) {
          buf.put((i >>> 16).toByte).put((i >>> 8).toByte).put(i.toByte)
          buf.put(regs(i))
        }
        i += 1
      }
    } else buf.put(regs)
    buf.array()
  }

  private[core] def loadBytes(bytes: Array[Byte]): Unit = {
    val in = ByteBuffer.wrap(bytes)
    val magic = in.getInt()
    require(magic == Hll.MAGIC, f"bad HLL magic 0x$magic%08x")
    p = in.getInt()
    seed = in.getLong()
    val mode = in.get()
    regs = new Array[Byte](m)
    if (mode == 1.toByte) {
      val k = in.getInt()
      var e = 0
      while (e < k) {
        val idx = ((in.get() & 0xff) << 16) | ((in.get() & 0xff) << 8) | (in.get() & 0xff)
        regs(idx) = in.get()
        e += 1
      }
    } else {
      require(mode == 0.toByte, s"bad HLL wire mode $mode")
      in.get(regs)
    }
  }
}

object Hll {
  val MAGIC: Int = 0x484c4c32 // "HLL2" — v2 wire format (mode byte +
  // optional sparse register list); v1 bytes fail the magic check
  // loudly instead of being misparsed
  val DefaultP = 12
  val DefaultSeed = 42L

  def empty(p: Int = DefaultP, seed: Long = DefaultSeed): Hll = new Hll(p, seed)

  def fromBytes(bytes: Array[Byte]): Hll = {
    val h = new Hll(4, 0L)
    h.loadBytes(bytes)
    h
  }
}
