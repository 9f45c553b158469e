package graft.core

/** 128-bit MurmurHash3 (x64 variant), implemented from the public
  * algorithm description (Austin Appleby, public domain). The engine
  * needs more than 64 hash bits per key: the Elastic Bloom Filter
  * consumes `log2(m0)` bits for bucket addressing plus `L0` fingerprint
  * bits per hash function, and k independent hash functions are derived
  * from the two 64-bit halves via the Kirsch-Mitzenmacher construction
  * (h_i = h1 + i*h2), which preserves Bloom-filter error bounds.
  *
  * Pure function of (bytes, seed) — the cornerstone of every
  * determinism guarantee in this library (byte-identical sketches
  * across partitionings, merge orders, and parallelism levels).
  */
object Hash128 {

  final case class H(h1: Long, h2: Long) {
    /** i-th derived 64-bit hash (Kirsch-Mitzenmacher). */
    @inline def derived(i: Int): Long = h1 + i.toLong * h2
  }

  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  @inline private def rotl64(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  @inline private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** MurmurHash3_x64_128 over a byte array. */
  def hashBytes(data: Array[Byte], seed: Long): H =
    hashBytesRange(data, 0, data.length, seed)

  /** Range variant: hash `data[off, off+len)` without slicing — lets
    * tokenizing aggregators hash token spans with zero per-token
    * allocation. Identical result to hashing the copied slice. */
  def hashBytesRange(data: Array[Byte], off: Int, len: Int, seed: Long): H = {
    val nblocks = len / 16
    var h1 = seed
    var h2 = seed

    // body
    var i = 0
    while (i < nblocks) {
      val base = off + i * 16
      var k1 = getLongLE(data, base)
      var k2 = getLongLE(data, base + 8)
      k1 *= C1; k1 = rotl64(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl64(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }

    // tail
    val tail = off + nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = len & 15
    if (rem >= 9) {
      var j = math.min(rem, 16) - 1
      while (j >= 8) { k2 ^= (data(tail + j) & 0xffL) << ((j - 8) * 8); j -= 1 }
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 ^= (data(tail + j) & 0xffL) << (j * 8); j -= 1 }
    }
    if (rem > 8) { k2 *= C2; k2 = rotl64(k2, 33); k2 *= C1; h2 ^= k2 }
    if (rem > 0) { k1 *= C1; k1 = rotl64(k1, 31); k1 *= C2; h1 ^= k1 }

    // finalization
    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    H(h1, h2)
  }

  def hashString(s: String, seed: Long): H =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  /** Hash a single long without allocating (little-endian 8-byte block). */
  def hashLong(v: Long, seed: Long): H = {
    // equivalent to hashBytes of the 8 LE bytes of v
    var h1 = seed
    var h2 = seed
    var k1 = v
    k1 *= C1; k1 = rotl64(k1, 31); k1 *= C2; h1 ^= k1
    h1 ^= 8L; h2 ^= 8L
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    H(h1, h2)
  }

  /** Single 64-bit convenience hash. */
  def hash64(s: String, seed: Long): Long = hashString(s, seed).h1
  def hash64(v: Long, seed: Long): Long = hashLong(v, seed).h1

  @inline private def getLongLE(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) |
      ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 3) & 0xffL) << 24) |
      ((b(off + 4) & 0xffL) << 32) |
      ((b(off + 5) & 0xffL) << 40) |
      ((b(off + 6) & 0xffL) << 48) |
      ((b(off + 7) & 0xffL) << 56)
}
