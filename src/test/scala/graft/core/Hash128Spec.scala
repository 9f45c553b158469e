package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

class Hash128Spec extends AnyFunSuite {

  test("matches Guava murmur3_128 (independent public implementation)") {
    val rnd = new scala.util.Random(1)
    for (_ <- 0 until 200) {
      val len = rnd.nextInt(64)
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      val seed = rnd.nextInt(Int.MaxValue)
      val ours = Hash128.hashBytes(bytes, seed.toLong)
      val g = com.google.common.hash.Hashing.murmur3_128(seed).hashBytes(bytes).asBytes()
      val bb = java.nio.ByteBuffer.wrap(g).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      assert(ours.h1 === bb.getLong(0), s"h1 mismatch len=$len seed=$seed")
      assert(ours.h2 === bb.getLong(8), s"h2 mismatch len=$len seed=$seed")
    }
  }

  test("hashLong equals hashBytes of LE-encoded long") {
    val rnd = new scala.util.Random(2)
    for (_ <- 0 until 100) {
      val v = rnd.nextLong()
      val seed = rnd.nextLong()
      val bytes = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
      assert(Hash128.hashLong(v, seed) === Hash128.hashBytes(bytes, seed))
    }
  }

  test("hashString is UTF-8 hashBytes") {
    val s = "héllo wörld ✓ 中文"
    assert(Hash128.hashString(s, 7L) ===
      Hash128.hashBytes(s.getBytes(StandardCharsets.UTF_8), 7L))
  }

  test("deterministic and seed-sensitive") {
    assert(Hash128.hashString("abc", 1L) === Hash128.hashString("abc", 1L))
    assert(Hash128.hashString("abc", 1L) !== Hash128.hashString("abc", 2L))
  }
}
