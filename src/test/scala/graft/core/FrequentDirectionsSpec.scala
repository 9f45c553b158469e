package graft.core

import breeze.linalg.{eigSym, DenseMatrix}
import org.scalatest.funsuite.AnyFunSuite

/** O57 — Frequent Directions invariants: exactness below capacity, the
  * PSD-order + spectral bound guarantee under heavy compaction, the
  * same bound under arbitrary merge trees (mergeability), additive
  * count/frobSq bookkeeping, and wire round-trip. Fixed seeds — fully
  * deterministic. */
class FrequentDirectionsSpec extends AnyFunSuite {

  private def randRows(n: Int, dim: Int, seed: Int): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    // rank-biased data: a few dominant directions plus noise, the shape
    // FD exists for
    val dirs = Array.fill(3, dim)(rng.nextGaussian())
    Array.fill(n) {
      val v = new Array[Double](dim)
      val w = Array(rng.nextGaussian() * 10, rng.nextGaussian() * 3, rng.nextGaussian())
      var i = 0
      while (i < dim) {
        v(i) = w(0) * dirs(0)(i) + w(1) * dirs(1)(i) + w(2) * dirs(2)(i) + rng.nextGaussian() * 0.1
        i += 1
      }
      v
    }
  }

  private def exactGram(rows: Array[Array[Double]], dim: Int): Array[Double] = {
    val g = new Array[Double](dim * dim)
    for (v <- rows; i <- 0 until dim; j <- 0 until dim) g(i * dim + j) += v(i) * v(j)
    g
  }

  private def eigRange(diff: Array[Double], dim: Int): (Double, Double) = {
    val m = new DenseMatrix[Double](dim, dim)
    for (i <- 0 until dim; j <- 0 until dim) m(i, j) = (diff(i * dim + j) + diff(j * dim + i)) / 2
    val ev = eigSym(m).eigenvalues
    (breeze.linalg.min(ev), breeze.linalg.max(ev))
  }

  private def checkGuarantee(fd: Fd, rows: Array[Array[Double]], dim: Int,
                             label: String): Unit = {
    val exact = exactGram(rows, dim)
    val sk = fd.gram
    val diff = Array.tabulate(dim * dim)(i => exact(i) - sk(i))
    val (lo, hi) = eigRange(diff, dim)
    val slack = 1e-6 * (1.0 + fd.frobSq)
    assert(lo >= -slack, s"$label: B^TB exceeds A^TA (min eig $lo)")
    assert(hi <= fd.errBound + slack, s"$label: spectral error $hi > bound ${fd.errBound}")
  }

  test("exact below capacity: no compaction, sketch Gram == exact Gram") {
    val dim = 12
    val rows = randRows(15, dim, 7)
    val fd = Fd.empty(ell = 8, dim = dim) // capacity 16 rows
    rows.foreach(fd.insert)
    assert(fd.nRows == 15 && fd.count == 15L)
    val (g, e) = (fd.gram, exactGram(rows, dim))
    for (i <- g.indices)
      assert(math.abs(g(i) - e(i)) <= 1e-9 * (1 + math.abs(e(i))), s"cell $i")
  }

  test("spectral guarantee under heavy compaction (500 rows into ell=8)") {
    val dim = 16
    val rows = randRows(500, dim, 11)
    val fd = Fd.empty(ell = 8, dim = dim)
    rows.foreach(fd.insert)
    // compaction is lazy (fires when the buffer fills at insert), so the
    // stream can end with up to 2*ell-1 raw rows appended since the last
    // squeeze; the bound holds either way
    assert(fd.nRows < 16, s"buffer overflow: ${fd.nRows}")
    assert(fd.count == 500L)
    val sumSq = rows.map(v => v.map(x => x * x).sum).sum
    assert(math.abs(fd.frobSq - sumSq) <= 1e-6 * sumSq)
    checkGuarantee(fd, rows, dim, "single stream")
    // an explicit final squeeze (what a consumer does to shrink the wire
    // blob) leaves < ell rows and keeps the guarantee
    fd.compact()
    assert(fd.nRows < 8, s"post-compaction sketch must hold < ell rows, got ${fd.nRows}")
    checkGuarantee(fd, rows, dim, "after final compact")
  }

  test("merge trees: any grouping satisfies the union bound, bookkeeping additive") {
    val dim = 16
    val rows = randRows(400, dim, 13)
    val rng = new scala.util.Random(17)
    for (trial <- 0 until 3) {
      val parts = rows.grouped(rng.nextInt(90) + 30).toArray
      val sketches = parts.map { chunk =>
        val f = Fd.empty(8, dim); chunk.foreach(f.insert); f
      }
      // random-order left fold (the shuffle-arrival shape)
      val order = rng.shuffle(sketches.indices.toList)
      val merged = order.tail.foldLeft(sketches(order.head))((a, i) => a.merge(sketches(i)))
      assert(merged.count == 400L, s"trial $trial")
      checkGuarantee(merged, rows, dim, s"merge trial $trial")
    }
  }

  test("wire round-trip preserves rows, count, frobSq, and Gram") {
    val dim = 10
    val fd = Fd.empty(6, dim)
    randRows(100, dim, 23).foreach(fd.insert)
    val back = Fd.fromBytes(fd.toBytes)
    assert(back.ell == fd.ell && back.dim == fd.dim && back.nRows == fd.nRows)
    assert(back.count == fd.count && back.frobSq == fd.frobSq)
    assert(back.gram.sameElements(fd.gram))
    assert(java.util.Arrays.equals(back.toBytes, fd.toBytes))
  }

  test("self-merge doubles the data instead of corrupting the buffer") {
    val dim = 6
    val rows = randRows(20, dim, 29)
    val fd = Fd.empty(4, dim)
    rows.foreach(fd.insert)
    fd.merge(fd)
    assert(fd.count == 40L)
    checkGuarantee(fd, rows ++ rows, dim, "self-merge")
  }

  test("bad magic and parameter validation are loud") {
    assertThrows[IllegalArgumentException](Fd.fromBytes(Array[Byte](1, 2, 3, 4, 0, 0, 0, 0)))
    assertThrows[IllegalArgumentException](Fd.empty(1, 4))
    val fd = Fd.empty(4, 4)
    assertThrows[IllegalArgumentException](fd.insert(new Array[Double](5)))
  }
}
