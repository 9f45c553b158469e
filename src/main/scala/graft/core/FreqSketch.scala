package graft.core

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Misra-Gries heavy-hitter ("frequent items") sketch over strings,
  * following the mergeable-summaries formulation (Agarwal, Cormode,
  * Huang, Phillips, Wei, Yi, "Mergeable Summaries", PODS'12) — the same
  * family as the Apache DataSketches `frequencies` package.
  *
  * At most `capacity` counters are kept. Inserting a tracked item
  * increments its counter; inserting an untracked item into a full
  * sketch decrements every counter (by the inserted weight, clamped to
  * the smallest live counter, dropping zeros — the classic by-1 sweep
  * generalized to weighted inserts) — amortized O(1) per insertion,
  * since each sweep consumes at least `capacity` previously-inserted
  * count units. Merging sums counters
  * pointwise and, if more than `capacity` survive, subtracts the
  * (capacity+1)-th largest count from all and drops the non-positive.
  *
  * Guarantees (maintained across arbitrary merge orderings):
  *   - `estimate(x)` never overestimates: estimate <= true count;
  *   - `true count - estimate <= maxError`, where [[maxError]] is the
  *     cumulative decrement tracked by the sketch itself, and
  *     `maxError <= n / (capacity + 1)`;
  *   - hence every item with true count > n/(capacity+1) is tracked
  *     (no false negatives among heavy hitters).
  *
  * Like KLL/t-digest — and unlike EBF/HLL/CMS — the exact counter values
  * depend on merge order; the guarantees above are what is
  * order-independent. Serialization is canonical for a given state
  * (entries sorted by item), so serde round-trips are byte-stable.
  *
  * Why this exists next to CMS: a CMS answers point frequency queries
  * but cannot *enumerate* the heavy hitters — extracting a top-k from a
  * CMS requires a pass over the distinct-item relation, which at web
  * scale is exactly the relation the sketch was supposed to avoid
  * materializing. Misra-Gries carries its candidate set with it.
  */
final class FreqSketch(var capacity: Int) extends BytesSerde {
  require(capacity >= 1 && capacity <= 1000000,
    s"capacity must be in [1, 1000000], got $capacity")

  private[core] var counts = new java.util.HashMap[String, java.lang.Long](capacity * 2)
  var n: Long = 0L
  var maxError: Long = 0L

  def numTracked: Int = counts.size()

  def add(item: String): Unit = add(item, 1L)

  def add(item: String, w: Long): Unit = {
    if (item == null || w <= 0) return
    n += w
    val cur = counts.get(item)
    if (cur != null) { counts.put(item, cur.longValue() + w); return }
    if (counts.size() < capacity) { counts.put(item, w); return }
    // full + untracked: absorb what fits as error. Decrement every
    // counter by min(w, smallest counter that survives the sweep) — the
    // classic by-1 sweep generalized to weights so weighted inserts and
    // merge-added counts stay amortized.
    val dec = math.min(w, minCount())
    maxError += dec
    decrementAll(dec)
    if (w > dec) counts.put(item, w - dec)
  }

  /** Tokenize on single spaces (empty tokens skipped — same semantics
    * as [[Cms.addTextTokens]]) and add each token. */
  def addTextTokens(text: String): Unit = {
    if (text == null || text.isEmpty) return
    var start = 0
    var i = 0
    val len = text.length
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        if (i > start) add(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
  }

  private def minCount(): Long = {
    var m = Long.MaxValue
    val it = counts.values().iterator()
    while (it.hasNext) { val v = it.next().longValue(); if (v < m) m = v }
    if (m == Long.MaxValue) 0L else m
  }

  private def decrementAll(by: Long): Unit = {
    if (by <= 0) return
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue.longValue() - by
      if (v <= 0) it.remove() else e.setValue(v)
    }
  }

  /** Lower-bound frequency estimate: in [true - maxError, true]. */
  def estimate(item: String): Long = {
    val v = counts.get(item)
    if (v == null) 0L else v.longValue()
  }

  /** Upper-bound frequency estimate. */
  def upperBound(item: String): Long = estimate(item) + maxError

  /** Top `k` tracked items by estimated count, ties broken by item
    * ascending (deterministic output for a given sketch state). */
  def topK(k: Int): Seq[(String, Long)] = {
    val all = new Array[(String, Long)](counts.size())
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); all(i) = (e.getKey, e.getValue.longValue()); i += 1 }
    all.sortBy { case (item, c) => (-c, item) }.take(k).toSeq
  }

  def merge(other: FreqSketch): FreqSketch = {
    require(capacity == other.capacity,
      "cannot merge FreqSketch with different capacities")
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey,
        if (cur == null) e.getValue else java.lang.Long.valueOf(cur.longValue() + e.getValue.longValue()))
    }
    n += other.n
    maxError += other.maxError
    if (counts.size() > capacity) {
      // subtract the (capacity+1)-th largest count from everything;
      // exactly `capacity` or fewer strictly-positive counters survive
      val vals = new Array[Long](counts.size())
      val vit = counts.values().iterator()
      var i = 0
      while (vit.hasNext) { vals(i) = vit.next().longValue(); i += 1 }
      java.util.Arrays.sort(vals)
      val kth = vals(vals.length - capacity - 1)
      maxError += kth
      decrementAll(kth)
    }
    this
  }

  def toBytes: Array[Byte] = {
    // canonical: entries sorted by item (byte-stable serde round trips)
    val items = topK(counts.size()).sortBy(_._1)
    var payload = 0
    items.foreach { case (s, _) => payload += 4 + s.getBytes(StandardCharsets.UTF_8).length + 8 }
    val buf = ByteBuffer.allocate(4 + 4 + 8 + 8 + 4 + payload)
    buf.putInt(FreqSketch.MAGIC)
    buf.putInt(capacity)
    buf.putLong(n)
    buf.putLong(maxError)
    buf.putInt(items.size)
    items.foreach { case (s, c) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      buf.putInt(b.length)
      buf.put(b)
      buf.putLong(c)
    }
    buf.array()
  }

  private[core] def loadBytes(bytes: Array[Byte]): Unit = {
    val in = ByteBuffer.wrap(bytes)
    val magic = in.getInt()
    require(magic == FreqSketch.MAGIC, f"bad FreqSketch magic 0x$magic%08x")
    capacity = in.getInt()
    n = in.getLong()
    maxError = in.getLong()
    val sz = in.getInt()
    counts = new java.util.HashMap[String, java.lang.Long](capacity * 2)
    var i = 0
    while (i < sz) {
      val len = in.getInt()
      val b = new Array[Byte](len)
      in.get(b)
      counts.put(new String(b, StandardCharsets.UTF_8), in.getLong())
      i += 1
    }
  }
}

object FreqSketch {
  val MAGIC: Int = 0x46515331 // "FQS1"
  val DefaultCapacity = 256

  def empty(capacity: Int = DefaultCapacity): FreqSketch = new FreqSketch(capacity)

  def fromBytes(bytes: Array[Byte]): FreqSketch = {
    val f = new FreqSketch(1)
    f.loadBytes(bytes)
    f
  }
}
