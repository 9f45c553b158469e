package graft.plans

import graft.core.{Ebf, Hash128, Hll, Kll, TDigest}
import graft.functions.SketchAggregators.{HostSketchBuf, TokenSketchBuf}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native (TypedImperativeAggregate) forms of the two flagship
  * workhorse aggregators. The `udaf()`-wrapped versions pay a
  * catalyst->scala converter crossing PER ROW:
  *
  *  - the fused per-host aggregator allocates a Tuple3 + two boxed
  *    Longs + a boxed Double per row on the reduce side of the
  *    clustering exchange (32M rows in the flagship bench);
  *  - the token aggregator converts each UTF8String text to a Java
  *    String (UTF-8 decode into a fresh char[]) only for the kernel to
  *    re-ENCODE it right back to UTF-8 bytes.
  *
  * ScalingProbe's stage decomposition (PLAN13) showed this converter
  * stack, not sketch arithmetic, dominating reduce-side CPU and its
  * allocation traffic degrading 8->32-thread scaling. These forms read
  * the InternalRow directly — zero boxing, and for text ONE raw UTF-8
  * byte copy instead of decode+encode. Outputs are byte-identical to
  * the udaf forms (same inserts in the same order; spec-asserted in
  * NativeSketchAggsSpec).
  */
object NativeTokenAggs {
  private[plans] val hostSketchesType = StructType(Seq(
    StructField("ebf", BinaryType, nullable = false),
    StructField("hll", BinaryType, nullable = false),
    StructField("kll", BinaryType, nullable = false),
    StructField("td", BinaryType, nullable = false)))

  private[plans] val tokenSketchesType = StructType(Seq(
    StructField("cms", BinaryType, nullable = false),
    StructField("topk", BinaryType, nullable = false)))

  private[plans] def writeChunks(chunks: Array[Array[Byte]]): Array[Byte] = {
    val total = 4 * chunks.length + chunks.map(_.length).sum
    val buf = java.nio.ByteBuffer.allocate(total)
    chunks.foreach { c => buf.putInt(c.length); buf.put(c) }
    buf.array()
  }

  private[plans] def readChunks(bytes: Array[Byte], n: Int): Array[Array[Byte]] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(n) {
      val len = buf.getInt()
      val c = new Array[Byte](len)
      buf.get(c)
      c
    }
  }
}

/** Fused per-(group) EBF+HLL+KLL+t-digest build fed url-hash halves and
  * a length — the native twin of `PerHostSketchesHashAgg`. Null hash
  * halves skip the key sketches; null length skips the quantile
  * sketches (identical to the udaf form). */
case class PerHostSketchesNativeAgg(first: Expression, second: Expression,
                                    third: Expression,
                                    m0: Int, k: Int, l0: Int, aNum: Int, aDen: Int,
                                    hllP: Int, kllK: Int, tdCompression: Double, seed: Long,
                                    mutableAggBufferOffset: Int = 0,
                                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HostSketchBuf] with TernaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == LongType && second.dataType == LongType &&
        third.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint, double), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")

  override def dataType: DataType = NativeTokenAggs.hostSketchesType
  override def nullable: Boolean = false
  override def prettyName: String = "per_host_sketches_native_agg"

  override def createAggregationBuffer(): HostSketchBuf = new HostSketchBuf(
    Ebf.empty(m0, k, l0, aNum, aDen, seed), Hll.empty(hllP, seed),
    Kll.empty(kllK), TDigest.empty(tdCompression))

  override def update(b: HostSketchBuf, input: InternalRow): HostSketchBuf = {
    val a = first.eval(input)
    if (a != null) {
      val h2 = second.eval(input)
      if (h2 != null) {
        val h1l = a.asInstanceOf[Long]
        b.ebf.insertHash(Hash128.H(h1l, h2.asInstanceOf[Long]))
        b.hll.addHash(h1l)
      }
    }
    val v = third.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      b.kll.add(d)
      b.td.add(d)
    }
    b
  }

  override def merge(a: HostSketchBuf, b: HostSketchBuf): HostSketchBuf = {
    a.ebf.merge(b.ebf); a.hll.merge(b.hll); a.kll.merge(b.kll); a.td.merge(b.td)
    a
  }

  override def eval(b: HostSketchBuf): Any =
    InternalRow(b.ebf.toBytes, b.hll.toBytes, b.kll.toBytes, b.td.toBytes)

  override def serialize(b: HostSketchBuf): Array[Byte] =
    NativeTokenAggs.writeChunks(Array(b.ebf.toBytes, b.hll.toBytes, b.kll.toBytes, b.td.toBytes))

  override def deserialize(bytes: Array[Byte]): HostSketchBuf = {
    val c = NativeTokenAggs.readChunks(bytes, 4)
    new HostSketchBuf(Ebf.fromBytes(c(0)), Hll.fromBytes(c(1)),
      Kll.fromBytes(c(2)), TDigest.fromBytes(c(3)))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PerHostSketchesNativeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PerHostSketchesNativeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PerHostSketchesNativeAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PerHostSketchesNativeAgg {
  def column(h1: Column, h2: Column, len: Column,
             m0: Int, k: Int, l0: Int, aNum: Int, aDen: Int,
             hllP: Int, kllK: Int, tdCompression: Double, seed: Long): Column =
    ColumnBridge.column(AggregateExpression(
      PerHostSketchesNativeAgg(ColumnBridge.expression(h1), ColumnBridge.expression(h2),
        ColumnBridge.expression(len), m0, k, l0, aNum, aDen, hllP, kllK,
        tdCompression, seed),
      Complete, isDistinct = false))
}

/** Buffer for the batched token kernel: the CMS+MG pair plus a pending
  * token-hash ring. MG updates stay inline (its open-addressed table is
  * cache-resident); CMS updates are deferred and applied ROW-MAJOR at
  * flush — `depth` sequential passes each confined to one 8*width-byte
  * row slice, instead of `depth` scattered writes across the whole
  * table per token (the L3-thrashing pattern named by the round-3
  * scaling analysis). Addition is commutative, so the final table is
  * bit-identical to unbatched. */
final class BatchedTokenBuf(val buf: TokenSketchBuf, val batch: Int) extends Serializable {
  val pendH1 = new Array[Long](batch)
  val pendH2 = new Array[Long](batch)
  var pending = 0

  def addToken(h: Hash128.H): Unit = {
    pendH1(pending) = h.h1
    pendH2(pending) = h.h2
    pending += 1
    if (pending == batch) flush()
  }

  def flush(): Unit = {
    if (pending == 0) return
    val cms = buf.cms
    val n = pending
    var r = 0
    while (r < cms.depth) {
      var i = 0
      while (i < n) {
        cms.bumpRow(r, pendH1(i) + (r + 1).toLong * pendH2(i))
        i += 1
      }
      r += 1
    }
    cms.total += n
    pending = 0
  }
}

/** Per-lang CMS + Misra-Gries over text tokens — the native twin of
  * `CmsTopkTokensAgg`: consumes the UTF8String's raw UTF-8 bytes (one
  * copy; the udaf form decodes to String then re-encodes), optionally
  * with the row-major batched CMS kernel (`batchTokens` > 0). Output is
  * byte-identical to the udaf form for any batch setting. */
case class CmsTopkTokensNativeAgg(child: Expression,
                                  depth: Int, width: Int, capacity: Int, seed: Long,
                                  batchTokens: Int = 0,
                                  mutableAggBufferOffset: Int = 0,
                                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BatchedTokenBuf] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string text column, got ${child.dataType.simpleString}")

  override def dataType: DataType = NativeTokenAggs.tokenSketchesType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_topk_tokens_native_agg"

  override def createAggregationBuffer(): BatchedTokenBuf =
    new BatchedTokenBuf(new TokenSketchBuf(
      graft.core.Cms.empty(depth, width, seed),
      graft.core.FreqSketch.empty(capacity, seed)), math.max(1, batchTokens))

  override def update(b: BatchedTokenBuf, input: InternalRow): BatchedTokenBuf = {
    val v = child.eval(input)
    if (v == null) return b
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    val batched = batchTokens > 0
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        if (i > start) {
          val h = Hash128.hashBytesRange(bytes, start, i - start, seed)
          if (batched) b.addToken(h) else b.buf.cms.addHash(h, 1L)
          b.buf.topk.addRangeHashed(bytes, start, i - start, 1L, h.h1)
        }
        start = i + 1
      }
      i += 1
    }
    b
  }

  override def merge(a: BatchedTokenBuf, b: BatchedTokenBuf): BatchedTokenBuf = {
    a.flush(); b.flush()
    a.buf.cms.merge(b.buf.cms)
    a.buf.topk.merge(b.buf.topk)
    a
  }

  override def eval(b: BatchedTokenBuf): Any = {
    b.flush()
    InternalRow(b.buf.cms.toBytes, b.buf.topk.toBytes)
  }

  override def serialize(b: BatchedTokenBuf): Array[Byte] = {
    b.flush()
    NativeTokenAggs.writeChunks(Array(b.buf.cms.toBytes, b.buf.topk.toBytes))
  }

  override def deserialize(bytes: Array[Byte]): BatchedTokenBuf = {
    val c = NativeTokenAggs.readChunks(bytes, 2)
    new BatchedTokenBuf(new TokenSketchBuf(
      graft.core.Cms.fromBytes(c(0)), graft.core.FreqSketch.fromBytes(c(1))),
      math.max(1, batchTokens))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsTopkTokensNativeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsTopkTokensNativeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsTopkTokensNativeAgg =
    copy(child = newChild)
}

object CmsTopkTokensNativeAgg {
  def column(text: Column, depth: Int, width: Int, capacity: Int, seed: Long,
             batchTokens: Int = 0): Column =
    ColumnBridge.column(AggregateExpression(
      CmsTopkTokensNativeAgg(ColumnBridge.expression(text), depth, width, capacity,
        seed, batchTokens),
      Complete, isDistinct = false))
}

/** Per-LANG token sketches in ONE un-grouped aggregate: the buffer is a
  * small open map lang -> [[BatchedTokenBuf]], so the aggregation can
  * run as a side-channel metric on a flowing dataset
  * (`Dataset.observe` / CollectMetrics — which only admits global
  * aggregates) while the main plan continues. This is what lets the
  * flagship compute phase 2 DURING phase 1's scan instead of paying the
  * 13 GB text scan twice (PLAN16). Output: map<lang,
  * struct<cms binary, topk binary>>, entries emitted in lang order.
  *
  * Merge-order caveat (same as everywhere in the library): CMS bytes
  * are identical under any merge order; Misra-Gries heavy hitters are
  * guarantee-stable but not byte-stable, and the accumulator's
  * task-completion merge order is nondeterministic — the fused-vs-
  * grouped spec therefore compares CMS bytes exactly and MG at the
  * heavy-hitter level.
  */
case class PerLangTokenSketchesAgg(left: Expression, right: Expression,
                                   depth: Int, width: Int, capacity: Int, seed: Long,
                                   batchTokens: Int = 0,
                                   mutableAggBufferOffset: Int = 0,
                                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[String, BatchedTokenBuf]]
    with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (lang string, text string), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType =
    MapType(StringType, NativeTokenAggs.tokenSketchesType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "per_lang_token_sketches_agg"

  // TreeMap: deterministic lang-ordered iteration for serialize/eval
  override def createAggregationBuffer(): java.util.TreeMap[String, BatchedTokenBuf] =
    new java.util.TreeMap[String, BatchedTokenBuf]()

  private def newBuf(): BatchedTokenBuf =
    new BatchedTokenBuf(new TokenSketchBuf(
      graft.core.Cms.empty(depth, width, seed),
      graft.core.FreqSketch.empty(capacity, seed)), math.max(1, batchTokens))

  override def update(m: java.util.TreeMap[String, BatchedTokenBuf],
                      input: InternalRow): java.util.TreeMap[String, BatchedTokenBuf] = {
    val l = left.eval(input)
    if (l == null) return m
    val v = right.eval(input)
    if (v == null) return m
    val lang = l.asInstanceOf[UTF8String].toString // tiny, interned-ish per lang
    var b = m.get(lang)
    if (b == null) { b = newBuf(); m.put(lang, b) }
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    val batched = batchTokens > 0
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        if (i > start) {
          val h = Hash128.hashBytesRange(bytes, start, i - start, seed)
          if (batched) b.addToken(h) else b.buf.cms.addHash(h, 1L)
          b.buf.topk.addRangeHashed(bytes, start, i - start, 1L, h.h1)
        }
        start = i + 1
      }
      i += 1
    }
    m
  }

  override def merge(a: java.util.TreeMap[String, BatchedTokenBuf],
                     b: java.util.TreeMap[String, BatchedTokenBuf]): java.util.TreeMap[String, BatchedTokenBuf] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val mine = a.get(e.getKey)
      if (mine == null) a.put(e.getKey, e.getValue)
      else {
        mine.flush(); e.getValue.flush()
        mine.buf.cms.merge(e.getValue.buf.cms)
        mine.buf.topk.merge(e.getValue.buf.topk)
      }
    }
    a
  }

  override def eval(m: java.util.TreeMap[String, BatchedTokenBuf]): Any = {
    val n = m.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      e.getValue.flush()
      keys(i) = UTF8String.fromString(e.getKey)
      vals(i) = InternalRow(e.getValue.buf.cms.toBytes, e.getValue.buf.topk.toBytes)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(keys, vals)
  }

  override def serialize(m: java.util.TreeMap[String, BatchedTokenBuf]): Array[Byte] = {
    val entries = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      e.getValue.flush()
      entries += e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      entries += e.getValue.buf.cms.toBytes
      entries += e.getValue.buf.topk.toBytes
    }
    NativeTokenAggs.writeChunks(entries.toArray)
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[String, BatchedTokenBuf] = {
    val m = createAggregationBuffer()
    val buf = java.nio.ByteBuffer.wrap(bytes)
    while (buf.hasRemaining) {
      def chunk(): Array[Byte] = {
        val len = buf.getInt(); val c = new Array[Byte](len); buf.get(c); c
      }
      val lang = new String(chunk(), java.nio.charset.StandardCharsets.UTF_8)
      val cms = graft.core.Cms.fromBytes(chunk())
      val topk = graft.core.FreqSketch.fromBytes(chunk())
      m.put(lang, new BatchedTokenBuf(new TokenSketchBuf(cms, topk), math.max(1, batchTokens)))
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PerLangTokenSketchesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PerLangTokenSketchesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PerLangTokenSketchesAgg =
    copy(left = newLeft, right = newRight)
}

object PerLangTokenSketchesAgg {
  def column(lang: Column, text: Column, depth: Int, width: Int, capacity: Int,
             seed: Long, batchTokens: Int = 0): Column =
    ColumnBridge.column(AggregateExpression(
      PerLangTokenSketchesAgg(ColumnBridge.expression(lang), ColumnBridge.expression(text),
        depth, width, capacity, seed, batchTokens),
      Complete, isDistinct = false))
}
