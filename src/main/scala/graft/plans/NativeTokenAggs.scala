package graft.plans

import graft.core.{Ebf, Hash128, Hll, Kll, TDigest}
import graft.functions.SketchAggregators.{HostSketchBuf, TokenSketchBuf}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.{TernaryLike, UnaryLike}
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
