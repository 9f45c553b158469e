package graft.plans

import graft.core.Hash128
import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftshim.{ColumnBridge, StringInputCast}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd kernels for the text-signature tier of the dedup
  * pipeline: MinHash signatures / band hashes / signature Jaccard,
  * SimHash, and winnowing fingerprints.
  *
  * Why these exist (r6, the O37/O42 pattern applied to its last
  * holdout): the signature step is a per-row map over what is, at
  * corpus scale, the WIDEST scan of the whole pipeline — every
  * document's full text — and it ran as boxed Scala `udf`s
  * (`Dedup.minhashPairs/simhashPairs/winnowPairs`,
  * `Decontaminate.contaminatedPairsViaWinnow`): each row paid
  * Catalyst->Scala conversion of the text, a boxed `Seq[Long]`
  * signature result, and a second UDF hop re-boxing that Seq for the
  * band hashes. These expressions run inside whole-stage codegen, read
  * the `UTF8String` bytes directly (tokenizing on the 0x20 byte, which
  * never occurs inside a multi-byte UTF-8 sequence), hash shingles
  * through `Hash128.hashBytesRange` with zero per-shingle string
  * allocation (contiguous single-space token runs hash the ORIGINAL
  * byte range; others assemble in a per-thread scratch buffer), and
  * return primitive `UnsafeArrayData` — no boxing anywhere.
  *
  * Numeric parity: the Scala kernels in [[TextFunctions]] remain the
  * spec reference; TextSigExprSpec asserts byte-identical signatures /
  * hashes / fingerprints against them on randomized inputs (including
  * multi-space, unicode and sub-shingle-length texts). Null semantics
  * deliberately match the retired UDFs, which passed null THROUGH to
  * the kernels rather than null-short-circuiting: minhash(null) is the
  * all-MaxValue signature, simhash(null) = 0, winnow(null) = empty —
  * so every expression here is non-nullable, which also spares
  * downstream operators their null checks.
  */
private[graft] object TextSig {

  private val scratchTL = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }
  private val tokTL = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }

  /** Maximal non-space byte runs == `split(' ').filter(_.nonEmpty)`.
    * Bounds land as [s0,e0,s1,e1,...] in the returned (reused) array;
    * the token count is the second element. */
  private def tokenize(b: Array[Byte]): (Array[Int], Int) = {
    var arr = tokTL.get()
    var nt = 0
    var i = 0
    val end = b.length
    while (i < end) {
      if (b(i) != ' ') {
        val s = i
        while (i < end && b(i) != ' ') i += 1
        if (2 * nt + 2 > arr.length) {
          arr = java.util.Arrays.copyOf(arr, arr.length * 2)
          tokTL.set(arr)
        }
        arr(2 * nt) = s
        arr(2 * nt + 1) = i
        nt += 1
      } else i += 1
    }
    (arr, nt)
  }

  /** MinHash signature over word `shingleN`-grams — byte-identical to
    * [[TextFunctions.minhash]] (TextSigExprSpec). */
  def minhashSig(u: UTF8String, numHashes: Int, shingleN: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (u == null) return sig
    val b = u.getBytes
    val (tok, nt) = tokenize(b)
    if (nt == 0) return sig

    // hash tokens [i0, i0+n) joined by single spaces; when they are
    // already single-space-separated in the input, hash the original
    // byte range in place (the common case for normalized text)
    def hashShingle(i0: Int, n: Int): Unit = {
      var contiguous = true
      var j = i0
      while (contiguous && j < i0 + n - 1) {
        if (tok(2 * j + 1) + 1 != tok(2 * (j + 1))) contiguous = false
        j += 1
      }
      val h =
        if (contiguous) {
          val s = tok(2 * i0)
          Hash128.hashBytesRange(b, s, tok(2 * (i0 + n - 1) + 1) - s, 0x77)
        } else {
          var need = n - 1
          var t = i0
          while (t < i0 + n) { need += tok(2 * t + 1) - tok(2 * t); t += 1 }
          var sc = scratchTL.get()
          if (sc.length < need) {
            sc = new Array[Byte](java.lang.Integer.highestOneBit(need) * 2)
            scratchTL.set(sc)
          }
          var p = 0
          t = i0
          while (t < i0 + n) {
            if (t > i0) { sc(p) = ' '; p += 1 }
            val l = tok(2 * t + 1) - tok(2 * t)
            System.arraycopy(b, tok(2 * t), sc, p, l)
            p += l
            t += 1
          }
          Hash128.hashBytesRange(sc, 0, p, 0x77)
        }
      var k = 0
      while (k < numHashes) {
        val v = h.h1 + k.toLong * h.h2 // H.derived(k)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
    }

    if (nt < shingleN) hashShingle(0, nt)
    else {
      var i = 0
      while (i <= nt - shingleN) { hashShingle(i, shingleN); i += 1 }
    }
    sig
  }

  /** Band hashes of a signature — identical to the retired band UDF:
    * `h = P; h = h*31 + sig(b*rows + r)` per band. */
  def bandHashes(sig: ArrayData, numBands: Int, rows: Int): Array[Long] = {
    val out = new Array[Long](numBands)
    var bnd = 0
    while (bnd < numBands) {
      var h = 1125899906842597L
      var r = 0
      while (r < rows) { h = h * 31 + sig.getLong(bnd * rows + r); r += 1 }
      out(bnd) = h
      bnd += 1
    }
    out
  }

  /** 64-bit SimHash — byte-identical to [[TextFunctions.simhash]],
    * including its `split(' ')` semantics (interior/leading EMPTY
    * tokens are hashed, trailing empties dropped). */
  def simhash64(u: UTF8String): Long = {
    if (u == null || u.numBytes() == 0) return 0L
    val b = u.getBytes
    val counts = new Array[Int](64)
    // segments between space bytes; Java's split(' ') drops trailing
    // empty segments, so scan back past trailing spaces first
    var end = b.length
    while (end > 0 && b(end - 1) == ' ') end -= 1
    if (end == 0) return 0L // all-space text: split(' ') yields no tokens
    var start = 0
    var i = 0
    while (i <= end) {
      if (i == end || b(i) == ' ') {
        val h = Hash128.hashBytesRange(b, start, i - start, 0x51).h1
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (counts(bit) > 0) out |= 1L << bit; bit += 1 }
    out
  }
}

/** MinHash signature expression: text -> array<long> of `numHashes`
  * shingle-minima. Non-nullable (null text -> all-MaxValue signature,
  * matching the retired UDF's pass-through-null behavior). */
case class MinhashSigExpr(child: Expression, numHashes: Int, shingleN: Int)
    extends UnaryExpression with StringInputCast {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_sig"

  def sigOf(u: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(TextSig.minhashSig(u, numHashes, shingleN))

  override def eval(input: InternalRow): Any =
    sigOf(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashSigExpr", this, classOf[MinhashSigExpr].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $self.sigOf(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

object MinhashSigExpr {
  def column(text: Column, numHashes: Int, shingleN: Int): Column =
    ColumnBridge.column(MinhashSigExpr(ColumnBridge.expression(text), numHashes, shingleN))
}

/** LSH band hashes over a MinHash signature: array<long> ->
  * array<long> of `numBands` rolling-31 hashes. */
case class MinhashBandsExpr(child: Expression, numBands: Int, rows: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_minhash_bands"

  def bandsOf(sig: ArrayData): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(TextSig.bandHashes(sig, numBands, rows))

  override protected def nullSafeEval(input: Any): Any =
    bandsOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashBandsExpr", this, classOf[MinhashBandsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$self.bandsOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashBandsExpr =
    copy(child = newChild)
}

object MinhashBandsExpr {
  def column(sig: Column, numBands: Int, rows: Int): Column =
    ColumnBridge.column(MinhashBandsExpr(ColumnBridge.expression(sig), numBands, rows))
}

/** Estimated Jaccard from two MinHash signatures: fraction of equal
  * positions — [[TextFunctions.minhashJaccard]] without the two
  * Seq[Long] boxing conversions per candidate pair. */
case class MinhashJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> args, got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_minhash_jaccard"

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var same = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) same += 1; i += 1 }
    same.toDouble / n
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashJaccardExpr", this, classOf[MinhashJaccardExpr].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$self.jaccard($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): MinhashJaccardExpr =
    copy(left = newLeft, right = newRight)
}

object MinhashJaccardExpr {
  def column(a: Column, b: Column): Column =
    ColumnBridge.column(MinhashJaccardExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** 64-bit SimHash expression: text -> long. Non-nullable (null -> 0,
  * matching the retired UDF's kernel pass-through). */
case class SimhashExpr(child: Expression)
    extends UnaryExpression with StringInputCast {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash64"

  def hashOf(u: UTF8String): Long = TextSig.simhash64(u)

  override def eval(input: InternalRow): Any =
    hashOf(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhashExpr", this, classOf[SimhashExpr].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = $self.hashOf(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object SimhashExpr {
  def column(text: Column): Column =
    ColumnBridge.column(SimhashExpr(ColumnBridge.expression(text)))
}

/** Winnowing fingerprints expression: text -> array<string> of distinct
  * window-min md5 gram hashes. The md5 construction IS the output
  * contract (the DuckDB oracle recomputes it), so this wraps the
  * [[TextFunctions.winnowFingerprints]] kernel unchanged and removes
  * only the UDF boundary: the per-row String->UTF8String conversions of
  * every fingerprint ran through a boxed converter; here they are
  * wrapped directly. Non-nullable (null -> empty array, kernel
  * semantics). */
case class WinnowFpExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with StringInputCast {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_winnow_fps"

  def fpsOf(u: UTF8String): ArrayData = {
    val fps = TextFunctions.winnowFingerprints(if (u == null) null else u.toString, k, w)
    val out = new Array[AnyRef](fps.length)
    var i = 0
    while (i < fps.length) { out(i) = UTF8String.fromString(fps(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    fpsOf(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnowFpExpr", this, classOf[WinnowFpExpr].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $self.fpsOf(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFpExpr =
    copy(child = newChild)
}

object WinnowFpExpr {
  def column(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFpExpr(ColumnBridge.expression(text), k, w))
}
