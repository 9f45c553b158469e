package graft.plans

import graft.core.{Cms, CountSketch, FreqSketch, Kll, TDigest}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One probe "kind" per sketch scalar function that can profit from the
  * literal-sketch rewrite (see [[ReplaceLiteralEbfProbe]]): it pins the
  * deserialize + the UDF body for one function, so a single native
  * expression class covers cms_estimate / topk_estimate / kll_quantile /
  * kll_rank / tdigest_quantile / tdigest_cdf the way
  * [[EbfLiteralProbeExpr]] covers ebf_might_contain.
  *
  * `eval` mirrors the registered UDF lambda EXACTLY (including the
  * null-key guard), argument arriving in Catalyst internal form
  * (UTF8String for keys, boxed Double for quantile/rank args).
  */
sealed abstract class SketchScalarKind(val fnName: String, val argType: DataType,
                                       val outType: DataType) extends Serializable {
  def deserialize(bytes: Array[Byte]): AnyRef
  def eval(sk: AnyRef, arg: Any): Any
}

object SketchScalarKinds {

  private def str(arg: Any): String =
    if (arg == null) null else arg.asInstanceOf[UTF8String].toString

  case object CmsEstimate extends SketchScalarKind("cms_estimate", StringType, LongType) {
    def deserialize(b: Array[Byte]): AnyRef = Cms.fromBytes(b)
    def eval(sk: AnyRef, arg: Any): Any = {
      val k = str(arg)
      if (k == null) 0L else sk.asInstanceOf[Cms].estimate(k)
    }
  }

  case object CsEstimate extends SketchScalarKind("cs_estimate", StringType, LongType) {
    def deserialize(b: Array[Byte]): AnyRef = CountSketch.fromBytes(b)
    def eval(sk: AnyRef, arg: Any): Any = {
      val k = str(arg)
      if (k == null) 0L else sk.asInstanceOf[CountSketch].estimate(k)
    }
  }

  case object TopkEstimate extends SketchScalarKind("topk_estimate", StringType, LongType) {
    def deserialize(b: Array[Byte]): AnyRef = FreqSketch.fromBytes(b)
    def eval(sk: AnyRef, arg: Any): Any = {
      val k = str(arg)
      if (k == null) 0L else sk.asInstanceOf[FreqSketch].estimate(k)
    }
  }

  case object KllQuantile extends SketchScalarKind("kll_quantile", DoubleType, DoubleType) {
    def deserialize(b: Array[Byte]): AnyRef = Kll.fromBytes(b)
    def eval(sk: AnyRef, arg: Any): Any =
      sk.asInstanceOf[Kll].quantile(arg.asInstanceOf[Double])
  }

  case object KllRank extends SketchScalarKind("kll_rank", DoubleType, DoubleType) {
    def deserialize(b: Array[Byte]): AnyRef = Kll.fromBytes(b)
    def eval(sk: AnyRef, arg: Any): Any =
      sk.asInstanceOf[Kll].rank(arg.asInstanceOf[Double])
  }

  case object TdQuantile extends SketchScalarKind("tdigest_quantile", DoubleType, DoubleType) {
    def deserialize(b: Array[Byte]): AnyRef = TDigest.fromBytes(b)
    def eval(sk: AnyRef, arg: Any): Any =
      sk.asInstanceOf[TDigest].quantile(arg.asInstanceOf[Double])
  }

  case object TdCdf extends SketchScalarKind("tdigest_cdf", DoubleType, DoubleType) {
    def deserialize(b: Array[Byte]): AnyRef = TDigest.fromBytes(b)
    def eval(sk: AnyRef, arg: Any): Any =
      sk.asInstanceOf[TDigest].cdf(arg.asInstanceOf[Double])
  }

  /** fnName -> kind, for the optimizer rule's udfName match. */
  val all: Map[String, SketchScalarKind] =
    Seq(CmsEstimate, CsEstimate, TopkEstimate, KllQuantile, KllRank, TdQuantile, TdCdf)
      .map(k => k.fnName -> k).toMap
}

/** Scalar sketch function over a LITERAL (plan-constant) serialized
  * sketch, deserialized lazily once per task and evaluated inside
  * whole-stage codegen — the generalization of [[EbfLiteralProbeExpr]]
  * to CMS / heavy-hitter / KLL / t-digest scalars.
  *
  * Why this exists: the generic scalar UDFs treat their sketch argument
  * as per-row data, so each row pays the SketchCache lookup — which,
  * since the cache verifies hits with `Arrays.equals` (a correctness
  * requirement), is a full memcmp of the sketch bytes PER ROW. When the
  * sketch is foldable the bytes are known at optimization time: this
  * expression pins them once (measured 34x on the EBF sibling for a
  * 2.7 MB sketch at 1M rows, BENCH/PLANS.md PLAN6).
  *
  * Null semantics per argument type, matching the UDF path exactly:
  * string keys pass null through to the (null-guarded) lambda body;
  * primitive double arguments follow Spark's primitive-UDF rule
  * (null in, null out, function never invoked).
  */
case class SketchLiteralScalarExpr(child: Expression, sketchBytes: Array[Byte],
                                   kind: SketchScalarKind) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == kind.argType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ${kind.argType.simpleString}, got ${child.dataType.simpleString}")

  override def dataType: DataType = kind.outType
  override def nullable: Boolean = kind.argType == DoubleType && child.nullable
  override def prettyName: String = s"${kind.fnName}_literal"

  // Case-class equality on Array[Byte] is reference-based, which would
  // make two semantically identical literal-sketch expressions compare
  // unequal and defeat plan canonicalization / common-subexpression
  // dedup. Content equality (same pattern as RangeBucketExpr) — only a
  // false NEGATIVE equality could exist without it, so results were
  // never wrong, just plans less shared.
  override def equals(other: Any): Boolean = other match {
    case SketchLiteralScalarExpr(c, bs, k) =>
      c == child && k == kind && java.util.Arrays.equals(bs, sketchBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + kind.hashCode()) +
      java.util.Arrays.hashCode(sketchBytes)

  @transient private lazy val sk: AnyRef = kind.deserialize(sketchBytes)

  /** Called from both interpreted eval and generated code. */
  def probeBoxed(arg: Any): Any = kind.eval(sk, arg)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null && kind.argType == DoubleType) null else kind.eval(sk, v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sketchLiteralScalar", this,
      classOf[SketchLiteralScalarExpr].getName)
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType) // "long" | "double"
    val boxed = CodeGenerator.boxedType(dataType)
    val unbox = s"${javaType}Value()"
    if (kind.argType == StringType) {
      // null key flows into the (guarded) body; result is never null
      ev.copy(
        code = code"""
          ${c.code}
          $javaType ${ev.value} =
            (($boxed) $self.probeBoxed(${c.isNull} ? null : ${c.value})).$unbox;
        """,
        isNull = FalseLiteral)
    } else if (nullable) {
      ev.copy(code = code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        if (!${ev.isNull}) {
          ${ev.value} = (($boxed) $self.probeBoxed(${c.value})).$unbox;
        }
      """)
    } else {
      ev.copy(
        code = code"""
          ${c.code}
          $javaType ${ev.value} = (($boxed) $self.probeBoxed(${c.value})).$unbox;
        """,
        isNull = FalseLiteral)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SketchLiteralScalarExpr =
    copy(child = newChild)
}
