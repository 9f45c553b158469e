package graft.plans

import graft.core.Ebf
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, ScalaUDF, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Membership probe against a LITERAL (plan-constant) serialized EBF,
  * deserialized lazily once per task and probed inside whole-stage
  * codegen.
  *
  * Why this exists: the generic `ebf_might_contain` scalar UDF must
  * treat its sketch argument as per-row data, so each row pays the
  * SketchCache lookup — which, since the cache verifies hits with
  * `Arrays.equals` (a correctness requirement; see SketchCache), is a
  * full memcmp of the sketch bytes PER ROW. When the sketch is a
  * foldable expression the bytes are known at optimization time: this
  * expression pins them once, deserializes once per task, and the
  * per-row cost drops to the pure probe. [[ReplaceLiteralEbfProbe]]
  * rewrites qualifying UDF calls automatically.
  */
case class EbfLiteralProbeExpr(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key, got ${child.dataType}")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "ebf_literal_probe"

  @transient private lazy val ebf: Ebf = Ebf.fromBytes(sketchBytes)

  /** Called from both interpreted eval and generated code. */
  def probe(key: UTF8String): Boolean =
    key != null && ebf.mightContain(key.getBytes)

  override def eval(input: InternalRow): Any =
    probe(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ebfLiteralProbe", this,
      classOf[EbfLiteralProbeExpr].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = $self.probe(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): EbfLiteralProbeExpr =
    copy(child = newChild)
}

/** Optimizer rule: `ebf_might_contain(<foldable sketch>, key)` — the
  * natural way to write a probe in pure SQL (`X'…'` literals, scalar
  * subqueries folded by ConstantFolding) — becomes
  * [[EbfLiteralProbeExpr]]. Semantics preserved exactly: null sketch
  * probes to false (matching the UDF's null guard), null keys miss.
  *
  * Active in any session after `Graft.ensure` (via
  * `spark.experimental.extraOptimizations`) or configured globally via
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object ReplaceLiteralEbfProbe extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case u: ScalaUDF
        if u.udfName.contains("ebf_might_contain") && u.children.size == 2 &&
          u.children.head.foldable && u.children.head.dataType == BinaryType &&
          u.children(1).dataType == StringType =>
      // if the foldable sketch cannot be evaluated at plan time (e.g. a
      // failing ANSI cast), leave the UDF alone — the optimizer must
      // never fail for an expression the query might not even execute
      try {
        u.children.head.eval() match {
          case bytes: Array[Byte] => EbfLiteralProbeExpr(u.children(1), bytes)
          case null => Literal(false, BooleanType)
        }
      } catch { case _: Exception => u }
  }
}

/** `SparkSessionExtensions` entry point — the config-driven way to get
  * the graft optimizer rules without code changes:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  * (Function/aggregator registration still goes through
  * `Graft.ensure(spark)`, which also installs this rule via
  * `experimental.extraOptimizations`.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => ReplaceLiteralEbfProbe)
}
