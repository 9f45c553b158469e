package graft.plans

import graft.core.FreqSketch
import graft.functions.Graft
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Inline, IntegerLiteral, Literal, NamedExpression, SortOrder}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort, Generate}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.Descending
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Misra-Gries top-k pairs aggregate: a grouping-less
  * `TypedImperativeAggregate[FreqSketch]` emitting the retained
  * (key, count) entries as `array<struct<key,cnt>>` in the library's
  * canonical heavy-hitter order (count desc, key asc) — the build side
  * of [[ApproxTopKRewriteRule]], which `Inline`s the array back into
  * rows under the query's own Sort/Limit. */
case class TopKPairsAggExpr(child: Expression,
                            capacity: Int = FreqSketch.DefaultCapacity,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got ${child.dataType.simpleString}")

  override def dataType: DataType = ApproxTopKRewriteRule.PairsType
  override def nullable: Boolean = false
  override def prettyName: String = "mg_topk_pairs_agg"

  override def createAggregationBuffer(): FreqSketch =
    FreqSketch.empty(capacity, Graft.SketchSeed)

  override def update(buffer: FreqSketch, input: InternalRow): FreqSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: FreqSketch, other: FreqSketch): FreqSketch =
    buffer.merge(other)

  override def eval(buffer: FreqSketch): Any = {
    val entries = buffer.topK(capacity)
    new GenericArrayData(entries.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }.toArray[Any])
  }

  override def serialize(buffer: FreqSketch): Array[Byte] = buffer.toBytes
  override def deserialize(storageFormat: Array[Byte]): FreqSketch =
    FreqSketch.fromBytes(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKPairsAggExpr =
    copy(child = newChild)
}

/** O80 — opt-in top-k-by-count -> Misra-Gries rewrite, the fourth
  * approximate-planner lever (O64 COUNT(DISTINCT)->HLL, O71
  * percentile->KLL, O76 mode->MG).
  *
  * The shape it retires is the single most common webtext query there
  * is — "the k most frequent tokens/hosts/urls":
  *
  *   SELECT key, count(*) AS cnt FROM t GROUP BY key
  *   ORDER BY cnt DESC [, key] LIMIT k
  *
  * Exactly evaluated, the aggregation's exchange carries one (key,
  * count) pair PER DISTINCT KEY — at corpus scale the full vocabulary
  * flows through the shuffle to produce k rows. Rewritten, each task
  * folds its rows into one fixed-`capacity` Misra-Gries buffer and the
  * exchange carries ONE buffer per task: O(capacity x tasks) bytes,
  * independent of vocabulary size. The query's own Sort/Limit are KEPT
  * on top (now sorting <= capacity rows), so result ordering and any
  * secondary tie-break columns behave identically.
  *
  * Result semantics: exact — counts and membership both — whenever the
  * true distinct-key count fits `capacity` (no MG decrement fires);
  * beyond that, counts undercount by at most n/capacity and the top-k
  * SET is guaranteed only for keys whose frequency clears that bound
  * (the classic heavy-hitter contract). NULL keys are excluded from
  * the approximate result where exact GROUP BY counts the null group
  * as a row — the library-wide aggregator convention and the standard
  * frequent-items posture (DataSketches frequent-items and
  * approx-top-k implementations ignore nulls); spec-pinned.
  * Result-changing, hence opt-in per query:
  * `spark.graft.approxTopK.enabled`, optional `.capacity`.
  *
  * Guards: fires only on GlobalLimit/LocalLimit(k) over a global Sort
  * whose PRIMARY order is the count column DESCENDING, over a
  * non-streaming Aggregate with exactly one deterministic non-foldable
  * STRING grouping expression and exactly two outputs — the key and an
  * unfiltered, non-distinct `count(*)`/`count(lit)` alias — with
  * k <= capacity (the retained set must cover the limit) and every
  * sort column drawn from those two outputs. Idempotent: the rewritten
  * subtree (grouping-less Aggregate under Generate) never re-matches.
  */
object ApproxTopKRewriteRule extends Rule[LogicalPlan] {

  val PairsType: ArrayType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  /** The aggregate output named expressions, when the plan matches:
    * (key output, count alias). */
  private def matchAgg(agg: Aggregate): Option[(NamedExpression, Alias)] = {
    if (agg.groupingExpressions.size != 1) return None
    val g = agg.groupingExpressions.head
    if (g.dataType != StringType || !g.deterministic || g.foldable) return None
    if (agg.aggregateExpressions.size != 2) return None
    val (keyOuts, rest) = agg.aggregateExpressions.partition {
      case a: Attribute => a.semanticEquals(g)
      case Alias(c, _) => c.semanticEquals(g)
      case _ => false
    }
    (keyOuts, rest) match {
      case (Seq(keyOut), Seq(cntOut: Alias)) =>
        cntOut.child match {
          case AggregateExpression(Count(cs), Complete, false, None, _)
              if cs.forall(c => c.foldable && c.isInstanceOf[Literal]
                && c.asInstanceOf[Literal].value != null) =>
            Some((keyOut, cntOut))
          case _ => None
        }
      case _ => None
    }
  }

  private def sortMatches(order: Seq[SortOrder], keyOut: NamedExpression,
                          cntOut: Alias): Boolean = {
    val primaryIsCntDesc = order.headOption.exists(so => so.child match {
      case a: Attribute => a.exprId == cntOut.exprId && so.direction == Descending
      case _ => false
    })
    val allKnown = order.forall(_.child match {
      case a: Attribute => a.exprId == cntOut.exprId || a.exprId == keyOut.exprId
      case _ => false
    })
    primaryIsCntDesc && allKnown
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.approxTopK.enabled", "false") != "true") return plan
    val capacity = conf.getConfString("spark.graft.approxTopK.capacity",
      FreqSketch.DefaultCapacity.toString).toInt
    plan.transformUp {
      case gl @ GlobalLimit(IntegerLiteral(k),
          ll @ LocalLimit(IntegerLiteral(k2),
          s @ Sort(order, true, agg: Aggregate, _)))
          if k == k2 && k <= capacity && !agg.child.isStreaming =>
        matchAgg(agg).filter { case (keyOut, cntOut) =>
          sortMatches(order, keyOut, cntOut)
        }.map { case (keyOut, cntOut) =>
          val pairs = Alias(AggregateExpression(
            TopKPairsAggExpr(agg.groupingExpressions.head, capacity),
            Complete, isDistinct = false), "__mg_topk_pairs")()
          val global = Aggregate(Nil, Seq(pairs), agg.child)
          val keyGen = AttributeReference("key", StringType, nullable = false)()
          val cntGen = AttributeReference("cnt", LongType, nullable = false)()
          val gen = Generate(Inline(pairs.toAttribute),
            unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
            generatorOutput = Seq(keyGen, cntGen), global)
          // re-establish the ORIGINAL output exprIds so the kept
          // Sort/Limit (and anything above) resolve unchanged
          val proj = Project(Seq(
            Alias(keyGen, keyOut.name)(exprId = keyOut.exprId),
            Alias(cntGen, cntOut.name)(exprId = cntOut.exprId)), gen)
          gl.copy(child = ll.copy(child = s.copy(child = proj)))
        }.getOrElse(gl)
    }
  }
}
