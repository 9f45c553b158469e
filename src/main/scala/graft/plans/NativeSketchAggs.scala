package graft.plans

import graft.core.{Ebf, Hash128}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native hash-fed EBF aggregate — the `TypedImperativeAggregate` twin
  * of the `udaf()`-wrapped `EbfHashAgg`.
  *
  * Why: a ScalaAggregator UDAF pays a catalyst->scala converter
  * crossing PER ROW — for the (h1, h2) pair that is a Tuple2 plus two
  * boxed Longs allocated per input row. On the flagship's sharded
  * build that stack measured ~1.8 us/row on the reduce side (64 tasks
  * x 500K rows: ~58 s of CPU for ~6 s of actual sketch inserts —
  * ScalingProbe stage decomposition, BENCH/PLANS.md PLAN13), and the
  * allocation traffic is exactly what stops the stage from scaling
  * 8 -> 32 threads on a shared memory system. This expression reads
  * the two longs straight off the `InternalRow` — zero allocation per
  * row — and produces byte-identical sketches (same inserts, same
  * merge; spec-asserted in NativeSketchAggsSpec).
  *
  * Null handling mirrors `EbfHashAgg`: a null in either half skips the
  * row. Buffers serialize through the EBF wire format (no Kryo).
  */
case class EbfHashBuildAgg(left: Expression, right: Expression,
                           m0: Int, k: Int, l0: Int, aNum: Int, aDen: Int, seed: Long,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Ebf] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint hash halves, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "ebf_hash_build_agg"

  override def createAggregationBuffer(): Ebf = Ebf.empty(m0, k, l0, aNum, aDen, seed)

  override def update(buffer: Ebf, input: InternalRow): Ebf = {
    val a = left.eval(input)
    if (a != null) {
      val b = right.eval(input)
      if (b != null)
        buffer.insertHash(Hash128.H(a.asInstanceOf[Long], b.asInstanceOf[Long]))
    }
    buffer
  }

  override def merge(buffer: Ebf, other: Ebf): Ebf = buffer.merge(other)
  override def eval(buffer: Ebf): Any = buffer.toBytes
  override def serialize(buffer: Ebf): Array[Byte] = buffer.toBytes
  override def deserialize(storageFormat: Array[Byte]): Ebf = Ebf.fromBytes(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): EbfHashBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): EbfHashBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): EbfHashBuildAgg =
    copy(left = newLeft, right = newRight)
}

object EbfHashBuildAgg {
  /** Aggregate Column over (h1, h2) hash-half columns. */
  def column(h1: Column, h2: Column, m0: Int, k: Int, l0: Int,
             aNum: Int, aDen: Int, seed: Long): Column =
    ColumnBridge.column(AggregateExpression(
      EbfHashBuildAgg(ColumnBridge.expression(h1), ColumnBridge.expression(h2),
        m0, k, l0, aNum, aDen, seed),
      Complete, isDistinct = false))
}
