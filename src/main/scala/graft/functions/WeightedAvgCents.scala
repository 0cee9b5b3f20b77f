package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, If, IntegralDivide, Literal, Add, Multiply}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** The NATIVE-aggregate tier of the UDAF surface (SURVEY.md §2.12):
  * exact-integer weighted average Σ(v·w) div Σ(w) as a
  * DeclarativeAggregate — update/merge/evaluate are pure Catalyst
  * expression trees, so the whole aggregate participates in whole-stage
  * codegen and partial aggregation exactly like a built-in `sum` (the
  * `Aggregator` tier, [[WeightedAvg]], pays typed-encoder boxing at every
  * row; this tier pays nothing a built-in doesn't).
  *
  * Long in / long out keeps it deterministic under any merge order —
  * the double Aggregator depends on summation order for the final ulp,
  * this one cannot. Empty/zero-weight groups evaluate to NULL (the
  * IntegralDivide is guarded, so ANSI mode cannot raise). */
case class WeightedAvgCents(value: Expression, weight: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(value, weight)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == LongType && weight.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "wavg_cents expects (BIGINT, BIGINT), got " +
        s"(${value.dataType.simpleString}, ${weight.dataType.simpleString})")

  private lazy val sumVW =
    AttributeReference("sum_vw", LongType, nullable = false)()
  private lazy val sumW =
    AttributeReference("sum_w", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(sumVW, sumW)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    Add(sumVW, Multiply(value, weight)),
    Add(sumW, weight))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(sumVW.left, sumVW.right),
    Add(sumW.left, sumW.right))

  override lazy val evaluateExpression: Expression =
    If(EqualTo(sumW, Literal(0L)), Literal(null, LongType),
      IntegralDivide(sumVW, sumW))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), weight = newChildren(1))
}
