package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (z-order) interleave of the low 16 bits of two longs as a
  * native codegen'd expression: bit i of `a` lands at position 2i, bit
  * i of `b` at 2i+1 — the multi-dimensional clustering key
  * `graft.operators.Layout` buckets files by.
  *
  * The kernel is the classic magic-number bit spreading (4 shift-mask
  * rounds per operand instead of 16 per-bit terms), runs inside
  * whole-stage codegen, and is SQL-registered as `morton16` via
  * [[graft.GraftExtensions]]. The DuckDB oracle restates the same
  * function as the expanded 32-term shift/mask expression — two
  * independent formulations, one contract.
  */
case class Morton16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton16 requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    Morton16.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Morton16.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Morton16 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "morton16"
}

object Morton16 {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Spread the low 16 bits of x to even positions (0,2,...,30). */
  private def spread(x0: Long): Long = {
    var x = x0 & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Static kernel — callable from generated code (janino) by name. */
  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)

  def morton16(a: Column, b: Column): Column =
    ColumnBridge.column(
      Morton16(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def builder(exprs: Seq[Expression]): Morton16 = exprs match {
    case Seq(a, b) => Morton16(a, b)
    case _ => throw new IllegalArgumentException(
      s"morton16 expects exactly 2 arguments, got ${exprs.length}")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "morton16", builder, "scala_udf")
}
