package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Hamming distance between two 64-bit signatures as a native codegen'd
  * expression — `bitCount(a ^ b)` stays inside whole-stage codegen in
  * the SimHash verification join (graft.operators.Dedup.simhashPairs).
  */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming64 requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming64 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hamming64"
}

object Hamming64 {
  import org.apache.spark.sql.graft.ColumnBridge

  def hamming64(a: Column, b: Column): Column =
    ColumnBridge.column(
      Hamming64(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def builder(exprs: Seq[Expression]): Hamming64 = exprs match {
    case Seq(a, b) => Hamming64(a, b)
    case _ => throw new IllegalArgumentException(
      s"hamming64 expects exactly 2 arguments, got ${exprs.length}")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming64", builder, "scala_udf")
}
