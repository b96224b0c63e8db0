package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 16-bit × 16-bit grid cell as a native
  * codegen'd expression — the space-filling curve with strictly better
  * locality than Morton/z-order (every curve step is an axis-adjacent
  * move, so a 2-D range decomposes into fewer, longer runs of the
  * 1-D key; the multi-dimensional clustering key modern table formats
  * prefer for OPTIMIZE ... BY).
  *
  * The kernel is the classic xy→d walk (Hamilton's / the Wikipedia
  * `xy2d` form): 16 quadrant levels, each contributing s²·((3·rx)⊕ry)
  * and rotating the frame. Runs inside whole-stage codegen via a
  * static-callable loop; SQL-registered as `hilbert16` through
  * [[graft.GraftExtensions]]. The DuckDB oracle restates the SAME walk
  * as a generated 16-step CTE chain carrying (x, y, d) — two
  * independent formulations, one contract
  * (`graft.operators.Layout.layoutHilbert`).
  */
case class Hilbert16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert16 requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert16.index(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Hilbert16.index($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hilbert16 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert16"
}

object Hilbert16 {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Static kernel — callable from generated code (janino) by name. */
  def index(x0: Long, y0: Long): Long = {
    var x = x0 & 0xffffL
    var y = y0 & 0xffffL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbert16(a: Column, b: Column): Column =
    ColumnBridge.column(
      Hilbert16(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def builder(exprs: Seq[Expression]): Hilbert16 = exprs match {
    case Seq(a, b) => Hilbert16(a, b)
    case _ => throw new IllegalArgumentException(
      s"hilbert16 expects exactly 2 arguments, got ${exprs.length}")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert16", builder, "scala_udf")
}
