package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Symmetric int8 scalar quantization stats for a float vector — the
  * compression step an embedding-serving path runs before ANN at scale
  * (4× memory over float32, integer dot products downstream):
  *
  *   scale = max(|vـi|) / 127,   q_i = floor(v_i / scale + 0.5)
  *
  * Output struct: (scale, q_sum = Σ q_i, mse = Σ (v_i − q_i·scale)² / n).
  * Every accumulation is a sequential index-order fold in double, so the
  * generated DuckDB oracle (same folds via list_reduce) is bit-identical
  * — including the unrounded doubles, same as the cosine queries.
  * The all-zero vector quantizes to scale 0 / q 0 / mse 0 by definition.
  * Runs inside WholeStageCodegen; one pass for the max, one for the
  * quantize-and-error fold.
  */
case class QuantI8Stats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("mse", DoubleType, nullable = false)))

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quant_i8_stats requires ARRAY<FLOAT>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    val n = emb.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(emb.getFloat(i).toDouble)
      if (a > maxabs) maxabs = a
      i += 1
    }
    val scale = maxabs / 127.0
    var qsum = 0L
    var errsum = 0.0
    if (scale > 0) {
      i = 0
      while (i < n) {
        val v = emb.getFloat(i).toDouble
        val q = math.floor(v / scale + 0.5)
        qsum += q.toLong
        val e = v - q * scale
        errsum += e * e
        i += 1
      }
    }
    val mse = if (n > 0 && scale > 0) errsum / n else 0.0
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, qsum, mse))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, emb => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val maxabs = ctx.freshName("maxabs")
      val a = ctx.freshName("a")
      val scale = ctx.freshName("scale")
      val qsum = ctx.freshName("qsum")
      val errsum = ctx.freshName("errsum")
      val v = ctx.freshName("v")
      val q = ctx.freshName("q")
      val e = ctx.freshName("e")
      s"""
         |final int $n = $emb.numElements();
         |double $maxabs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $a = Math.abs((double) $emb.getFloat($i));
         |  if ($a > $maxabs) $maxabs = $a;
         |}
         |final double $scale = $maxabs / 127.0;
         |long $qsum = 0L;
         |double $errsum = 0.0;
         |if ($scale > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $v = (double) $emb.getFloat($i);
         |    final double $q = Math.floor($v / $scale + 0.5);
         |    $qsum += (long) $q;
         |    final double $e = $v - $q * $scale;
         |    $errsum += $e * $e;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $scale, $qsum,
         |    ($n > 0 && $scale > 0) ? $errsum / $n : 0.0 });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantI8Stats =
    copy(child = newChild)

  override def prettyName: String = "quant_i8_stats"
}

object QuantI8Stats {
  import org.apache.spark.sql.graft.ColumnBridge
  def quant_i8_stats(emb: Column): Column =
    ColumnBridge.column(QuantI8Stats(ColumnBridge.expression(emb)))
}
