package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for FNV-1a 64 over a string's UTF-8 bytes —
  * preference (b) from the build guidance: a codegen'd `Expression`
  * instead of a Scala UDF, so the dedup hash path stays inside
  * whole-stage codegen (no SerDe boundary, no boxing per row).
  *
  * Must produce exactly [[Hashing.fnv1a64]] — asserted property-style in
  * FnvHash64ExprSpec for both the interpreted and codegen paths.
  */
case class FnvHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv_hash64 requires STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h ^= ($bytes[$i] & 0xffL);
         |  $h *= 0x100000001b3L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FnvHash64 =
    copy(child = newChild)

  override def prettyName: String = "fnv_hash64"
}

object FnvHash64 {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column-API entry point (Spark-4 classic Column↔Expression bridge). */
  def fnv_hash64(c: Column): Column =
    ColumnBridge.column(FnvHash64(ColumnBridge.expression(c)))

  /** Builder with arity validation (raw Seq indexing would surface as a
    * bare NoSuchElementException from inside the analyzer).
    */
  def builder(exprs: Seq[Expression]): FnvHash64 = exprs match {
    case Seq(e) => FnvHash64(e)
    case _ => throw new IllegalArgumentException(
      s"fnv_hash64 expects exactly 1 argument, got ${exprs.length}")
  }

  /** Register as a SQL function on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv_hash64", builder, "scala_udf")
}
