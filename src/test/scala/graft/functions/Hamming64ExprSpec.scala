package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class Hamming64ExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native hamming matches the Scala reference (codegen path)") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (0L, -1L), (0x5555555555555555L, -6148914691236517206L),
      (123456789L, 987654321L), (Long.MinValue, Long.MaxValue))
    val df = pairs.toDF("a", "b")
      .select($"a", $"b", Hamming64.hamming64($"a", $"b").as("d"))
    df.collect().foreach { r =>
      assert(r.getInt(2) == Hashing.hamming(r.getLong(0), r.getLong(1)))
    }
  }

  test("registered SQL function resolves") {
    Hamming64.register(spark)
    assert(spark.sql("SELECT hamming64(CAST(0 AS BIGINT), CAST(-1 AS BIGINT)) AS d")
      .collect()(0).getInt(0) == 64)
  }

  test("extensions installer registers both functions on a SparkSessionExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    // registered builders are applied to a fresh function registry clone
    val reg = spark.sessionState.functionRegistry.clone()
    org.apache.spark.sql.graft.ColumnBridge.applyFunctionInjections(ext, reg)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    assert(reg.functionExists(FunctionIdentifier("fnv_hash64")))
    assert(reg.functionExists(FunctionIdentifier("hamming64")))
  }

  test("injected unary builders validate arity instead of exprs.head-crashing") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    val reg = spark.sessionState.functionRegistry.clone()
    org.apache.spark.sql.graft.ColumnBridge.applyFunctionInjections(ext, reg)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.Literal
    for (fn <- Seq("minhash_sig", "quant_i8_stats", "simhash_sig")) {
      val builder = reg.lookupFunctionBuilder(FunctionIdentifier(fn)).get
      val zero = intercept[IllegalArgumentException](builder(Seq.empty))
      assert(zero.getMessage.contains(s"$fn expects exactly 1 argument"))
      val two = intercept[IllegalArgumentException](
        builder(Seq(Literal("a"), Literal("b"))))
      assert(two.getMessage.contains("got 2"))
    }
  }
}
