package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class Morton16ExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Naive per-bit reference — the formulation the DuckDB oracle runs. */
  private def naive(a: Long, b: Long): Long =
    (0 until 16).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("magic-number spreading matches the per-bit reference (codegen path)") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (0xffffL, 0L), (0L, 0xffffL), (0xffffL, 0xffffL),
      (1L, 2L), (0x1234L, 0xabcdL), (65535L, 32768L),
      // out-of-range bits must be masked off, not interleaved
      (0x7fffffffffffffffL, 0x10000L))
    val df = cases.toDF("a", "b")
      .select($"a", $"b", Morton16.morton16($"a", $"b").as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == naive(r.getLong(0) & 0xffffL, r.getLong(1) & 0xffffL),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("interpreted eval agrees with codegen and kernel") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = Morton16(Literal(0x1234L), Literal(0xabcdL))
    assert(e.eval(null) == Morton16.interleave(0x1234L, 0xabcdL))
    assert(Morton16.interleave(0x1234L, 0xabcdL) == naive(0x1234L, 0xabcdL))
  }

  test("z-order is monotone on the grid diagonal") {
    // interleaving preserves the order of equal coordinates: (k,k) maps
    // to a strictly increasing z value — the property that makes z-range
    // scans contiguous along the diagonal
    val zs = (0 until 16).map(k => Morton16.interleave(k.toLong, k.toLong))
    assert(zs == zs.sorted && zs.distinct.size == zs.size)
  }

  test("registered SQL function resolves and validates arity") {
    Morton16.register(spark)
    assert(spark.sql(
      "SELECT morton16(CAST(3 AS BIGINT), CAST(1 AS BIGINT)) AS z")
      .collect()(0).getLong(0) == naive(3L, 1L))
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    val reg = spark.sessionState.functionRegistry.clone()
    org.apache.spark.sql.graft.ColumnBridge.applyFunctionInjections(ext, reg)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    assert(reg.functionExists(FunctionIdentifier("morton16")))
    val builder = reg.lookupFunctionBuilder(FunctionIdentifier("morton16")).get
    import org.apache.spark.sql.catalyst.expressions.Literal
    val one = intercept[IllegalArgumentException](builder(Seq(Literal(1L))))
    assert(one.getMessage.contains("expects exactly 2 arguments"))
  }
}
