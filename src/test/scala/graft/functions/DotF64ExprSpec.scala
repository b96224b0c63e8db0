package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DotF64ExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def scalaDot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  test("native expression is bit-identical to the sequential Scala fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 50).map { _ =>
      (Array.fill(64)(rnd.nextFloat() - 0.5f), Array.fill(64)(rnd.nextFloat() - 0.5f))
    }
    val df = rows.toDF("a", "b")
      .select($"a", $"b", DotF64.dot_f64($"a", $"b").as("d"))
    df.collect().zip(rows).foreach { case (r, (a, b)) =>
      assert(r.getDouble(2) == scalaDot(a, b))
    }
  }

  test("length mismatch is null (not a truncated product); null input yields null") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1f, 2f, 3f)), Some(Array(10f, 20f))),
      (Some(Array(1f, 2f)), Some(Array(10f, 20f))),
      (None, Some(Array(1f))))
      .toDF("a", "b")
      .select(DotF64.dot_f64($"a", $"b").as("d"))
    val rows = df.collect()
    // mismatched lengths must fail loudly-as-null, never silently
    // truncate to min(len) — a truncated dot product looks plausible
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 50.0)
    assert(rows(2).isNullAt(0))
  }

  test("interpreted eval agrees with codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val a = Literal.create(Array(0.5f, -1.5f), ArrayType(FloatType))
    val b = Literal.create(Array(2.0f, 4.0f), ArrayType(FloatType))
    assert(DotF64(a, b).eval(null) == (0.5 * 2.0 + (-1.5) * 4.0))
  }
}
