package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class QuantI8ExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def statsOf(vs: Seq[Array[Float]]): Array[(Double, Long, Double)] = {
    import spark.implicits._
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "emb")
      .select($"id", QuantI8Stats.quant_i8_stats($"emb").as("q"))
      .orderBy($"id")
      .select($"q.scale", $"q.q_sum", $"q.mse")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
  }

  /** Scala reference implementation — the contract both codegen and
    * interpreted paths must match bit-for-bit.
    */
  private def ref(v: Array[Float]): (Double, Long, Double) = {
    val maxabs = v.foldLeft(0.0)((m, x) => math.max(m, math.abs(x.toDouble)))
    val scale = maxabs / 127.0
    if (scale == 0 || v.isEmpty) (scale, 0L, 0.0)
    else {
      var qsum = 0L
      var err = 0.0
      v.foreach { x =>
        val q = math.floor(x.toDouble / scale + 0.5)
        qsum += q.toLong
        val e = x.toDouble - q * scale
        err += e * e
      }
      (scale, qsum, err / v.length)
    }
  }

  test("matches the Scala reference bit-for-bit; quantized error bounded by scale/2") {
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(50)(Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
    val got = statsOf(vs)
    vs.zip(got).foreach { case (v, (scale, qsum, mse)) =>
      val (es, eq, em) = ref(v)
      assert(scale == es && qsum == eq && mse == em)
      // per-element |v - q*scale| <= scale/2  =>  mse <= scale^2/4
      assert(mse <= scale * scale / 4 + 1e-12)
      // every quantized value is representable in int8
      v.foreach { x =>
        val q = math.floor(x.toDouble / scale + 0.5)
        assert(q >= -127 && q <= 127)
      }
    }
  }

  test("zero vector quantizes to (0, 0, 0); null input yields null") {
    import spark.implicits._
    val got = statsOf(Seq(Array.fill(8)(0.0f)))
    assert(got.head == ((0.0, 0L, 0.0)))
    val df = Seq((1L, null.asInstanceOf[Array[Float]])).toDF("id", "emb")
      .select(QuantI8Stats.quant_i8_stats($"emb").as("q"))
    assert(df.collect().head.isNullAt(0))
  }

  test("interpreted eval agrees with codegen") {
    val v = Array.tabulate(16)(i => (math.sin(i.toDouble) * 3).toFloat)
    val expr = QuantI8Stats(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val row = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val (es, eq, em) = ref(v)
    assert(row.getDouble(0) == es && row.getLong(1) == eq && row.getDouble(2) == em)
  }
}
