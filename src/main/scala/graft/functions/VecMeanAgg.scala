package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Buffer: per-dimension sums in exact micro-units (longs) + vector
  * count. Long sums are associative and overflow-safe here (|element|
  * ≲ 1e3 ⇒ 1e9 micro-units; 2^63 accommodates ~9e9 such vectors per
  * dimension per partition — and merge adds partials, not elements).
  */
case class VecMeanBuf(sums: Array[Long], n: Long)

/** Typed `Aggregator` computing the elementwise mean of float vectors
  * in ONE pass — the `Aggregator[IN,BUF,OUT]` API surface (registered
  * through `functions.udaf`), and the efficient plan for centroid
  * computation: the shuffle carries one 64-long buffer per group per
  * partition instead of 64× exploded rows per vector.
  *
  * Exactness contract: each element is rounded to 6 dp with BigDecimal
  * HALF_UP (bit-identical to Spark's and DuckDB's `round(x, 6)`) and
  * accumulated as an integer number of micro-units, so the sum is exact
  * and ORDER-INDEPENDENT; the finish division (sum/1e6)/n performs the
  * same two correctly-rounded double steps as the oracle's
  * `CAST(sum(DECIMAL(18,6)) AS DOUBLE) / count`.
  */
object VecMeanAgg extends Aggregator[Array[Float], VecMeanBuf, Array[Double]] {

  private def micro(f: Float): Long =
    // valueOf = shortest-decimal-string construction — the SAME
    // BigDecimal Spark's round(x, 6) builds; new BigDecimal(double)
    // would round the exact binary expansion, whose HALF_UP ties can
    // differ in the last micro-unit
    java.math.BigDecimal.valueOf(f.toDouble)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  override def zero: VecMeanBuf = VecMeanBuf(Array.emptyLongArray, 0L)

  override def reduce(b: VecMeanBuf, a: Array[Float]): VecMeanBuf = {
    if (a == null) b
    else if (b.n == 0L) VecMeanBuf(a.map(micro), 1L)
    else {
      require(a.length == b.sums.length,
        s"vec_mean: mixed vector lengths ${a.length} vs ${b.sums.length}")
      var i = 0
      while (i < a.length) { b.sums(i) += micro(a(i)); i += 1 }
      VecMeanBuf(b.sums, b.n + 1L)
    }
  }

  override def merge(x: VecMeanBuf, y: VecMeanBuf): VecMeanBuf =
    if (x.n == 0L) y
    else if (y.n == 0L) x
    else {
      require(x.sums.length == y.sums.length,
        s"vec_mean: mixed vector lengths ${x.sums.length} vs ${y.sums.length}")
      var i = 0
      while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
      VecMeanBuf(x.sums, x.n + y.n)
    }

  override def finish(b: VecMeanBuf): Array[Double] =
    if (b.n == 0L) Array.emptyDoubleArray
    else b.sums.map(s => (s.toDouble / 1e6) / b.n)

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
