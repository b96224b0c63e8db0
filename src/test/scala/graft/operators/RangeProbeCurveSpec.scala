package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Radius probe-curve invariants on the real fixture: recall is
  * monotone in probe depth, reaches exactly 1.0 at full depth (every
  * true pair's neighbor lives in SOME ranked cell), per-rank counts
  * sum to the cumulative, and the depth-[[Similarity.IvfNProbe]] point
  * matches what the registered ball query actually returns.
  */
class RangeProbeCurveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("monotone, exhaustive at full depth, consistent with rangeSearch") {
    val rows = Similarity.rangeProbeCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._3 >= a._3 && b._4 >= a._4, s"non-monotone at ${b._1}")
      case _ =>
    }
    assert(rows.last._4 == 1.0, s"full-depth recall ${rows.last._4}")
    assert(rows.map(_._2).sum == rows.last._3)
    // the registered ball query's result size equals the curve's
    // cumulative hits at its own probe depth
    val atProbe = rows.find(_._1 == Similarity.IvfNProbe.toLong).get._3
    val returned = Similarity.rangeSearch(spark, sf).count()
    assert(returned == atProbe, s"rangeSearch $returned vs curve $atProbe")
  }
}
