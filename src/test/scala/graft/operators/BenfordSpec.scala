package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Benford screen on controlled prices: first digits come from the
  * integer part (never double-cast truncation), counts match the
  * planted digit multiset, and χ² terms equal a direct evaluation of
  * the same rounded formula.
  */
class BenfordSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("digit extraction, counts, and chi-square terms") {
    import spark.implicits._
    // digits: 1×4, 2×3, 9×2 — n = 9
    val prices = Seq(123.45, 1999.99, 10.01, 1.5, 234.0, 2.75, 29999.0,
      900.0, 95000.5)
    val tmp = java.nio.file.Files.createTempDirectory("benford").toString
    prices.toDF("l_extendedprice").write.mode("overwrite")
      .parquet(s"$tmp/lineitem.parquet")
    val out = DataQuality.dqBenford(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 9L))
    assert(out(1L)._1 == 4L && out(2L)._1 == 3L && out(9L)._1 == 2L)
    val n = 9.0
    out.foreach { case (d, (obs, p, term)) =>
      assert(p == math.floor(math.log10(1 + 1.0 / d) * 1e6 + 0.5) / 1e6)
      val dev = obs - n * p
      val exp = math.floor(dev * dev / (n * p) * 1e6 + 0.5) / 1e6
      assert(term == exp, s"digit $d: $term vs $exp")
    }
  }
}
