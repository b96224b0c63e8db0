package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ACF kernel on a controlled periodic series: a planted period-6
  * spike train must peak at lags 6 and 12, the values must match a
  * direct Scala evaluation of the same estimator, and each lag keeps
  * exactly N − k terms.
  */
class AcfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("planted period-6 series peaks at lags 6 and 12, matches direct eval") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val nHours = 48
    def cnt(h: Int): Int = 10 + (if (h % 6 == 0) 8 else 0)
    val rows = for { h <- 0 until nHours; i <- 0 until cnt(h) }
      yield (h.toLong * 3600L, i.toLong)
    val tmp = java.nio.file.Files.createTempDirectory("acf").toString
    rows.toDF("sec", "i")
      .select(timestamp_seconds($"sec").as("ts"), $"i".as("event_id"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val out = TimeSeries.acf(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == (1L to TimeSeries.AcfMaxLag).toSet)
    out.foreach { case (k, (nTerms, r)) =>
      assert(nTerms == nHours - k, s"lag $k: $nTerms terms")
      assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9, s"lag $k: r=$r")
    }

    // direct evaluation of the same estimator
    val c = (0 until nHours).map(cnt(_).toDouble)
    val m = c.sum / nHours
    val den = c.map(x => (x - m) * (x - m)).sum
    def direct(k: Int): Double =
      (0 until nHours - k).map(t => (c(t) - m) * (c(t + k) - m)).sum / den
    (1 to TimeSeries.AcfMaxLag).foreach { k =>
      assert(math.abs(out(k.toLong)._2 - direct(k)) < 1e-5,
        s"lag $k: spark=${out(k.toLong)._2} direct=${direct(k)}")
    }
    assert(out(6L)._2 > out(3L)._2 && out(12L)._2 > out(11L)._2)
    assert(out(6L)._2 > 0.5)
  }
}
