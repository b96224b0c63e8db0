package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Holt–Winters — the weight-vector formulation must agree with a
  * DIRECT numerical run of the additive recursion on the same daily
  * grid (the weights ARE the recursion, propagated symbolically; only
  * their 16-dp rounding separates the two), and the seasonal term must
  * actually modulate the horizon profile.
  */
class HoltWintersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("forecasts match the direct recursion; seasonality shapes the horizon") {
    import spark.implicits._
    val W = TimeSeries.HwWindow
    val m = TimeSeries.HwPeriod
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(ts AS DATE) AS day")
    val maxDay = ev.agg(org.apache.spark.sql.functions.max($"day"))
      .head.getDate(0).toLocalDate
    val counts = ev.groupBy($"event_type", $"day").count()
      .as[(String, java.sql.Date, Long)].collect()
      .map { case (t, d, c) => (t, d.toLocalDate, c) }
    val types = counts.map(_._1).distinct
    val direct = types.flatMap { t =>
      val byDay = counts.filter(_._1 == t)
        .map { case (_, d, c) => d -> c.toDouble }.toMap
      val y = (0 until W).map(k =>
        byDay.getOrElse(maxDay.minusDays((W - 1 - k).toLong), 0.0))
      val (a, b, g) = (0.25, 0.125, 0.25)
      var l = y.take(m).sum / m
      var tr = (y.slice(m, 2 * m).sum / m - y.take(m).sum / m) / m
      val s = Array.tabulate(m)(i => y(i) - y.take(m).sum / m)
      for (tt <- m until W) {
        val sp = s(tt % m)
        val lN = a * (y(tt) - sp) + (1 - a) * (l + tr)
        val bN = b * (lN - l) + (1 - b) * tr
        val sN = g * (y(tt) - l - tr) + (1 - g) * sp
        l = lN; tr = bN; s(tt % m) = sN
      }
      (1 to TimeSeries.HwH).map(h =>
        (t, h.toLong) -> (l + h * tr + s((W - 1 + h) % m)))
    }.toMap
    val got = TimeSeries.holtWinters(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(got.length == types.length * TimeSeries.HwH)
    got.foreach { case (t, h, f) =>
      assert(math.abs(f - direct((t, h))) < 1e-6,
        s"($t, h=$h): weights $f vs direct ${direct((t, h))}")
    }
    // additive seasonality must actually modulate: for some type the
    // 7 horizons are not a pure straight line in h
    val curved = got.groupBy(_._1).values.exists { rows =>
      val f = rows.sortBy(_._2).map(_._3).toSeq
      val slope = f(1) - f(0)
      f.sliding(2).exists(w => math.abs((w(1) - w(0)) - slope) > 1e-9)
    }
    assert(curved, "seasonal component collapsed to a line everywhere")
  }
}
