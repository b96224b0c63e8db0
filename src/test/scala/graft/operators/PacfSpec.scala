package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** PACF ladder: the registered query's partials must EXACTLY equal an
  * independent Scala evaluation of Durbin–Levinson (same 6-dp re-round
  * idiom at each step) seeded from the query's own ACF values, and the
  * structural identities must hold — pacf(1) == acf(1), and an AR(1)
  * planted series has a near-zero lag-2 partial while its ACF decays
  * geometrically (the diagnostic the operator exists for).
  */
class PacfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rnd(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Reference Durbin–Levinson with the identical per-step rounding. */
  private def reference(r: Map[Int, Double], maxLag: Int): Map[Int, Double] = {
    val phi = scala.collection.mutable.Map.empty[(Int, Int), Double]
    phi((1, 1)) = r(1)
    for (k <- 2 to maxLag) {
      val num = r(k) - (1 until k).map(j => phi((k - 1, j)) * r(k - j)).sum
      val den = 1.0 - (1 until k).map(j => phi((k - 1, j)) * r(j)).sum
      phi((k, k)) = rnd(num / den)
      for (j <- 1 until k)
        phi((k, j)) = rnd(phi((k - 1, j)) - phi((k, k)) * phi((k - 1, k - j)))
    }
    (1 to maxLag).map(k => k -> phi((k, k))).toMap
  }

  /** Full ladder (every phi_{k,j}) with the identical rounding. */
  private def referenceLadder(r: Map[Int, Double], maxLag: Int)
      : Map[(Int, Int), Double] = {
    val phi = scala.collection.mutable.Map.empty[(Int, Int), Double]
    phi((1, 1)) = r(1)
    for (k <- 2 to maxLag) {
      val num = r(k) - (1 until k).map(j => phi((k - 1, j)) * r(k - j)).sum
      val den = 1.0 - (1 until k).map(j => phi((k - 1, j)) * r(j)).sum
      phi((k, k)) = rnd(num / den)
      for (j <- 1 until k)
        phi((k, j)) = rnd(phi((k - 1, j)) - phi((k, k)) * phi((k - 1, k - j)))
    }
    phi.toMap
  }

  private def writeSeries(cnt: Int => Int, nHours: Int): String = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = for { h <- 0 until nHours; i <- 0 until cnt(h) }
      yield (h.toLong * 3600L, i.toLong)
    val tmp = java.nio.file.Files.createTempDirectory("pacf").toString
    rows.toDF("sec", "i")
      .select(timestamp_seconds($"sec").as("ts"), $"i".as("event_id"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("query partials equal the rounded Durbin-Levinson reference exactly") {
    // period-6 spike train — strong structure at several lags
    val tmp = writeSeries(h => 10 + (if (h % 6 == 0) 8 else 0), 60)
    val acf = TimeSeries.acf(spark, tmp).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(2)).toMap
    val got = TimeSeries.pacf(spark, tmp).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    val want = reference(acf, TimeSeries.PacfMaxLag)
    assert(got.keySet == (1 to TimeSeries.PacfMaxLag).toSet)
    got.foreach { case (k, v) =>
      assert(v == want(k), s"lag $k: got $v want ${want(k)}")
    }
    assert(got(1) == acf(1), "pacf(1) must equal acf(1)")
  }

  test("AR(1)-like ramp: lag-2 partial collapses versus lag-2 acf") {
    // deterministic AR(1)-flavored counts: slow mean-reverting ramp
    var level = 20.0
    val counts = (0 until 80).map { h =>
      level = 10.0 + 0.8 * (level - 10.0) + (if (h % 17 == 0) 6 else 0)
      math.max(1, level.round.toInt)
    }
    val tmp = writeSeries(h => counts(h), 80)
    val acf = TimeSeries.acf(spark, tmp).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(2)).toMap
    val pacf = TimeSeries.pacf(spark, tmp).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    // AR(1): acf(2) ~ acf(1)^2 stays material, pacf(2) cuts off
    assert(math.abs(pacf(2)) < math.abs(acf(2)),
      s"pacf(2)=${pacf(2)} should collapse below acf(2)=${acf(2)}")
    assert(math.abs(pacf(2)) < 0.35, s"pacf(2)=${pacf(2)} not cut off")
  }

  test("yule-walker AR(4) fit matches the ladder row; variance ratio from reflections") {
    val tmp = writeSeries(h => 10 + (if (h % 6 == 0) 8 else 0), 60)
    val acf = TimeSeries.acf(spark, tmp).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(2)).toMap
    val got = TimeSeries.yuleWalker(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val phi = referenceLadder(acf, TimeSeries.PacfMaxLag)
    (1 to TimeSeries.ArOrder).foreach { j =>
      assert(got(s"ar$j") == phi((TimeSeries.ArOrder, j)),
        s"ar$j: got ${got(s"ar$j")} want ${phi((TimeSeries.ArOrder, j))}")
    }
    val vr = rnd((1 to TimeSeries.ArOrder)
      .map(k => 1.0 - phi((k, k)) * phi((k, k))).product)
    assert(got("var_ratio") == vr)
    assert(got("var_ratio") > 0.0 && got("var_ratio") <= 1.0)
  }

  test("AR forecast equals the independent recursion over the fitted phis") {
    val tmp = writeSeries(h => 10 + (if (h % 6 == 0) 8 else 0), 60)
    val acf = TimeSeries.acf(spark, tmp).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(2)).toMap
    val phi = referenceLadder(acf, TimeSeries.PacfMaxLag)
    val coef = (1 to TimeSeries.ArOrder)
      .map(j => phi((TimeSeries.ArOrder, j)))
    // the series the query saw: dense hourly counts, most recent first
    val counts = (0 until 60).map(h => 10 + (if (h % 6 == 0) 8 else 0))
    val m = rnd(counts.sum.toDouble / counts.length)
    var window = counts.reverse.take(TimeSeries.ArOrder)
      .map(_.toDouble).toList
    val want = (1 to TimeSeries.ArForecastH).map { h =>
      // left-associated starting from m — the generated SQL's fold order
      val f = rnd(coef.zipWithIndex.foldLeft(m) {
        case (acc, (p, j)) => acc + p * (window(j) - m)
      })
      window = f :: window
      h.toLong -> f
    }.toMap
    val got = TimeSeries.arForecast(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == (1L to TimeSeries.ArForecastH.toLong).toSet)
    got.foreach { case (h, v) =>
      assert(v == want(h), s"h=$h: got $v want ${want(h)}")
    }
    // forecasts of a mean-reverting fit must head toward the mean
    assert(math.abs(got(6L) - m) <= math.abs(got(1L) - m) + 1.0)
  }

  test("Ljung-Box terms equal the independent residual-ACF computation") {
    val counts = (0 until 60).map(h => 10 + (if (h % 6 == 0) 8 else 0))
    val tmp = writeSeries(h => counts(h), 60)
    val acf = TimeSeries.acf(spark, tmp).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(2)).toMap
    val phi = referenceLadder(acf, TimeSeries.PacfMaxLag)
    val coef = (1 to TimeSeries.ArOrder)
      .map(j => phi((TimeSeries.ArOrder, j)))
    val p = TimeSeries.ArOrder
    val m = rnd(counts.sum.toDouble / counts.length)
    // residuals, identical left-associated fold and 6-dp re-round
    val resid = (p until counts.length).map { t =>
      val pred = coef.zipWithIndex.foldLeft(m) {
        case (acc, (c, j)) => acc + c * (counts(t - j - 1) - m)
      }
      rnd(counts(t) - pred)
    }
    // decimal-exact sums (order-free), as both engines compute them
    def dec(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_EVEN)
    val den = resid.map(e => dec(e) * dec(e)).sum
    val n = resid.length
    val rr = (1 to TimeSeries.LjungBoxLags).map { k =>
      val num = (0 until n - k).map(i => dec(resid(i)) * dec(resid(i + k))).sum
      k -> rnd((num / den).toDouble)
    }.toMap
    val got = TimeSeries.ljungBox(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    (1 to TimeSeries.LjungBoxLags).foreach { k =>
      assert(got(s"r$k") == rr(k), s"r$k: got ${got(s"r$k")} want ${rr(k)}")
    }
    assert(got("n_resid") == n.toDouble)
    val qSum = (1 to TimeSeries.LjungBoxLags)
      .map(k => rr(k) * rr(k) / (n - k)).reduceLeft(_ + _)
    val q = rnd((n.toLong * (n + 2)).toDouble * qSum)
    assert(got("q_stat") == q, s"q: got ${got("q_stat")} want $q")
    // period-6 spikes leave structure the AR(4) cannot absorb -> Q large
    assert(got("q_stat") > 0.0)
  }
}
