package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Local-level Kalman filter: the registered query's level must equal
  * an independent SEQUENTIAL filter run (predict/update recursion on
  * doubles — the form the coefficient vectors were derived from) to
  * within the documented 18-dp weight quantization, the gain schedule
  * must be at steady state by the window end, and the filter must
  * denoise: on a planted noisy-constant series the level sits closer
  * to the true mean than the last observation does.
  */
class KalmanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Textbook sequential filter (l₁ = y₁, P₁ = r). */
  private def refFilter(y: Seq[Double]): (Double, Double, Double) = {
    val q = TimeSeries2.KalmanQ; val r = TimeSeries2.KalmanR
    var l = y.head; var p = r; var lPrev = l
    for (t <- 1 until y.length) {
      val pPred = p + q
      val k = pPred / (pPred + r)
      lPrev = l
      l = l + k * (y(t) - l)
      p = (1 - k) * pPred
    }
    (l, y.last - lPrev, p)
  }

  private def lastWindowCounts(dir: String): Map[String, Seq[Double]] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val W = TimeSeries2.KalmanWindow
    val ev = graft.Tables.events(spark, dir)
      .select($"event_type", to_date($"ts").as("day"))
    val dmax = ev.agg(max($"day")).collect()(0).getDate(0).toLocalDate
    val counts = ev.groupBy($"event_type", $"day").count()
      .as[(String, java.sql.Date, Long)].collect()
    counts.map(_._1).distinct.map { ty =>
      val byDay = counts.filter(_._1 == ty)
        .map(c => c._2.toLocalDate -> c._3).toMap
      ty -> (0 until W).map(k =>
        byDay.getOrElse(dmax.minusDays((W - 1 - k).toLong), 0L).toDouble)
    }.toMap
  }

  test("query level/innovation match the sequential filter on the fixture") {
    val got = TimeSeries2.kalmanLevel(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val ser = lastWindowCounts(TestSpark.sf)
    assert(got.keySet == ser.keySet)
    for ((ty, y) <- ser) {
      val (l, innov, p) = refFilter(y)
      val (gl, gf, gi, gk, gp) = got(ty)
      // weight quantization is 1e-18 per term × counts ≤ 1e4 × W terms,
      // plus the scale-9 output round — far inside 1e-6
      assert(math.abs(gl - l) < 1e-6, s"$ty level: $gl vs $l")
      assert(gf == gl)
      assert(math.abs(gi - innov) < 1e-6, s"$ty innovation: $gi vs $innov")
      assert(math.abs(gp - p) < 1e-6, s"$ty P: $gp vs $p")
      // near steady state: K∞ solves K = (P+q)/(P+q+r) with
      // P = (1−K)(P+q); convergence is geometric at (1−K∞)² ≈ 0.61 per
      // step, so after W−1 = 15 steps the gap is ≈ 2e-4 (documented)
      val q = TimeSeries2.KalmanQ; val r = TimeSeries2.KalmanR
      val kInf = (-q + math.sqrt(q * q + 4 * q * r)) / (2 * r)
      assert(math.abs(gk - kInf) < 5e-4, s"$ty gain not steady: $gk vs $kInf")
    }
  }

  test("filter denoises a planted noisy-constant series") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // deterministic "noise": counts alternate 10, 30 around mean 20,
    // with a final-day outlier of 40
    val W = TimeSeries2.KalmanWindow
    val rows = (0 until W).flatMap { d =>
      val n = if (d == W - 1) 40 else if (d % 2 == 0) 10 else 30
      (0 until n).map(i => ("m", d, i))
    }
    val tmp = java.nio.file.Files.createTempDirectory("kalman").toString
    rows.toDF("event_type", "d", "i")
      .select($"event_type",
        timestamp_seconds($"d".cast("long") * 86400L + $"i").as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = TimeSeries2.kalmanLevel(spark, tmp).collect()(0)
    val level = r.getDouble(1)
    // last observation is 40; true mean ≈ 20; the filter should sit
    // much closer to the mean than to the outlier
    assert(math.abs(level - 20) < math.abs(level - 40))
    assert(level > 15 && level < 30, s"level $level")
  }
}
