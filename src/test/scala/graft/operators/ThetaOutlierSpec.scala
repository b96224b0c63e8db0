package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Theta forecast + embedding Mahalanobis outliers: each must match an
  * independent driver-side replay, and the defining method properties
  * must hold on planted inputs.
  */
class ThetaOutlierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ------------------------------------------------------------ theta

  /** Direct (non-linearized) theta method on a window, double math. */
  private def refTheta(y: Seq[Double]): (Double, Double, Double) = {
    val w = y.length
    val xbar = (w - 1) / 2.0
    val sxx = (0 until w).map(t => (t - xbar) * (t - xbar)).sum
    val b = (0 until w).map(t => (t - xbar) * y(t)).sum / sxx
    val a = y.sum / w - b * xbar
    val fLin = a + b * w
    val z = (0 until w).map(t => 2 * y(t) - (a + b * t))
    var l = z(0)
    for (t <- 1 until w) l = (z(t) + l) / 2
    (fLin, l, (fLin + l) / 2)
  }

  test("theta forecast matches the direct method within quantization") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val W = TimeSeries2.ThetaWindow
    val ev = graft.Tables.events(spark, TestSpark.sf)
      .select($"event_type", to_date($"ts").as("day"))
    val dmax = ev.agg(max($"day")).collect()(0).getDate(0).toLocalDate
    val counts = ev.groupBy($"event_type", $"day").count()
      .as[(String, java.sql.Date, Long)].collect()
    val got = TimeSeries2.thetaForecast(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    for (ty <- counts.map(_._1).distinct) {
      val byDay = counts.filter(_._1 == ty)
        .map(c => c._2.toLocalDate -> c._3).toMap
      val y = (0 until W).map(k =>
        byDay.getOrElse(dmax.minusDays((W - 1 - k).toLong), 0L).toDouble)
      val (fl, fs, ft) = refTheta(y)
      val (gl, gs, gt) = got(ty)
      assert(math.abs(gl - fl) < 1e-6, s"$ty trend: $gl vs $fl")
      assert(math.abs(gs - fs) < 1e-6, s"$ty ses: $gs vs $fs")
      assert(math.abs(gt - ft) < 1e-6, s"$ty theta: $gt vs $ft")
      // theta is the mean of its components (within quantization)
      assert(math.abs(gt - (gl + gs) / 2) < 1e-6)
    }
    assert(got.nonEmpty)
  }

  test("theta on a pure linear series: trend leg exact, theta between legs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val W = TimeSeries2.ThetaWindow
    // counts 10, 20, ..., 80 → the OLS leg extrapolates to exactly 90;
    // the SES leg lags a trending series (classic Theta ≡ SES with
    // half drift), so theta lands strictly between the two legs and
    // equals the direct method's value
    val rows = (0 until W).flatMap(d =>
      (0 until (d + 1) * 10).map(i => ("lin", d, i)))
    val tmp = java.nio.file.Files.createTempDirectory("theta").toString
    rows.toDF("event_type", "d", "i")
      .select($"event_type",
        timestamp_seconds($"d".cast("long") * 86400L + $"i").as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = TimeSeries2.thetaForecast(spark, tmp).collect()(0)
    val (fl, fs, ft) = refTheta((1 to W).map(_ * 10.0))
    assert(math.abs(r.getDouble(1) - 90.0) < 1e-6, s"trend ${r.getDouble(1)}")
    assert(math.abs(fl - 90.0) < 1e-9)
    assert(math.abs(r.getDouble(2) - fs) < 1e-6, s"ses ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - ft) < 1e-6, s"theta ${r.getDouble(3)}")
    assert(r.getDouble(2) < r.getDouble(3) && r.getDouble(3) < r.getDouble(1))
  }

  // --------------------------------------------------------- outliers

  test("planted far-out vector tops the Mahalanobis ranking") {
    import spark.implicits._
    // 40 vectors near the origin on a deterministic grid; one far out
    val dims = 8
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until dims).map(d =>
        ((i * 7 + d * 3) % 11 - 5) / 100.0f).toArray, 0)
    }
    val outlier = (99L, Array.fill(dims)(5.0f), 0)
    val tmp = java.nio.file.Files.createTempDirectory("maha").toString
    (base :+ outlier).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = DataQuality.dqEmbeddingOutliers(spark, tmp).collect()
    assert(rows.head.getLong(0) == 99L)
    assert(rows.head.getLong(2) == 1L)
    // scores are non-increasing down the ranking
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("outlier scores match an independent replay on the fixture") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
      .selectExpr("vec_id", "embedding").as[(Long, Array[Float])]
      .collect()
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def r9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    val dims = emb.head._2.length
    val n = emb.length
    // engine order: decimal sum → CAST AS DOUBLE → double division
    val mu = (0 until dims).map { d =>
      val s = emb.map(e => BigDecimal(math.floor(e._2(d).toDouble * 1e6 + 0.5)))
        .foldLeft(BigDecimal(0))(_ + _)
      math.floor(s.toDouble / n + 0.5) / 1e6
    }
    val vv = (0 until dims).map { d =>
      val s = emb.map { e =>
        val q = math.floor(e._2(d).toDouble * 1e6 + 0.5) / 1e6
        BigDecimal(r9((q - mu(d)) * (q - mu(d))))
      }.foldLeft(BigDecimal(0))(_ + _)
      math.floor(s.toDouble / n * 1e6 + 0.5) / 1e6
    }
    val want = emb.map { case (id, e) =>
      var acc = 0.0
      for (d <- 0 until dims) {
        if (vv(d) != 0) {
          val q = math.floor(e(d).toDouble * 1e6 + 0.5) / 1e6
          acc = acc + (q - mu(d)) * (q - mu(d)) / vv(d)
        }
      }
      id -> r6(acc)
    }.sortBy { case (id, sc) => (-sc, id) }.take(20)
    val got = DataQuality.dqEmbeddingOutliers(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got == want.toSeq)
  }
}
