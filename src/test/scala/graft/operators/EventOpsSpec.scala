package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class EventOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("interval count: bounded by total events, all types present") {
    val rows = EventOps.intervalCount(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("cnt")).sum <= total)
  }

  test("lambda diff: lost = batch - speed, lost >= 0, sums match simulated loss") {
    val df = EventOps.lambdaDiff(spark, sf)
    import org.apache.spark.sql.functions._
    val bad = df.filter(col("lost") =!= col("batch_cnt") - col("speed_cnt") ||
      col("lost") < 0).count()
    assert(bad == 0)
    val totalLost = df.agg(sum("lost")).collect()(0).getLong(0)
    val expectedLost = graft.Tables.events(spark, sf)
      .filter(col("event_id") % 97 === 0).count()
    assert(totalLost == expectedLost)
  }

  test("session stats: sessions <= events per user, at least 1 session") {
    import org.apache.spark.sql.functions._
    val df = EventOps.sessionStats(spark, sf)
    assert(df.filter(col("n_sessions") > col("n_events") ||
      col("n_sessions") < 1).count() == 0)
  }

  test("CUSUM changepoint locates a planted level shift at its boundary day") {
    import spark.implicits._
    import java.sql.Date
    // 10 days at 5/day then 10 days at 100/day: |CUSUM| peaks at the
    // last low day. Flat series: every interior prefix ties at the max,
    // earliest-day tie-break picks day 1.
    val shifted = (1 to 10).map(d => ("shift", Date.valueOf(f"2024-01-$d%02d"), 5L)) ++
      (11 to 20).map(d => ("shift", Date.valueOf(f"2024-01-$d%02d"), 100L))
    val flat = (1 to 20).map(d => ("flat", Date.valueOf(f"2024-01-$d%02d"), 7L))
    val got = TimeSeries.cusumPeak((shifted ++ flat).toDF("event_type", "day", "cnt"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(4))).toMap
    assert(got("shift")._1 == "2024-01-10")
    // n=20, total=1050; at k=10: |20*50 - 10*1050| = 9500
    assert(got("shift")._2 == 9500L)
    assert(got("flat") == ("2024-01-01", 0L))
  }

  test("Gini: equal counts -> 0, hand-computed skewed case -> 0.45") {
    import spark.implicits._
    val counts = (1 to 4).map(u => ("eq", u.toLong, 3L)) ++
      // {1,1,1,7}: G = (2*34 - 5*10) / (4*10) = 0.45
      Seq(("skew", 1L, 1L), ("skew", 2L, 1L), ("skew", 3L, 1L), ("skew", 4L, 7L))
    val got = TimeSeries.giniOfCounts(counts.toDF("event_type", "user_id", "cnt"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("eq") == 0.0 && got("skew") == 0.45)
  }

  test("multitouch attribution: planted U-shape splits 40/20/40, n=1 takes all") {
    import spark.implicits._
    val h = 3600L * 1000000L
    // user 1: purchase at t=10h, clicks at 7h/8h/9h on channels 2,1,0
    //   -> linear 1/3 each; position: first(7h,ch2)=0.4, mid(8h,ch1)=0.2,
    //      last(9h,ch0)=0.4
    // user 2: purchase at 10h, single click at 5h on ch 3 -> full credit
    // user 3: click OUTSIDE the 7-day lookback -> no credit at all
    val ev = Seq(
      (100L, 1L, "purchase", 10L * h, 0L),
      (101L, 1L, "click", 7L * h, 2L),
      (102L, 1L, "click", 8L * h, 1L),
      (103L, 1L, "click", 9L * h, 0L),
      (200L, 2L, "purchase", 10L * h, 0L),
      (201L, 2L, "click", 5L * h, 3L),
      (300L, 3L, "purchase", 200L * 24L * h, 0L),
      (301L, 3L, "click", 1L * h, 4L)
    ).toDF("event_id", "user_id", "event_type", "t_us", "channel")
    val got = EventOps.attributionMultitouchOf(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(!got.contains(4L), "out-of-window click must earn nothing")
    assert(got(2L) == ((1L, 0.333333, 0.4)))
    assert(got(1L) == ((1L, 0.333333, 0.2)))
    assert(got(0L) == ((1L, 0.333333, 0.4)))
    assert(got(3L) == ((1L, 1.0, 1.0)))
    // micro-unit credit conservation: each attributed conversion pays
    // out 1.0 (+/- one micro per touch from rounding)
    val lin = got.values.map(_._2).sum
    assert(math.abs(lin - 2.0) < 3e-6)
  }

  test("difference-in-differences: planted 2x2 recovers the interaction") {
    import spark.implicits._
    // treat: 5 -> 10; control: 2 -> 4. Parallel-trends counterfactual
    // would be 5 -> 7, so did = (10-5) - (4-2) = 3
    val obs = Seq(
      (true, false, 5.0), (true, false, 5.0), (true, true, 10.0),
      (false, false, 2.0), (false, true, 4.0), (false, true, 4.0)
    ).toDF("treat", "post", "value")
    val r = TimeSeries.didOf(obs).collect().head
    assert(r.getAs[Double]("mean_treat_post") == 10.0)
    assert(r.getAs[Double]("mean_treat_pre") == 5.0)
    assert(r.getAs[Double]("mean_ctrl_post") == 4.0)
    assert(r.getAs[Double]("mean_ctrl_pre") == 2.0)
    assert(r.getAs[Double]("did") == 3.0)
  }

  test("lag features: planted sequence recovers lags, gaps, and trailing means") {
    import spark.implicits._
    val ev = Seq(
      (1L, 7L, 1000000L, 10.0), (2L, 7L, 2000000L, 20.0), (3L, 7L, 3000000L, 30.0),
      (9L, 8L, 5000000L, 99.0) // second user: windows must not leak across
    ).toDF("event_id", "user_id", "t_us", "value")
    val rows = EventOps.lagFeaturesOf(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).isNullAt(4) && rows(1L).isNullAt(5))
    assert(rows(2L).getDouble(4) == 10.0 && rows(2L).getLong(5) == 1000000L)
    assert(rows(3L).getDouble(4) == 20.0 && rows(3L).getLong(5) == 1000000L)
    // trailing 3-mean divides by the ACTUAL frame size at the head
    assert(rows(1L).getDouble(6) == 10.0)
    assert(rows(2L).getDouble(6) == 15.0)
    assert(rows(3L).getDouble(6) == 20.0)
    assert(rows(9L).getInt(2) == 1 && rows(9L).isNullAt(4), "no cross-user leak")
  }

  test("markov stationary: mass conserved up to floor leakage, fixed point reached") {
    import org.apache.spark.sql.functions._
    val pi = EventOps.markovStationary(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mass = pi.values.sum
    assert(mass <= 1000000L && mass >= 1000000L - 100L * pi.size,
      s"mass $mass outside floor-leakage band")
    // one more integer iteration from the collected matrix must be a
    // near-fixed-point (chain mixes fast on this matrix)
    val cnt = EventOps.typeTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = cnt.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    def pMicro(a: String, b: String): Long =
      math.floor(cnt.getOrElse((a, b), 0L).toDouble / totals(a) * 1e6 + 0.5).toLong
    val next = pi.keys.map { j =>
      j -> pi.keys.map(i => pi(i) * pMicro(i, j)).sum / 1000000L
    }.toMap
    pi.keys.foreach { t =>
      assert(math.abs(next(t) - pi(t)) <= 500,
        s"$t: ${pi(t)} -> ${next(t)} not a fixed point")
    }
  }

  test("markov hitting: exact integer recursion reproduces the operator") {
    val cnt = EventOps.typeTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = cnt.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val types = totals.keys.toSeq.sorted
    def pMicro(a: String, b: String): Long =
      math.floor(cnt.getOrElse((a, b), 0L).toDouble / totals(a) * 1e6 + 0.5).toLong
    var v = types.map(_ -> 0L).toMap
    for (_ <- 1 to EventOps.MarkovIters) {
      v = types.map { i =>
        i -> types.map { j =>
          pMicro(i, j) * (if (j == "purchase") 1000000L else v(j))
        }.sum / 1000000L
      }.toMap
    }
    val got = EventOps.markovHitting(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == v, s"operator $got vs reference $v")
    got.values.foreach(h => assert(h > 0L && h < 1000000L))
  }

  test("holt: coefficient-vector output equals the direct recursion on raw counts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf)
      .select($"event_type", to_date($"ts").as("day"))
    val dmax = ev.agg(max($"day")).collect()(0).getDate(0).toLocalDate
    val counts = ev.groupBy($"event_type", $"day").count().collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) -> r.getLong(2)).toMap
    val out = TimeSeries.holtForecast(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out.nonEmpty)
    out.foreach { case (et, (level, trend, fc)) =>
      val y = (0 until TimeSeries.HoltWindow).map { k =>
        counts.getOrElse(
          (et, dmax.minusDays(TimeSeries.HoltWindow - 1L - k)), 0L).toDouble
      }
      var l = y(0); var b = y(1) - y(0)
      for (t <- 2 until TimeSeries.HoltWindow) {
        val nl = 0.5 * y(t) + 0.5 * (l + b)
        b = 0.5 * (nl - l) + 0.5 * b
        l = nl
      }
      assert(math.abs(level - l) < 1e-6, s"$et level $level vs direct $l")
      assert(math.abs(trend - b) < 1e-6, s"$et trend $trend vs direct $b")
      assert(math.abs(fc - (l + b)) < 1e-6, s"$et forecast")
    }
  }
}
