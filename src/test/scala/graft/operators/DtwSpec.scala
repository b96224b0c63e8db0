package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Banded DTW: the registered query must EXACTLY equal an independent
  * Scala DP (integer arithmetic — no rounding tolerance anywhere), and
  * the metric's defining property must hold on planted series: a spike
  * train time-shifted by one day is nearly free under warping but
  * expensive under rigid pointwise (L1) comparison.
  */
class DtwSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Inf = 1000000000000000L

  /** Reference banded DP, written row-wise like the textbook. */
  private def refDtw(x: Seq[Long], y: Seq[Long], w: Int): Long = {
    val t = x.length
    var prev = 0L +: Vector.fill(t)(Inf)
    for (i <- 1 to t) {
      var row = Vector(Inf)
      for (j <- 1 to t) {
        row = row :+ (if (math.abs(i - j) > w) Inf
        else math.abs(x(i - 1) - y(j - 1)) +
          math.min(prev(j), math.min(row(j - 1), prev(j - 1))))
      }
      prev = row
    }
    prev(t)
  }

  /** Gap-filled per-type daily series straight from the fixture. */
  private def fixtureSeries(dir: String): Map[String, Seq[Long]] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, dir)
      .select($"event_type", to_date($"ts").as("day"))
    val Array(d0, d1) = ev.agg(min($"day"), max($"day")).as[(java.sql.Date, java.sql.Date)]
      .collect().map(p => Array(p._1, p._2)).head
    val counts = ev.groupBy($"event_type", $"day").count()
      .as[(String, java.sql.Date, Long)].collect()
      .map { case (t, d, c) => (t, d.toLocalDate, c) }
    val span = Iterator.iterate(d0.toLocalDate)(_.plusDays(1))
      .takeWhile(!_.isAfter(d1.toLocalDate)).toVector
    counts.map(_._1).distinct.map { ty =>
      val byDay = counts.filter(_._1 == ty).map(c => c._2 -> c._3).toMap
      ty -> span.map(d => byDay.getOrElse(d, 0L))
    }.toMap
  }

  test("ev_dtw equals the independent integer DP exactly on the fixture") {
    val got = TimeSeries2.dtwPairs(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ser = fixtureSeries(TestSpark.sf)
    val keys = ser.keys.toSeq.sorted
    val want = (for {
      a <- keys.indices; b <- a + 1 until keys.length
    } yield (keys(a), keys(b)) ->
      refDtw(ser(keys(a)), ser(keys(b)), TimeSeries2.DtwBand)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("warping absorbs a one-day shift that rigid L1 pays in full") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 20 days; spikes of height 50 on days 3,9,15 ("base") vs days
    // 4,10,16 ("shift") vs flat 1/day ("flat"); band covers the shift.
    def spikes(ty: String, spikeDays: Set[Int]): Seq[(String, Int, Int)] =
      (0 until 20).map(d => (ty, d, if (spikeDays(d)) 50 else 1))
    val rows = spikes("base", Set(3, 9, 15)) ++
      spikes("shift", Set(4, 10, 16)) ++ spikes("flat", Set())
    val tmp = java.nio.file.Files.createTempDirectory("dtw").toString
    rows.flatMap { case (ty, d, n) => (0 until n).map(i => (ty, d, i)) }
      .toDF("event_type", "d", "i")
      .select($"event_type",
        timestamp_seconds($"d".cast("long") * 86400L + $"i").as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = TimeSeries2.dtwPairs(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val baseShift = got(("base", "shift"))
    val baseFlat = got(("base", "flat"))
    // L1 of base-vs-shift = 6 × 49 = 294; warping re-aligns each spike
    // for a two-cell detour (the warp steps pay |1−1| = 0 and the
    // aligned spikes |50−50| = 0, leaving only the path's edge costs).
    val l1 = 6 * 49L
    assert(baseShift < l1 / 2, s"warp should beat rigid L1: $baseShift vs $l1")
    // flat series can't absorb the spikes at all: 3 × 49 minimum.
    assert(baseFlat >= 3 * 49L)
    // and the planted pair agrees with the reference DP exactly
    val ser = fixtureSeries(tmp)
    assert(baseShift ==
      refDtw(ser("base"), ser("shift"), TimeSeries2.DtwBand))
  }
}
