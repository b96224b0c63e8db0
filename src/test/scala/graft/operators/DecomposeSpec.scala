package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Classical decomposition on a controlled series: for
  * c_t = a + b·t + s_{t mod 24} with Σ_h s_h = 0, the centered 2×24 MA
  * reproduces the linear trend EXACTLY (each residue contributes once
  * per window, so the seasonal term averages to zero), hence the
  * extracted seasonal profile must equal the planted s_h exactly.
  */
class DecomposeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("planted trend+season recovers the exact seasonal profile") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def s(h: Int): Int = if (h < 12) 6 else -6
    val nHours = 96
    def cnt(t: Int): Int = 50 + t + s(t % 24)
    val rows = for { t <- 0 until nHours; i <- 0 until cnt(t) }
      yield (t.toLong * 3600L, i.toLong)
    val tmp = java.nio.file.Files.createTempDirectory("decomp").toString
    rows.toDF("sec", "i")
      .select(timestamp_seconds($"sec").as("ts"), $"i".as("event_id"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")

    val out = TimeSeries.decompose(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == (0L until 24L).toSet)
    out.foreach { case (hod, (nTerms, seasonal)) =>
      // valid hours are 12..83 -> 3 full windows per residue
      assert(nTerms == 3L, s"hod $hod: $nTerms terms")
      assert(math.abs(seasonal - s(hod.toInt)) < 1e-9,
        s"hod $hod: seasonal=$seasonal expected=${s(hod.toInt)}")
    }
  }
}
