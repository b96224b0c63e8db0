package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Poisson burst kernel on a planted series: a 2× spike over a rate-100
  * baseline is flagged, ordinary hours are not, the trailing λ excludes
  * the hour's own count, and — the variance-stabilization claim — a
  * spike of identical RELATIVE size over a tiny rate is NOT flagged
  * (where a raw z-score would fire on noise-scale counts).
  */
class PoissonBurstSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(counts: Seq[Int]): Map[Long, (Long, Double, Boolean)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = for { (c, h) <- counts.zipWithIndex; i <- 0 until c }
      yield (h.toLong * 3600L, i.toLong)
    val tmp = java.nio.file.Files.createTempDirectory("pburst").toString
    rows.toDF("sec", "i")
      .select(timestamp_seconds($"sec").as("ts"), $"i".as("event_id"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    TimeSeries.poissonBurst(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3), r.getBoolean(4)))
      .toMap
  }

  test("2x spike over rate 100 flagged; trailing lambda excludes self") {
    val counts = Seq.tabulate(48)(h => if (h == 30) 200 else 100)
    val out = run(counts)
    assert(out.keySet == (24L until 48L).toSet)
    assert(out(30L)._3, s"burst hour not flagged: ${out(30L)}")
    // z = 2*(sqrt(200.375) - sqrt(100.375))
    val expZ = math.floor(
      2 * (math.sqrt(200.375) - math.sqrt(100.375)) * 1e6 + 0.5) / 1e6
    assert(out(30L)._2 == expZ, s"${out(30L)._2} vs $expZ")
    assert(out.filter(_._1 != 30L).values.forall(!_._3),
      "non-burst hour flagged")
  }

  test("same relative spike over rate 2 is NOT flagged (stabilized variance)") {
    val out = run(Seq.tabulate(48)(h => if (h == 30) 4 else 2))
    // z = 2*(sqrt(4.375) - sqrt(2.375)) ~ 1.1 — inside Poisson noise
    assert(!out(30L)._3, s"noise-scale spike flagged: ${out(30L)}")
  }
}
