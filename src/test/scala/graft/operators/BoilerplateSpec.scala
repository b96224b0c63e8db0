package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Boilerplate detection on controlled docs: a 10-token header shared
  * by three docs is flagged in ALL of them (df ≥ 3 — including the
  * first occurrence, the contrast with paragraph dedup's first-wins
  * rule), unique chunks are not, and a df-2 chunk stays clean.
  */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("shared header flagged everywhere, unique and df-2 chunks clean") {
    import spark.implicits._
    val header = (0 until 10).map(i => s"head$i").mkString(" ")
    val pair = (0 until 10).map(i => s"pair$i").mkString(" ")
    def uniq(d: Int) = (0 until 10).map(i => s"u${d}x$i").mkString(" ")
    val docs = Seq(
      1L -> s"$header ${uniq(1)}",
      2L -> s"$header ${uniq(2)}",
      3L -> s"$header ${uniq(3)}",
      4L -> s"$pair ${uniq(4)}",
      5L -> s"$pair ${uniq(5)}")
    val tmp = java.nio.file.Files.createTempDirectory("boiler").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val out = Dedup.boilerplateRatio(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    Seq(1L, 2L, 3L).foreach { d =>
      assert(out(d) == ((2L, 1L, 0.5)), s"doc $d: ${out(d)}")
    }
    Seq(4L, 5L).foreach { d =>
      assert(out(d) == ((2L, 0L, 0.0)), s"doc $d: ${out(d)}")
    }
  }
}
