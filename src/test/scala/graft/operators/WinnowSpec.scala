package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Robust winnowing (SIGMOD'03) kernel guarantees, on controlled docs:
  * the substring guarantee (any shared token run of length ≥ w + k − 1
  * shares a fingerprint), the density band (selected fingerprints per
  * doc between n_windows/w and n_windows), and the rightmost tie-break
  * (a constant-token doc collapses to exactly one fingerprint).
  */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def stage(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("winnow").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("shared-run pair is reported; disjoint control is not") {
    val run = (0 until 30).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      1L -> s"alpha beta gamma $run",
      2L -> s"$run delta epsilon zeta",
      3L -> (0 until 30).map(i => s"other$i").mkString(" "))
    val out = Dedup.winnowPairs(spark, stage(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(out.contains((1L, 2L)), s"missing shared-run pair: $out")
    assert(out((1L, 2L)) >= 0.5)
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("density stays inside the winnowing band on a distinct-token doc") {
    // 50 tokens -> 48 trigrams -> 45 window starts at w=4
    val doc = (0 until 50).map(i => s"tok$i").mkString(" ")
    val out = Dedup.winnowPairs(spark, stage(Seq(1L -> doc, 2L -> doc)))
      .collect()
    assert(out.length == 1)
    val r = out.head
    val (shared, fpA, fpB, overlap) =
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
    assert(fpA == fpB && shared == fpA && overlap == 1.0)
    val nWindows = 45
    assert(fpA >= nWindows / Dedup.WinnowW && fpA <= nWindows,
      s"fp count $fpA outside [${nWindows / Dedup.WinnowW}, $nWindows]")
  }

  test("constant-token doc collapses to one fingerprint (rightmost tie-break)") {
    val doc = Seq.fill(20)("x").mkString(" ")
    val out = Dedup.winnowPairs(spark, stage(Seq(1L -> doc, 2L -> doc)))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L && r.getLong(4) == 1L)
    assert(r.getDouble(5) == 1.0)
  }
}
