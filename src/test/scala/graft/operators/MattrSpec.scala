package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** MATTR kernel on controlled docs: all-distinct text scores 1.0 at any
  * length, a single repeated token scores 1/min(w, n), the short-doc
  * fallback equals plain TTR, and — the length-robustness claim — a
  * cyclic vocabulary scores identically at 1× and 3× length, where
  * plain TTR would drop by 3×.
  */
class MattrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Double)] = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mattr").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    TextOps.docMattr(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
  }

  test("distinct, constant, short-doc, and length-robustness cases") {
    val w = TextOps.MattrW
    val cyc = (0 until 25).map(i => s"c$i")
    val out = run(Seq(
      1L -> (0 until 120).map(i => s"d$i").mkString(" "),  // all distinct
      2L -> Seq.fill(200)("x").mkString(" "),              // constant
      3L -> (0 until 10).map(i => s"s$i").mkString(" "),   // short: TTR=1
      4L -> Seq.fill(4)(cyc).flatten.mkString(" "),        // cyclic 100
      5L -> Seq.fill(12)(cyc).flatten.mkString(" ")))      // cyclic 300
    assert(out(1L) == ((120L, 71L, 1.0)))
    assert(out(2L)._3 == math.floor(1.0 / w * 1e6 + 0.5) / 1e6)
    assert(out(3L) == ((10L, 1L, 1.0)))
    // every width-50 window of a 25-cycle holds exactly 25 distinct
    val expect = math.floor(25.0 / w * 1e6 + 0.5) / 1e6
    assert(out(4L)._3 == expect && out(5L)._3 == expect,
      s"length robustness: ${out(4L)} vs ${out(5L)}")
  }
}
