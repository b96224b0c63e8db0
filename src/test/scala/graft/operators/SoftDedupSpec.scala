package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Soft dedup on a controlled corpus: a 3-member near-dup cluster gets
  * weight 1/3 per copy, singletons keep weight 1, and total mass equals
  * the number of distinct content units.
  */
class SoftDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cluster members split unit mass; singletons keep it") {
    import spark.implicits._
    val words = (0 until 60).map(i => s"w$i")
    val base = words.mkString(" ")
    val nearA = (words.take(58) ++ Seq("xx", "yy")).mkString(" ")
    val nearB = (words.take(57) ++ Seq("aa", "bb", "cc")).mkString(" ")
    val docs = Seq(
      1L -> base, 2L -> nearA, 3L -> nearB,
      4L -> (0 until 60).map(i => s"other$i").mkString(" "),
      5L -> (0 until 60).map(i => s"else$i").mkString(" "))
    val tmp = java.nio.file.Files.createTempDirectory("softdedup").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val out = Dedup.softDedupWeights(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    Seq(1L, 2L, 3L).foreach { d =>
      assert(out(d) == ((3L, 1.0 / 3)), s"doc $d: ${out(d)}")
    }
    Seq(4L, 5L).foreach { d => assert(out(d) == ((1L, 1.0)), s"doc $d") }
    val mass = out.values.map(_._2).sum
    assert(math.abs(mass - 3.0) < 1e-9, s"total mass $mass")
  }
}
