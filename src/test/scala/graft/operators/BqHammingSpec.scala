package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Binary quantization retrieval: the packed sign words must equal an
  * independent driver-side packing (bit i set iff dim i > 0), the
  * in_truth flags must agree with an independent exact top-k, recall
  * must clear the floor the 100-candidate rerank exists for, and the
  * output must follow the documented total order.
  */
class BqHammingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sign words match driver-side packing; flags and order are exact") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
      .selectExpr("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toMap
    // independent packing
    def word(e: Array[Float], lo: Int): Long =
      (0 until 32).map(b => if (e(lo + b) > 0f) 1L << b else 0L).sum
    val rows = Similarity.bqHamming(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    // hamming column must equal the popcount of the independent packing
    for ((q, n, ham, _, _, _) <- rows) {
      val expect = java.lang.Long.bitCount(word(emb(q), 0) ^ word(emb(n), 0)) +
        java.lang.Long.bitCount(word(emb(q), 32) ^ word(emb(n), 32))
      assert(ham == expect, s"q$q n$n hamming $ham != $expect")
    }
    // independent exact truth + flag agreement + recall floor
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = emb.keys.filter(_ < 10).map { q =>
      q -> emb.keys.filter(_ != q).toSeq
        .map(n => (n, cos(emb(q), emb(n))))
        .sortBy { case (n, c) => (-c, n) }.take(Similarity.BqK)
        .map(_._1).toSet
    }.toMap
    for ((q, n, _, _, _, flag) <- rows)
      assert(flag == truth(q)(n), s"q$q n$n flag $flag")
    val recall = rows.count(_._6).toDouble / truth.values.map(_.size).sum
    assert(recall >= 0.5, s"recall $recall")
    // per-query: exactly k rows, ranks 1..k, cosine non-increasing
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._5)
      assert(sorted.length == Similarity.BqK)
      assert(sorted.map(_._5).toSeq == (1L to Similarity.BqK).toSeq)
      val cs = sorted.map(_._4).toSeq
      assert(cs == cs.sorted.reverse, s"q$q order")
    }
  }
}
