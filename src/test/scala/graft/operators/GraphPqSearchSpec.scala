package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** DiskANN-shaped graph+PQ search: in_truth flags must agree with an
  * independently computed exact top-k, recall must stay high even
  * though navigation runs on compressed distances (the property the
  * exact rerank of the ADC shortlist exists for), and the output order
  * must be the documented total order.
  */
class GraphPqSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flags match exact truth; compressed navigation still recalls") {
    import spark.implicits._
    val rows = Similarity.graphPqSearch(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
      .selectExpr("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toMap
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
        .sortBy { case (n, c) => (-c, n) }.take(SemDedup.GsTopK)
        .map(_._1).toSet
    }.toMap
    for ((q, n, _, _, _, flag) <- rows)
      assert(flag == truth(q)(n), s"q$q n$n flag $flag")
    val recall = rows.count(_._6).toDouble /
      truth.values.map(_.size).sum
    // uniform-random 64-d vectors are PQ's worst case: the 32-bit code
    // caps recall (~0.68 here vs 0.60 for the FLAT full-scan PQ
    // shortlist on the same fixture — navigation is not the limiter);
    // the clustered-fixture regime is covered by SimilarityRecallSpec
    assert(recall >= 0.5, s"recall $recall")
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._5)
      assert(sorted.length <= SemDedup.GsTopK)
      assert(sorted.map(_._5).toSeq == (1L to sorted.length).toSeq)
      val cs = sorted.map(_._4).toSeq
      assert(cs == cs.sorted.reverse, s"q$q order")
    }
  }
}
