package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Graph-based ANN beam search: the self-reported `in_truth` flags
  * must agree with an independently computed exact brute-force top-k,
  * the search must achieve high recall on the fixture (the property
  * the per-cell beams + two-entry rule + symmetrized degree-16 graph
  * exist for — a regression here means navigation broke, the class of
  * bug that shipped recall 0.12 three design iterations ago), and the
  * output order must be the documented total order.
  */
class GraphSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("in_truth flags match an independent exact top-k; recall is high") {
    import spark.implicits._
    val rows = SemDedup.graphSearch(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    // independent truth: exact cosine top-5 per query, driver-side
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
    for ((q, n, _, _, flag) <- rows)
      assert(flag == truth(q)(n), s"q$q n$n flag $flag")
    val recall = rows.count(_._5).toDouble /
      truth.values.map(_.size).sum
    assert(recall >= 0.8, s"recall $recall")
    // per-query: ≤ k rows, ranks 1..n, cosine non-increasing
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.length <= SemDedup.GsTopK)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq)
      val cs = sorted.map(_._3).toSeq
      assert(cs == cs.sorted.reverse, s"q$q order")
    }
  }
}
