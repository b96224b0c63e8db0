package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hard-negative mining: every mined negative carries a label different
  * from its query's, ranks are the documented total order, the margin
  * column is exactly pos_cos − cosine, and the mined set per query is
  * exactly the top-k different-label neighbors of an independent exact
  * scan.
  */
class HardNegativesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("negatives are top-k different-label neighbors with exact margins") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, TestSpark.sf)
      .selectExpr("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect()
    val byId = emb.map(t => t._1 -> t).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val rows = Similarity.hardNegatives(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    for ((q, n, nl, c, _, pc, m) <- rows) {
      assert(nl == byId(n)._3 && nl != byId(q)._3, s"q$q n$n label")
      assert(m == pc - c, s"q$q n$n margin")
    }
    // independent truth per query
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val (_, qe, ql) = byId(q)
      val negs = emb.filter(t => t._1 != q && t._3 != ql)
        .map(t => (t._1, cos(qe, t._2)))
        .sortBy { case (n, c) => (-c, n) }.take(Similarity.HnK)
      assert(rs.sortBy(_._5).map(_._2).toSeq == negs.map(_._1).toSeq,
        s"q$q top-k mismatch")
      val posBest = emb.filter(t => t._1 != q && t._3 == ql)
        .map(t => cos(qe, t._2)).max
      // pos_cos equals the exact best same-label cosine (same fold)
      for ((_, _, _, _, _, pc, _) <- rs)
        assert(math.abs(pc - posBest) < 1e-12, s"q$q pos_cos")
    }
  }
}
