package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Beam-width recall sweep: one row per swept quota, recall = hits /
  * truth_n exactly, monotone non-decreasing in the beam width (a wider
  * beam can only keep more candidates), and the widest quota agrees
  * with sim_graph_search's own hit count (same loop, same quota).
  */
class GraphRecallCurveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sweep is monotone and consistent with the production search") {
    val rows = SemDedup.graphRecallCurve(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == SemDedup.GrBeams.map(_.toLong))
    for ((_, h, t, rec) <- rows) {
      assert(t > 0 && h >= 0 && h <= t)
      assert(rec == h.toDouble / t)
    }
    val recs = rows.map(_._4).toSeq
    assert(recs == recs.sorted, s"not monotone: $recs")
    // widest sweep point == the production search's own hits
    val prodHits = SemDedup.graphSearch(spark, TestSpark.sf).collect()
      .count(_.getBoolean(4)).toLong
    assert(rows.last._2 == prodHits,
      s"sweep ${rows.last._2} != production $prodHits")
  }
}
