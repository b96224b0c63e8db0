package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Known-item retrieval eval: one row per sample query, metric columns
  * internally consistent (rr = 1/rank, hit flags are rank cuts, rank
  * bounded by the candidate count), and retrieval actually finds the
  * source documents (the property the top-3-tfidf query formulation
  * exists for).
  */
class KnownItemEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("metrics are consistent and retrieval finds sources") {
    val rows = TextOps.knownItemEval(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3), r.getBoolean(4), r.getLong(5)))
    val qs = rows.map(_._1).toSet
    assert(rows.length == qs.size && rows.nonEmpty, "one row per query")
    for ((q, rank, rr, h1, h10, n) <- rows) {
      assert(rank >= 1 && rank <= n, s"q$q rank $rank of $n")
      assert(rr == 1.0 / rank, s"q$q rr")
      assert(h1 == (rank <= 1) && h10 == (rank <= 10), s"q$q flags")
    }
    // the known item is findable: most sources inside the top 10
    assert(rows.count(_._5) * 2 > rows.length,
      s"hit@10 ${rows.count(_._5)}/${rows.length}")
  }
}
