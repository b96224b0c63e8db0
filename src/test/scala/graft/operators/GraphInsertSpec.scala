package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Incremental graph insert: every arrival links to exactly GsDegree
  * base nodes, no linked node is an arrival (the base graph excludes
  * the batch), the in_exact flags agree with an independent exact
  * top-degree scan over the base set, and the search-linked edge set
  * stays close to the ideal (the property search-then-link exists for).
  */
class GraphInsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("arrivals link to near-ideal base neighbors") {
    import spark.implicits._
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
    val arrivals = emb.keys.filter(id => id >= 10 && id < 20).toSeq.sorted
    // canonical base set: min id per identical vector among non-arrivals
    val base = emb.toSeq.filter { case (id, _) => id < 10 || id >= 20 }
    val canon = base.groupBy(_._2.toSeq).map { case (_, g) =>
      g.map(_._1).min }.toSet
    val rows = SemDedup.graphInsert(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.map(_._1).toSet == arrivals.toSet)
    rows.groupBy(_._1).foreach { case (a, es) =>
      assert(es.length == SemDedup.GsDegree, s"arrival $a degree")
      assert(es.forall(e => canon(e._2)), s"arrival $a links off-base")
      val exact = canon.toSeq
        .map(n => (n, cos(emb(a), emb(n))))
        .sortBy { case (n, c) => (-c, n) }.take(SemDedup.GsDegree)
        .map(_._1).toSet
      for ((_, n, _, _, flag) <- es)
        assert(flag == exact(n), s"arrival $a node $n flag")
    }
    val overlap = rows.count(_._5).toDouble / rows.length
    assert(overlap >= 0.8, s"link overlap $overlap")
  }
}
