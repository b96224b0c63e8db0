package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Personalized PageRank — independent single-threaded replay of the
  * seeded recurrence (decimal-exact contribution sums, floor-idiom
  * re-rounds), plus the concentration properties personalization
  * exists for.
  */
class PprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def rnd9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9

  test("PPR replays exactly; mass concentrates on the seed neighborhood") {
    import spark.implicits._
    val edges = Graph.tokenEdges(spark, sf)
      .as[(String, String, Long)].collect()
    val oc = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val w = edges.map { case (u, v, c) => (u, v, c.toDouble / oc(u)) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    // highest out-mass, ties lexically smallest — the query's seed rule
    val seedQ = oc.toSeq.sortBy { case (s, o) => (-o, s) }.head._1
    var rank = nodes.map(n => n -> (if (n == seedQ) 1.0 else 0.0)).toMap
    for (_ <- 1 to Graph.Iters) {
      val contribs = w.groupBy(_._2).view.mapValues { es =>
        es.map { case (u, _, wu) =>
          BigDecimal(rnd9(rank(u) * wu)).setScale(9)
        }.sum
      }.toMap
      rank = nodes.map { n =>
        val c = contribs.get(n).map(_.toDouble).getOrElse(0.0)
        n -> rnd9((if (n == seedQ) 0.15 else 0.0) + 0.85 * c)
      }.toMap
    }
    val got = Graph.personalizedPagerank(spark, sf)
      .as[(String, Double)].collect().toMap
    assert(got == rank)
    // teleport mass returns to the seed: it must hold the max score
    assert(got.maxBy(_._2)._1 == seedQ)
    // leaky dangling: total mass bounded by 1
    assert(got.values.sum <= 1.0 + 1e-6)
    // personalization ≠ global centrality: the distribution must differ
    // from plain pagerank beyond rounding
    val pr = Graph.pagerank(spark, sf).as[(String, Double)].collect().toMap
    assert(got.keySet == pr.keySet)
    assert(got.toSeq.sortBy(-_._2).map(_._1).take(3)
      != pr.toSeq.sortBy(-_._2).map(_._1).take(3)
      || got.values.toSeq.sorted != pr.values.toSeq.sorted)
  }
}
