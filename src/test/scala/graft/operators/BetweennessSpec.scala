package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Brandes betweenness — independent single-threaded replay (BFS with
  * path counting and backward dependency accumulation under the same
  * 9-dp term rounding), plus the unroll-depth safety bound the fixed
  * level count relies on.
  */
class BetweennessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def rnd9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9

  test("betweenness replays exactly; diameter stays under the unroll bound") {
    import spark.implicits._
    val edges = Graph.tokenEdges(spark, sf)
      .select($"src", $"dst").as[(String, String)].collect().toSet
    val succ = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.distinct

    var maxDepth = 0
    val bc = scala.collection.mutable.Map.empty[String, BigDecimal]
      .withDefaultValue(BigDecimal(0))
    nodes.foreach { s =>
      // forward: level-synchronous BFS with path counts
      var frontier = Map(s -> 1L)
      var seen = Set(s)
      val lvls = scala.collection.mutable.ArrayBuffer(frontier)
      while (frontier.nonEmpty) {
        val next = scala.collection.mutable.Map.empty[String, Long]
          .withDefaultValue(0L)
        frontier.foreach { case (v, sg) =>
          succ.getOrElse(v, Nil).foreach { w =>
            if (!seen(w)) next(w) += sg
          }
        }
        frontier = next.toMap
        seen ++= frontier.keySet
        if (frontier.nonEmpty) lvls += frontier
      }
      maxDepth = math.max(maxDepth, lvls.length - 1)
      // backward: dependency accumulation, 9-dp floor terms summed
      // as exact decimals (the query's discipline)
      var delta = Map.empty[String, Double]
      for (l <- (lvls.length - 2) to 0 by -1) {
        delta = lvls(l).map { case (v, sg) =>
          val terms = succ.getOrElse(v, Nil)
            .filter(w => lvls(l + 1).contains(w))
            .map { w =>
              BigDecimal(rnd9(sg.toDouble / lvls(l + 1)(w)
                * (1 + delta.getOrElse(w, 0.0)))).setScale(9)
            }
          v -> (if (terms.isEmpty) 0.0 else terms.sum.toDouble)
        }.filter { case (_, d) => true }
        delta.foreach { case (v, d) =>
          if (v != s && d != 0.0) bc(v) += BigDecimal(d).setScale(9)
        }
      }
    }
    assert(maxDepth < Graph.BetwMaxDepth,
      s"diameter $maxDepth must stay below the ${Graph.BetwMaxDepth} unroll")

    val got = Graph.betweenness(spark, sf)
      .as[(String, Double)].collect().toMap
    assert(got.keySet == nodes.toSet)
    val want = nodes.map(n => n -> bc(n).toDouble).toMap
    assert(got == want)
    // the broker property: scores non-negative, and not all zero
    assert(got.values.forall(_ >= 0.0))
    assert(got.values.exists(_ > 0.0))
  }

  test("sampled betweenness replays exactly from the k hub pivots and scales n/k") {
    import spark.implicits._
    val weighted = Graph.tokenEdges(spark, sf)
      .as[(String, String, Long)].collect()
    val edges = weighted.map { case (a, b, _) => (a, b) }.toSet
    val succ = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.distinct
    // seed pick: out-mass DESC, token ASC — the engine's total order
    val seeds = weighted.groupBy(_._1).view.mapValues(_.map(_._3).sum)
      .toSeq.sortBy { case (t, m) => (-m, t) }
      .take(Graph.BetwApproxSeeds).map(_._1)
    val bc = scala.collection.mutable.Map.empty[String, BigDecimal]
      .withDefaultValue(BigDecimal(0))
    seeds.foreach { s =>
      var frontier = Map(s -> 1L)
      var seen = Set(s)
      val lvls = scala.collection.mutable.ArrayBuffer(frontier)
      while (frontier.nonEmpty) {
        val next = scala.collection.mutable.Map.empty[String, Long]
          .withDefaultValue(0L)
        frontier.foreach { case (v, sg) =>
          succ.getOrElse(v, Nil).foreach(w => if (!seen(w)) next(w) += sg)
        }
        frontier = next.toMap
        seen ++= frontier.keySet
        if (frontier.nonEmpty) lvls += frontier
      }
      var delta = Map.empty[String, Double]
      for (l <- (lvls.length - 2) to 0 by -1) {
        delta = lvls(l).map { case (v, sg) =>
          val terms = succ.getOrElse(v, Nil)
            .filter(w => lvls(l + 1).contains(w))
            .map { w =>
              BigDecimal(rnd9(sg.toDouble / lvls(l + 1)(w)
                * (1 + delta.getOrElse(w, 0.0)))).setScale(9)
            }
          v -> (if (terms.isEmpty) 0.0 else terms.sum.toDouble)
        }
        delta.foreach { case (v, d) =>
          if (v != s && d != 0.0) bc(v) += BigDecimal(d).setScale(9)
        }
      }
    }
    val n = nodes.length
    val k = seeds.length
    def rnd6f(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val want = nodes.map(v => v -> rnd6f(bc(v).toDouble * n / k)).toMap
    val got = Graph.betweennessApprox(spark, sf)
      .as[(String, Double)].collect().toMap
    assert(got == want)
    // the estimator tracks the exact form: the exact top-5 brokers and
    // the sampled top-5 overlap (hub pivots cover the shortest-path
    // mass on this graph)
    val exact = Graph.betweenness(spark, sf)
      .as[(String, Double)].collect()
    val topExact = exact.sortBy { case (v, b) => (-b, v) }.take(5).map(_._1).toSet
    val topApprox = got.toSeq.sortBy { case (v, b) => (-b, v) }
      .take(5).map(_._1).toSet
    assert(topExact.intersect(topApprox).size >= 3,
      s"sampled estimator diverged: exact=$topExact approx=$topApprox")
  }
}
