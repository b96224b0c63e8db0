package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** HyperANF neighborhood function — exact single-threaded replay of
  * the register propagation (balls by BFS, registers by the md5-60
  * kit, the estimator's exact float/decimal steps), plus the
  * mathematical properties the sketch exists for: N(t) monotone,
  * saturating at the diameter, and the saturated estimate within the
  * HLL error band of the true Σ|ball|.
  */
class AnfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  test("anf curve replays exactly; monotone; saturated est in the HLL band") {
    import spark.implicits._
    val edges = Graph.tokenEdges(spark, sf)
      .select($"src", $"dst").as[(String, String)].collect().toSet
    val succ = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.distinct

    // balls by BFS per node per depth
    val balls = nodes.map { v =>
      val perT = scala.collection.mutable.ArrayBuffer(Set(v))
      var cur = Set(v)
      for (_ <- 1 to Graph.AnfRounds) {
        cur = cur ++ cur.flatMap(u => succ.getOrElse(u, Set.empty))
        perT += cur
      }
      v -> perT.toSeq
    }.toMap

    // the estimator's exact steps (the engine's float/decimal order)
    def est(members: Set[String]): Double = {
      val regs = members.toSeq.map { u =>
        val hv = md5_60(u)
        val idx = hv >>> 48
        val rem = hv % (1L << 48)
        val m = if (rem == 0) 49
          else 49 - java.lang.Long.toBinaryString(rem).length
        (idx, m)
      }.groupBy(_._1).map { case (i, ms) => (i, ms.map(_._2).max) }
      val m = Sketches.HllM
      val sDec = regs.values
        .map(mv => BigDecimal(math.pow(2.0, -mv))
          .setScale(18, BigDecimal.RoundingMode.HALF_UP))
        .sum
      val zeros = m - regs.size
      val sAll = sDec.toDouble + zeros
      val raw = Sketches.HllAlpha * m * m / sAll
      val corrected =
        if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
        else raw
      BigDecimal(corrected).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = (0 to Graph.AnfRounds).map { t =>
      t.toLong -> nodes
        .map(v => BigDecimal(est(balls(v)(t))).setScale(4))
        .sum.toDouble
    }.toMap

    val got = Graph.anf(spark, sf)
      .as[(Long, Double)].collect().toMap
    assert(got == want)

    // monotone non-decreasing, saturating at the diameter (the last
    // rounds are fixpoints — AnfRounds exceeds the graph diameter)
    val curve = (0 to Graph.AnfRounds).map(t => got(t.toLong))
    assert(curve.zip(curve.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(curve(Graph.AnfRounds) == curve(Graph.AnfRounds - 1),
      "curve must saturate before the round bound")

    // saturated estimate vs the true total reach: per-node HLL at
    // p=12 is 3σ ≈ 4.9%; the sum of per-node errors stays inside it
    val exactTotal = nodes.map(v => balls(v)(Graph.AnfRounds).size.toLong).sum
    val estTotal = curve(Graph.AnfRounds)
    assert(math.abs(estTotal - exactTotal) <= math.max(3.0, 0.049 * exactTotal),
      s"exact=$exactTotal est=$estTotal")
  }
}
