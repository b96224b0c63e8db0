package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Kneser–Ney bigram LM — independent single-threaded replay of the
  * smoothing arithmetic, plus the model-quality ordering the smoothing
  * exists for.
  */
class KnLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("KN NLL replays against an independent reference; beats add-one on average") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", s"${TextOps.tokensExpr} AS toks")
      .where("size(toks) >= 2")
      .as[(Long, Seq[String])].collect()
    val bigrams = docs.flatMap { case (id, ts) =>
      ts.sliding(2).map(p => (id, (p.head, p(1)))).toSeq
    }
    val cntUv = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val byU = bigrams.map(_._2).groupBy(_._1)
    val cntU = byU.view.mapValues(_.size.toLong).toMap
    val n1Fwd = byU.view.mapValues(_.distinct.size.toLong).toMap
    val n1Back = cntUv.keys.toSeq.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val tt = cntUv.size.toLong
    def p(u: String, v: String): Double =
      (math.max(cntUv((u, v)).toDouble - 0.75, 0.0)
        + 0.75 * n1Fwd(u) * (n1Back(v).toDouble / tt)) / cntU(u).toDouble
    def rnd(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val want = bigrams.groupBy(_._1).map { case (id, bs) =>
      val nlls = bs.map { case (_, (u, v)) =>
        BigDecimal(rnd(-math.log(p(u, v)))).setScale(9)
      }
      (id, bs.length.toLong,
        rnd((nlls.sum / nlls.length).toDouble))
    }.toSet
    val got = TextOps.docLmKnNll(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)

    // Chen & Goodman: interpolated KN consistently beats add-one —
    // corpus-mean NLL must be lower (add-one over-flattens with a
    // large vocabulary)
    val kn = got.toSeq.map(_._3)
    val addOne = TextOps.docLmNll(spark, sf)
      .as[(Long, Long, Double)].collect().map(_._3)
    assert(kn.sum / kn.length < addOne.sum / addOne.length,
      s"KN mean ${kn.sum / kn.length} vs add-one ${addOne.sum / addOne.length}")
    // every probability is a proper one
    bigrams.take(1000).foreach { case (_, (u, v)) =>
      assert(p(u, v) > 0.0 && p(u, v) <= 1.0 + 1e-12)
    }
    assert(rnd(0.1234564999) == 0.123456) // the idiom the engines share
  }
}
