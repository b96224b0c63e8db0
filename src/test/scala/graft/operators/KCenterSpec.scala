package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The greedy k-center selection is a pure function of the collection
  * (exact folds, id tie-breaks), so an independent single-threaded
  * Gonzalez implementation must reproduce every pick and radius — and
  * the emitted radius trace must be the non-increasing objective
  * curve the greedy guarantees.
  */
class KCenterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("k-center picks and radii replay exactly; radius trace non-increasing") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .sortBy(_._1)
    def sq(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      s
    }
    val byId = emb.toMap
    var picks = Seq((1, emb.head._1, 0.0))
    var mind = emb.map { case (id, e) => (id, sq(e, byId(emb.head._1))) }
    for (r <- 2 to Curation.KCenterK) {
      val (pid, pd) = mind.maxBy { case (id, d) => (d, -id) }
      picks :+= ((r, pid, pd))
      mind = mind.map { case (id, d) =>
        (id, math.min(d, sq(byId(id), byId(pid))))
      }
    }
    val got = Curation.kcenterCoreset(spark, sf)
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == picks.map { case (r, id, d) => (r, id, d) })
    // objective curve: each pick's distance-to-selected can only shrink
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a })
    assert(got.map(_._2).distinct.length == Curation.KCenterK)
    assert(radii.head > 0.0)
  }
}
