package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Embedding-drift PSI — structural gates: the reference deciles must
  * actually equal-mass the reference half, every vector lands in
  * exactly one bin, and the smoothed terms are defined everywhere.
  */
class EmbeddingDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("drift bins partition the collection; reference deciles equal-mass") {
    import spark.implicits._
    val rows = DataQuality.dqEmbeddingDrift(spark, sf)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 9L))
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum + rows.map(_._3).sum == n)
    // the reference half binned by its own deciles: equal mass
    // within interpolation slack (ties can shift a point or two)
    val nref = rows.map(_._2).sum
    rows.foreach { case (b, r, _, _) =>
      assert(math.abs(r - nref / 10.0) <= math.max(2.0, nref * 0.02),
        s"ref bin $b holds $r of $nref")
    }
    // smoothing keeps every term finite
    rows.foreach { case (_, _, _, t) =>
      assert(!t.isNaN && !t.isInfinite)
    }
  }
}
