package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Radius-search soundness against an independent brute-force pass on
  * the real fixture: every returned pair must truly be within the τ
  * radius (the verification step is exact — the IVF probe can only
  * LOSE candidates, never invent them), and the probed recall of the
  * true τ-neighborhood must be substantial.
  */
class RangeSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("all returned pairs are true tau-neighbors; recall is substantial") {
    import spark.implicits._
    val out = Similarity.rangeSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val all = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = all.filter(_._1 < 10)
    val truth = (for {
      (q, qe) <- queries; (n, ne) <- all
      if n != q && cos(qe, ne) >= Similarity.RangeSearchTau
    } yield (q, n)).toSet

    assert(out.nonEmpty, "radius search returned nothing on the fixture")
    assert(out.subsetOf(truth),
      s"false positives: ${out.diff(truth).take(5)}")
    val recall = out.size.toDouble / truth.size
    assert(recall >= 0.5, s"recall $recall (${out.size}/${truth.size})")
  }
}
