package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** LTTB downsampling — independent sequential replay over the
  * collected dense series, plus the structural guarantees (pinned
  * endpoints, one pick per bucket, bucket-local indices, time order).
  */
class LttbSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("LTTB picks replay exactly; endpoints pinned; one pick per bucket") {
    import spark.implicits._
    // the dense series, independently gap-filled
    val sparse = graft.Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 3600000000 AS t")
      .groupBy($"t").count()
      .as[(Long, Long)].collect().toMap
    val t0 = sparse.keys.min
    val t1 = sparse.keys.max
    val pts = (t0 to t1).map(t => (t, sparse.getOrElse(t, 0L))).toArray
    val n = pts.length
    val m = TimeSeries.LttbPoints
    val nb = m - 2
    assert(n > m, "fixture series must be longer than the target")
    def edge(k: Int): Int = 1 + math.floor(k.toLong * (n - 2) / nb.toDouble).toInt
    var prev = 0
    val want = scala.collection.mutable.ArrayBuffer((1, pts(0)._1, pts(0)._2))
    for (k <- 1 to nb) {
      val (xa, ya) =
        if (k == nb) (pts(n - 1)._1.toDouble, pts(n - 1)._2.toDouble)
        else {
          val seg = (edge(k) until edge(k + 1)).map(pts)
          (seg.map(_._1).sum.toDouble / seg.size,
            seg.map(_._2).sum.toDouble / seg.size)
        }
      val (pt, pc) = pts(prev)
      val best = (edge(k - 1) until edge(k)).maxBy { i =>
        val (bt, bc) = pts(i)
        (math.abs((pt.toDouble - xa) * (bc.toDouble - pc.toDouble)
          - (pt.toDouble - bt.toDouble) * (ya - pc.toDouble)), -i)
      }
      prev = best
      want += ((k + 1, pts(best)._1, pts(best)._2))
    }
    want += ((m, pts(n - 1)._1, pts(n - 1)._2))

    val got = TimeSeries.lttbDownsample(spark, sf)
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want.toSeq)
    assert(got.head == (1, pts(0)._1, pts(0)._2))
    assert(got.last == (m, pts(n - 1)._1, pts(n - 1)._2))
    // strictly increasing in time, one pick per bucket inside its span
    assert(got.map(_._2) == got.map(_._2).sorted)
    got.drop(1).dropRight(1).zipWithIndex.foreach { case ((_, t, _), k0) =>
      val k = k0 + 1
      val span = (edge(k - 1) until edge(k)).map(pts(_)._1)
      assert(t >= span.head && t <= span.last, s"bucket $k pick $t outside span")
    }
  }
}
