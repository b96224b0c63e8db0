package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.Hashing

/** The random-walk corpus is fully derived (salted md5-60 picks), so an
  * independent single-threaded Scala walker over the collected edge
  * list must reproduce EVERY row — starts × walks × steps, including
  * early termination at sink nodes.
  */
class RandomWalkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("random walks replay exactly against an independent Scala walker") {
    import spark.implicits._
    val edges = Graph.tokenEdges(spark, sf)
      .as[(String, String, Long)].collect()
    // per-src: dsts in dst order, cumulative bounds (lo_i = cum(i),
    // hi_i = cum(i+1)), total out-count
    val bySrc = edges.groupBy(_._1).map { case (src, es) =>
      val sorted = es.sortBy(_._2)
      val cum = sorted.scanLeft(0L)(_ + _._3)
      src -> ((sorted.map(_._2), cum))
    }
    val want = scala.collection.mutable.Set.empty[(String, Long, Long, String)]
    for (start <- bySrc.keys; wid <- 0L until Graph.WalksPerNode.toLong) {
      var node = start
      want += ((start, wid, 0L, node))
      var t = 1
      var alive = true
      while (t <= Graph.WalkLen && alive) {
        bySrc.get(node) match {
          case Some((dsts, cum)) =>
            val r = Hashing.md5_60(s"walk:$start:$wid:${t - 1}:$node") % cum.last
            val idx = cum.indexWhere(_ > r) - 1
            node = dsts(idx)
            want += ((start, wid, t.toLong, node))
          case None => alive = false
        }
        t += 1
      }
    }
    val got = Graph.randomWalks(spark, sf).as[(String, Long, Long, String)]
      .collect().toSet
    assert(got == want.toSet)
    // every start node launches all its walks
    assert(got.count(_._3 == 0L) == bySrc.size * Graph.WalksPerNode)
  }
}
