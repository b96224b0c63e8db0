package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the round-3 pointer-jumping upgrade of the cluster-resolution
  * loop: a deep chain converges in O(log diameter) rounds instead of the
  * diameter rounds one-hop label propagation needs, and the convergence
  * check no longer runs a separate driver action per round.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def symmetric(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  test("256-node chain: labels collapse to the min in O(log n) rounds, not diameter") {
    val chain = symmetric((0L until 255L).map(i => (i, i + 1)))
    val (labels, iters) = Dedup.connectedComponents(chain, 2, maxIters = 24)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 256)
    assert(got.forall(_._2 == 0L))
    // one-hop propagation needs 255 rounds here; pointer jumping stays
    // logarithmic (2^10 > 256 even with slack for the relax interleave)
    assert(iters <= 12, s"took $iters rounds on a 255-hop chain")
  }

  test("disjoint components keep distinct min labels") {
    val edges = symmetric(Seq((10L, 11L), (11L, 12L), (50L, 51L), (7L, 12L)))
    val (labels, _) = Dedup.connectedComponents(edges, 2, maxIters = 16)
    val byNode = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Seq(7L, 10L, 11L, 12L).forall(byNode(_) == 7L))
    assert(Seq(50L, 51L).forall(byNode(_) == 50L))
  }

  test("hard node-count cap rescues an undershot soft bound; exhaustion still throws") {
    // a 64-node chain can't converge in 2 rounds — the soft (log) bound
    // is empirical for the relax+jump hybrid, so overshooting it must
    // degrade to more rounds (up to the proven node-count cap), not fail
    val chain = symmetric((0L until 63L).map(i => (i, i + 1)))
    val (labels, iters) =
      Dedup.connectedComponents(chain, 2, maxIters = 2, hardMaxIters = 128)
    assert(labels.collect().forall(_.getLong(1) == 0L))
    assert(iters > 2)
    // with BOTH bounds exhausted the loop must still fail loudly rather
    // than return split clusters
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, 2, maxIters = 1, hardMaxIters = 2)
    }
  }

  test("star and triangle converge immediately within the bound") {
    val star = symmetric((1L to 9L).map(i => (0L, i)))
    val (l1, i1) = Dedup.connectedComponents(star, 2, maxIters = 8)
    assert(l1.collect().forall(_.getLong(1) == 0L))
    assert(i1 <= 3)
    val tri = symmetric(Seq((3L, 4L), (4L, 5L), (3L, 5L)))
    val (l2, _) = Dedup.connectedComponents(tri, 2, maxIters = 8)
    assert(l2.collect().forall(_.getLong(1) == 3L))
  }
}
