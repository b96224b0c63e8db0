package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import graft.TestSpark

/** Scale-growth assertions for the two iterative operators — the
  * cheapest available substitute for an sf≥1 fixture: drive each on
  * synthetic graphs at 1× and 10× and assert the growth law the 100 TB
  * story claims (SCALING.md): round counts grow with log(diameter), not
  * size, and per-round shuffle volume grows linearly with the edge
  * count, not quadratically.
  */
class IterativeScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Symmetric edge list of a path graph 0-1-2-…-(n-1) — worst-case
    * diameter for its size, the adversarial shape for label propagation.
    */
  private def pathEdges(n: Int) = {
    import spark.implicits._
    (0 until n - 1).flatMap(i =>
      Seq((i.toLong, i + 1L), (i + 1L, i.toLong))).toDF("src", "dst")
  }

  /** Disjoint 4-node stars — diameter stays 2 no matter how many. */
  private def starEdges(nStars: Int) = {
    import spark.implicits._
    (0 until nStars).flatMap { s =>
      val hub = s * 4L
      (1 to 3).flatMap(k => Seq((hub, hub + k), (hub + k, hub)))
    }.toDF("src", "dst")
  }

  test("connected components: rounds grow with log(diameter), not node count") {
    val (labels100, r100) = Dedup.connectedComponents(pathEdges(100), 2, 64)
    val (labels1000, r1000) = Dedup.connectedComponents(pathEdges(1000), 2, 64)
    assert(labels100.count() == 100 && labels1000.count() == 1000)
    // every node labels to the path's minimum
    assert(labels1000.select("label").distinct().count() == 1)
    // 10x the diameter must cost ~log2(10) extra rounds, nowhere near 10x
    assert(r1000 <= r100 + 5,
      s"rounds grew $r100 -> $r1000 for 10x diameter; expected +log2(10)~+4")
    assert(r1000 < 20, s"pointer jumping should close a 1000-path well " +
      s"under 20 rounds, took $r1000")
  }

  test("connected components: rounds are FLAT when 10x the data keeps the diameter") {
    val (l1, r1) = Dedup.connectedComponents(starEdges(50), 2, 64)
    val (l10, r10) = Dedup.connectedComponents(starEdges(500), 2, 64)
    assert(l1.count() == 200 && l10.count() == 2000)
    assert(l10.select("label").distinct().count() == 500)
    // size grew 10x, diameter didn't — round count must not move
    assert(r10 <= r1 + 1, s"rounds $r1 -> $r10 on fixed-diameter 10x data")
  }

  /** Total shuffle records written while `body` runs — the direct
    * measure of data movement (listener events are dispatched async;
    * drained via waitUntilEmpty before reading).
    */
  private def shuffleRecords(body: => Unit): Long = {
    val recs = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.graft.TestListenerBridge.drain(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    recs.get()
  }

  /** Ring graph with a chord per node: n nodes, 2n directed edges,
    * every node has out-degree 2 and in-degree 2 — constant degree, so
    * shuffle volume per iteration must scale with n.
    */
  private def ringEdges(n: Int) = {
    import spark.implicits._
    (0 until n).flatMap { i =>
      Seq((i.toLong, (i + 1L) % n, 2L), (i.toLong, (i + 7L) % n, 1L))
    }.toDF("src", "dst", "cnt")
  }

  test("bfs: frontier expansion visits each edge once per direction, not per level") {
    // path graph, seed at node 0 (the lexicographic min when labeled):
    // distances must be exact hop counts, and total shuffle volume must
    // track edges × O(1), not edges × levels² (re-expanding closed nodes)
    import spark.implicits._
    val n = 12
    val labeled = pathEdges(n).select(
      org.apache.spark.sql.functions.format_string("n%02d", $"src").as("src"),
      org.apache.spark.sql.functions.format_string("n%02d", $"dst").as("dst"))
    val dist = Graph.bfsOnEdges(labeled, maxHops = n).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist.size == n)
    (0 until n).foreach { i =>
      assert(dist(f"n$i%02d") == i.toLong, s"node $i at ${dist(f"n$i%02d")}")
    }
  }

  test("pagerank: per-iteration shuffle volume grows linearly with edges") {
    val n1 = 2000
    val r1 = shuffleRecords {
      Graph.pagerankOnEdges(ringEdges(n1), iters = 3).collect()
    }
    val r10 = shuffleRecords {
      Graph.pagerankOnEdges(ringEdges(n1 * 10), iters = 3).collect()
    }
    assert(r1 > 0 && r10 > 0)
    val ratio = r10.toDouble / r1.toDouble
    // linear in edges means ~10x records for 10x nodes at constant
    // degree; quadratic blowup (edge x edge or node x node joins)
    // would show ~100x. Allow generous slack for fixed per-job overhead.
    assert(ratio < 20.0,
      s"shuffle records grew ${ratio}x for 10x edges — super-linear data movement")
    assert(ratio > 4.0,
      s"shuffle records grew only ${ratio}x for 10x edges — the fixture " +
        "is not actually exercising data-proportional movement")
  }
}
