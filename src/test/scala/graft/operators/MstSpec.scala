package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Maximum spanning forest: the distributed Borůvka result must equal
  * a sequential Kruskal (union-find) under the same strict total edge
  * order — on a planted graph whose tree is known by hand, and on the
  * fixture's co-occurrence graph — and carry the forest invariant
  * |edges| = |V| − #components.
  */
class MstSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  /** Sequential Kruskal with the identical (w DESC, a, b) order. */
  private def kruskal(edges: Seq[(String, String, Long)])
      : Set[(String, String, Long)] = {
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set.empty[(String, String, Long)]
    for ((a, b, w) <- edges.sortBy { case (a, b, w) => (-w, a, b) }) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; out += ((a, b, w)) }
    }
    out.toSet
  }

  test("planted two-clusters-and-a-bridge graph yields the hand-known tree") {
    import spark.implicits._
    val edges = Seq(
      ("a", "b", 10L), ("a", "c", 9L), ("b", "c", 1L), // cluster 1
      ("x", "y", 8L), ("x", "z", 7L), ("y", "z", 2L), // cluster 2
      ("c", "x", 3L)) // bridge
    val got = Graph.maxSpanningForestOnEdges(
      edges.toDF("a", "b", "w")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = Set(("a", "b", 10L), ("a", "c", 9L), ("x", "y", 8L),
      ("x", "z", 7L), ("c", "x", 3L))
    assert(got == want)
  }

  test("fixture co-occurrence forest equals sequential Kruskal; forest invariant holds") {
    import spark.implicits._
    val und = Graph.undirectedWeighted(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val want = kruskal(und)
    val got = Graph.maxSpanningTree(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    // |edges| = |V| - #components
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSet
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    und.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    val comps = nodes.map(find).size
    assert(got.size == nodes.size - comps)
  }

  test("single-linkage clusters = components after cutting the k weakest forest edges") {
    import spark.implicits._
    val mst = Graph.maxSpanningTree(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(mst.length > Graph.SingleLinkCuts, "fixture forest too small")
    val cut = mst.sortBy { case (a, b, w) => (w, a, b) }
      .take(Graph.SingleLinkCuts).toSet
    val kept = mst.filterNot(cut)
    // sequential reference labels over kept edges
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    kept.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    val nodes = Graph.undirectedWeighted(spark, sf).collect()
      .flatMap(r => Seq(r.getString(0), r.getString(1))).toSet
    val want = nodes.groupBy(find).flatMap { case (_, ms) =>
      val lbl = ms.min; ms.map(_ -> lbl)
    }
    val slDf = Graph.singleLinkage(spark, sf)
    // plan gate (construction-run query, exempt from PlanLintSpec's
    // registry sweep): the cut must be TakeOrdered + anti-join — no
    // global rank window over the forest
    val undef = slDf.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(undef.isEmpty,
      "singleLinkage plans an undefined-partition window")
    val got = slDf.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == want)
    // cutting k forest edges adds exactly k components
    val fullComponents = nodes.size - mst.length
    assert(got.values.toSet.size == fullComponents + Graph.SingleLinkCuts)
  }
}
