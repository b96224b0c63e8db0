package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Invariants of the round-4 operators — the oracle gate proves
  * cross-engine equality; these pin the properties the operators exist
  * to deliver.
  */
class GraphLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("sssp: seed at 0, bounded by hop distance times cost range, same reach as bfs") {
    val bfs = Graph.bfs(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sssp = Graph.sssp(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sssp.keySet == bfs.keySet,
      "weighted relaxation must reach exactly the hop-bounded node set")
    val seed = bfs.minBy(_._2)._1
    assert(sssp(seed) == 0L && bfs(seed) == 0L)
    sssp.foreach { case (n, d) =>
      // per-edge cost ∈ {1,2,3}: the weighted distance is sandwiched by
      // the hop distance, though NOT necessarily along the same path —
      // a longer-hop path can be cheaper, hence only the lower bound
      // uses bfs and the upper bound uses 3 * hops of SOME path ≤ 3*bfs*…
      assert(d >= bfs(n), s"$n: weighted $d below hop count ${bfs(n)}")
      assert(d <= 3L * Graph.BfsHops, s"$n: weighted $d exceeds max possible")
    }
    // at least one node must be strictly cheaper via a longer path OR
    // have cost > hops (edge costs vary), else the fixture degenerated
    assert(sssp.exists { case (n, d) => d > bfs(n) },
      "all costs equal hop counts — weighted fixture degenerate")
  }

  test("sssp: bellman-ford relaxation is exact on a planted weighted graph") {
    import spark.implicits._
    // A--1--B--1--C  and A--5--C: the 2-hop path (cost 2) must beat the
    // direct edge (cost 5); D unreachable within hops from A is absent
    val edges = Seq(
      ("A", "B", 1L), ("B", "A", 1L),
      ("B", "C", 1L), ("C", "B", 1L),
      ("A", "C", 5L), ("C", "A", 5L)).toDF("src", "dst", "cost")
    val d = Graph.ssspOnEdges(edges, maxHops = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == Map("A" -> 0L, "B" -> 1L, "C" -> 2L))
  }

  test("pagerank mass stays bounded and ranks are strictly positive") {
    val rows = Graph.pagerank(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getDouble(1)).sum
    // leaky-dangling PR: total ≤ 1 (mass leaks at sinks), and every
    // node keeps at least its teleport share 0.15/n
    assert(total <= 1.0 + 1e-6, s"total=$total")
    val teleport = 0.15 / rows.length
    rows.foreach(r => assert(r.getDouble(1) >= teleport - 1e-9,
      s"${r.getString(0)} below teleport floor"))
  }

  test("pagerank concentrates mass on high-in-degree hubs") {
    val ranks = Graph.pagerank(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    import org.apache.spark.sql.functions._
    val inw = Graph.tokenEdges(spark, sf)
      .groupBy(col("dst")).agg(sum(col("cnt")).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val topIn = inw.toSeq.sortBy(-_._2).take(5).map(_._1)
    val botIn = inw.toSeq.sortBy(_._2).take(5).map(_._1)
    def mean(xs: Seq[String]) = xs.map(ranks).sum / xs.length
    // rank follows weighted in-flow, not raw in-degree, so individual
    // orderings can cross — but the group means must separate
    assert(mean(topIn) > mean(botIn),
      "mean rank of top-in-weight tokens should exceed bottom group's")
  }

  test("ivfpq inverted-file layout: probe reads prune to the probed cells' partitions") {
    import org.apache.spark.sql.functions.col
    val sf = graft.TestSpark.sf
    val df = Similarity.ivfPqLists(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // static partition pruning: the cell IN (...) predicate must reach
    // the scan as a PartitionFilter (unprobed cells' files never read)
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("cell")), s"no cell PartitionFilter:\n$pf")
    // and the result must cover every (query, probed cell) pair that
    // has at least one candidate — 10 queries × up to nProbe cells
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).distinct.length == 10)
    assert(rows.forall(_.getLong(2) > 0))
    val cells = rows.map(_.getInt(1)).distinct
    assert(cells.length <= 10 * Similarity.IvfNProbe)
  }

  test("z-order layout prunes at least as well as linear on a 2-D predicate") {
    val rows = Layout.layoutZorder(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val (nfZ, hitZ, scanZ) = rows("zorder")
    val (nfL, hitL, scanL) = rows("linear")
    assert(nfZ == 64 && nfL == 64)
    assert(hitZ <= hitL, s"zorder hit $hitZ files vs linear $hitL")
    assert(scanZ <= scanL, s"zorder scanned $scanZ rows vs linear $scanL")
    // and the pruning must be real, not vacuous: both layouts skip most files
    assert(hitZ < 64 && hitL < 64)
  }

  test("label propagation: disjoint cliques converge to their min labels") {
    import spark.implicits._
    // two triangles, no inter-edges; synchronous LPA with min-tie
    // collapses each to its lexicographically smallest member by round 3
    val edges = Seq(
      ("aa", "bb", 1L), ("bb", "cc", 1L), ("cc", "aa", 1L),
      ("xx", "yy", 1L), ("yy", "zz", 1L), ("zz", "xx", 1L))
      .toDF("src", "dst", "cnt")
    val out = Graph.labelPropOnEdges(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("aa" -> "aa", "bb" -> "aa", "cc" -> "aa",
      "xx" -> "xx", "yy" -> "xx", "zz" -> "xx"), out.toString)
  }

  test("label propagation on the fixture is deterministic and non-trivial") {
    val a = Graph.labelProp(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val b = Graph.labelProp(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a == b, "synchronous LPA must be run-to-run deterministic")
    val nComms = a.values.toSet.size
    assert(nComms >= 1 && nComms < a.size,
      s"labels must have propagated: $nComms communities over ${a.size} nodes")
  }

  test("range layout prunes a time-range scan; hash layout cannot") {
    val rows = Layout.layoutRangeSort(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val (nfR, hitR, scanR) = rows("range")
    val (nfH, hitH, scanH) = rows("hash")
    // value-proportional slots are all occupied; hash files are capped
    // by the fixture's distinct-user count (15 at sf0.001)
    assert(nfR == 64, s"range layout produced $nfR files")
    // the probe covers ~1/10 of the time span: range clustering confines
    // it to that fraction of the files (+ boundary slack)...
    assert(hitR <= 10, s"range layout hit $hitR of $nfR files")
    // ...while every user-hash file spans ~the full timeline — a pruning
    // reader eliminates NOTHING and scans the whole table
    assert(hitH == nfH, s"hash layout should hit all $nfH files, hit $hitH")
    val total = graft.Tables.events(spark, sf).count()
    assert(scanH == total, s"hash layout must scan the whole table ($total), scanned $scanH")
    assert(scanR < scanH, s"range scanned $scanR rows vs hash $scanH")
    // arrival layout exists and is a complete partitioning of the table
    val (nfA, _, _) = rows("arrival")
    assert(nfA == 64)
  }

  test("paragraph dedup retention is a valid profile and catches planted boilerplate") {
    val rows = Dedup.paragraphDedup(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept >= 0 && kept <= n)
      assert(math.abs(r.getDouble(3) - kept.toDouble / n) < 1e-12)
    }
    // the synthetic corpus repeats 10-token windows across documents, so
    // SOME chunk must be suppressed somewhere (else the query is vacuous)
    assert(rows.map(r => r.getLong(1) - r.getLong(2)).sum > 0)
  }

  test("canonical selection keeps exactly one representative per cluster") {
    val rows = Dedup.dedupCanonical(spark, sf).collect()
    val members = rows.map(_.getLong(1)).sum
    assert(members == 500) // every document belongs to exactly one cluster
    // keep_doc_id must be a member of its own cluster: spot the multi-doc
    // clusters and check the kept doc maps back to the same cluster id
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(clusters(r.getLong(2)) == r.getLong(0)))
  }

  test("compaction plan shrinks file counts, spares large files, fills bins near target") {
    val rows = Layout.layoutCompaction(spark, sf).collect()
    assert(rows.length == 20, s"one plan row per source, got ${rows.length}")
    val target = 2048L
    var sawLarge = false
    rows.foreach { r =>
      val (before, total, small, after, rewritten) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(after <= before, s"${r.getString(0)}: plan must never add files")
      assert(after < before || small <= 1,
        s"${r.getString(0)}: >1 small file must compact")
      assert(rewritten <= total)
      if (before > small) { sawLarge = true; assert(rewritten < total,
        s"${r.getString(0)}: large files must not be rewritten") }
      // next-fit: every bin except possibly the last holds >= target bytes
      val bins = after - (before - small)
      if (small > 0) assert(bins <= rewritten / target + 1,
        s"${r.getString(0)}: bins=$bins underfilled for $rewritten bytes")
    }
    assert(sawLarge, "fixture must exercise the large-file passthrough branch")
  }

  test("triangle census is exact on a known graph, independent of orientation skew") {
    import spark.implicits._
    // K4 on a–d (4 triangles) + pendant e–a (no new triangle) + a hub f
    // joined to a,b (closes 1 more via a–b) => 5 triangles. Duplicate
    // and reversed raw edges plus a self-loop must all be ignored.
    val raw = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("e", "a"), ("a", "e"), ("f", "a"), ("f", "b"),
      ("b", "a"), ("c", "c"))
      .toDF("src", "dst").withColumn("cnt", org.apache.spark.sql.functions.lit(1L))
    val r = Graph.trianglesOnEdges(raw).collect().head
    assert(r.getAs[Long]("n_nodes") == 6)
    assert(r.getAs[Long]("n_edges") == 9)   // K4=6 + ea + fa + fb
    assert(r.getAs[Long]("n_triangles") == 5)
    // wedges: deg a=5,b=4,c=3,d=3,e=1,f=2 -> 10+6+3+3+0+1 = 23
    assert(r.getAs[Long]("n_wedges") == 23)
    assert(math.abs(r.getAs[Double]("global_cc") - 15.0 / 23) < 1e-6)
  }

  test("neighbor jaccard: witness cap silences hubs, scores are exact below it") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two hubs each joined to the same 50 leaves: every leaf pair has
    // exactly the two hubs as common neighbors
    val edges = (0 until 50).flatMap(i => Seq((s"leaf_$i", "h1"), (s"leaf_$i", "h2")))
      .toDF("src", "dst").withColumn("cnt", lit(1L))
    val open = Graph.neighborSimilarityOnEdges(edges, maxDeg = 64).collect()
    assert(open.length == 30) // top-k of 1225 leaf pairs + the hub pair
    // ties all score 1.0; (h1, h2) sorts first — witnessed by 50 leaves
    val first = open.head
    assert((first.getAs[String]("a"), first.getAs[String]("b")) == ("h1", "h2"))
    assert(first.getAs[Long]("common") == 50L)
    open.foreach { r =>
      // leaf pairs: common=2 (both hubs), deg 2 each: 2/(2+2-2) = 1.0;
      // hub pair: 50/(50+50-50) = 1.0
      assert(math.abs(r.getAs[Double]("jaccard") - 1.0) < 1e-9)
    }
    // cap below the hub degree: hubs no longer witness, so every
    // leaf-leaf pair disappears; the (h1, h2) pair survives because its
    // WITNESSES are the deg-2 leaves — exactly the cap's semantics
    val capped = Graph.neighborSimilarityOnEdges(edges, maxDeg = 10).collect()
    assert(capped.length == 1)
    assert((capped.head.getAs[String]("a"), capped.head.getAs[String]("b")) == ("h1", "h2"))
    assert(capped.head.getAs[Long]("common") == 50L)
  }

  test("degree orientation bounds wedge work at the hub") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // star: hub h joined to 200 leaves, plus one leaf-leaf edge. A naive
    // wedge build at the hub would enumerate C(200,2); degree-ordering
    // must orient every star edge leaf->hub, leaving zero hub wedges.
    val star = (0 until 200).map(i => (s"leaf_$i", "h")) :+ ("leaf_0", "leaf_1")
    val raw = star.toDF("src", "dst").withColumn("cnt", lit(1L))
    val r = Graph.trianglesOnEdges(raw).collect().head
    assert(r.getAs[Long]("n_triangles") == 1)
    // the algorithm's wedge frame is internal; assert via the census
    // that the one triangle was found while the hub contributed no
    // out-pairs: every edge at h orients leaf->h (deg 200 vs <=2), so
    // out-degree(h)=0 and the only wedge is at leaf_0/leaf_1
    assert(r.getAs[Long]("n_edges") == 201)
  }

  test("kcore reaches a true fixpoint: every member keeps >= k in-core degree") {
    val core = Graph.kcore(spark, sf).collect()
    assert(core.nonEmpty, "fixture must have a non-empty 3-core")
    core.foreach { r =>
      assert(r.getAs[Long]("deg") >= Graph.KcoreK,
        s"${r.getString(0)}: deg ${r.getLong(1)} < ${Graph.KcoreK}")
    }
    // fixpoint: one more peel round removes nothing
    val again = Graph.kcoreOnEdges(Graph.tradeEdges(spark, sf),
      Graph.KcoreK, Graph.KcoreRounds + 1).collect()
    assert(again.map(_.getString(0)).sorted.sameElements(
      core.map(_.getString(0)).sorted))
  }

  test("kcore peel cascades along planted chains") {
    import spark.implicits._
    // K4 clique {a,b,c,d} with a 4-node tail d-e-f-g: the tail peels
    // one node per round (g first, then f, then e — degree drops to 1
    // only AFTER the outer node goes), so a one-shot degree filter
    // (deg >= 2) would wrongly keep e and f; the clique survives as the
    // whole 2-core
    val und = Seq(("a","b"),("a","c"),("a","d"),("b","c"),("b","d"),
      ("c","d"),("d","e"),("e","f"),("f","g"))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val core = Graph.kcoreOnEdges(edges, k = 2, rounds = 8).collect()
    assert(core.map(_.getString(0)).sorted.sameElements(
      Array("a", "b", "c", "d")))
    // fewer rounds than the cascade depth must NOT reach the fixpoint —
    // proves the fixture actually exercises iteration, not one filter
    val shallow = Graph.kcoreOnEdges(edges, k = 2, rounds = 1).collect()
    assert(shallow.length > 4, "1-round peel must still hold tail nodes")
  }

  test("adamic-adar: rare witnesses outrank hubs at equal common count") {
    import spark.implicits._
    // a-b share two degree-2 witnesses (score 2/ln2 = 2.885390);
    // c-d share two degree-6 hubs (score 2/ln6 = 1.116244). Jaccard
    // treats both pairs alike at common=2 — the weighting must not.
    val edges = Seq(
      ("a", "w1"), ("b", "w1"), ("a", "w2"), ("b", "w2"),
      ("c", "h1"), ("d", "h1"), ("e1", "h1"), ("e2", "h1"), ("e3", "h1"), ("e4", "h1"),
      ("c", "h2"), ("d", "h2"), ("e1", "h2"), ("e2", "h2"), ("e3", "h2"), ("e4", "h2")
    ).toDF("src", "dst").withColumn("cnt", org.apache.spark.sql.functions.lit(1L))
    val rows = Graph.adamicAdarOnEdges(edges).collect()
    // (h1,h2) share SIX degree-2 witnesses (c,d,e1..e4) and earn the
    // global top: 6/ln2
    val top = rows.head
    assert(top.getString(0) == "h1" && top.getString(1) == "h2")
    assert(top.getDouble(3) == 8.656170) // floor(1e6/ln2+0.5)*6/1e6
    val ab = rows.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    assert(ab.getDouble(3) == 2.885390) // floor(1e6/ln2+0.5)*2/1e6
    val cd = rows.find(r => r.getString(0) == "c" && r.getString(1) == "d").get
    assert(cd.getLong(2) == ab.getLong(2), "equal common-neighbor count")
    assert(cd.getDouble(3) < ab.getDouble(3), "hub witnesses must score lower")
  }

  test("local clustering: triangle corners score 1, bridge scores 1/3, pendants drop") {
    import spark.implicits._
    // a-b-c triangle, d pendant on a: lcc(b)=lcc(c)=1 (closed ego-net),
    // lcc(a)=2*1/(3*2)=1/3 (d breaks a's neighborhood), deg(d)=1 excluded
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"))
      .toDF("src", "dst").withColumn("cnt", org.apache.spark.sql.functions.lit(1L))
    val got = Graph.localClusteringOnEdges(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(!got.contains("d"))
    assert(got("b") == ((2L, 1L, 1.0)) && got("c") == ((2L, 1L, 1.0)))
    assert(got("a") == ((3L, 1L, 0.333333)))
  }

  test("assortativity: star is perfectly disassortative, regular graph is undefined") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val star = Seq(("c", "l1"), ("c", "l2"), ("c", "l3"))
      .toDF("src", "dst").withColumn("cnt", lit(1L))
    val rStar = Graph.assortativityOnEdges(star).collect().head
    assert(rStar.getLong(0) == 3L)
    assert(rStar.getDouble(1) == -1.0)
    // triangle: every degree is 2 -> zero variance -> NULL, not NaN
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c"))
      .toDF("src", "dst").withColumn("cnt", lit(1L))
    assert(Graph.assortativityOnEdges(tri).collect().head.isNullAt(1))
  }

  test("modularity: two perfect first-letter cliques score 1/2, mixed graph scores lower") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // two triangles whose nodes share first letters -> all 6 edges
    // intra, d_a = d_b = 6: Q = 1 - 2*36/(4*36) = 0.5 (the max for 2
    // equal communities)
    val cliques = Seq(("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
      ("b1", "b2"), ("b2", "b3"), ("b1", "b3"))
      .toDF("src", "dst").withColumn("cnt", lit(1L))
    val q = Graph.modularityOnEdges(cliques).collect().head
    assert(q.getLong(0) == 6L && q.getLong(1) == 6L && q.getLong(2) == 2L)
    assert(q.getDouble(3) == 0.5)
    // rewire one edge across communities: intra drops, Q must drop
    val mixed = Seq(("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
      ("b1", "b2"), ("b2", "b3"), ("b1", "a3"))
      .toDF("src", "dst").withColumn("cnt", lit(1L))
    assert(Graph.modularityOnEdges(mixed).collect().head.getDouble(3) < 0.5)
  }

  test("rendezvous sharding: moves only to the new shard, ~1/(N+1) mass; mod moves far more") {
    import spark.implicits._
    val out = Layout.layoutRendezvous(spark, sf).localCheckpoint()
    val rows = out.collect()
    assert(rows.map(_.getLong(0)).toSet == (0L until Layout.HrwShards).toSet,
      "every old shard must appear")
    // the HRW guarantee: a key never moves to a pre-existing shard
    assert(rows.map(_.getLong(3)).sum == 0L, "hrw_moved_elsewhere must be 0")
    val n = rows.map(_.getLong(1)).sum
    val hrw = rows.map(_.getLong(2)).sum
    val mod = rows.map(_.getLong(4)).sum
    val frac = hrw.toDouble / n
    assert(frac > 0.02 && frac < 0.12,
      s"hrw moved fraction $frac should concentrate near 1/17 = 0.059")
    assert(mod > 5L * hrw,
      s"mod-hash must move far more than hrw ($mod vs $hrw)")
  }

  test("hilbert layout prunes at least as well as linear and tracks zorder") {
    val rows = Layout.layoutHilbert(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val (nfH, hitH, scanH) = rows("hilbert")
    val (_, hitL, scanL) = rows("linear")
    val (_, hitZ, scanZ) = rows("zorder")
    assert(nfH == 64)
    assert(hitH <= hitL, s"hilbert hit $hitH files vs linear $hitL")
    assert(scanH <= scanL, s"hilbert scanned $scanH rows vs linear $scanL")
    // the better-locality curve may tie z-order at coarse file counts
    // but must never lose to it on the fixture predicate
    assert(hitH <= hitZ, s"hilbert hit $hitH files vs zorder $hitZ")
    assert(scanH <= scanZ, s"hilbert scanned $scanH vs zorder $scanZ")
    assert(hitH < 64 && hitL < 64)
  }
}
