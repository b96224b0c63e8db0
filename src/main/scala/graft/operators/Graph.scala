package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Link-analysis operators over graphs DERIVED from the corpus — the
  * quality-weighting signal family a web-scale training-data pipeline
  * computes over its domain/link graph (PageRank-style centrality is a
  * standard crawl-quality prior). The test corpus has no explicit link
  * table, so the graph here is the token-transition digraph (an edge
  * u→v with weight = how often token v follows token u anywhere in the
  * corpus); the operator itself is graph-generic: any (src, dst, cnt)
  * edge list plugs in.
  *
  * Scale design (Pregel-on-DataFrames):
  *   - The edge list is built once, aggregated (one shuffle), and
  *     checkpointed; per-iteration work is one hash join (ranks ⋈ edges
  *     on src) + one partial-aggregating shuffle on dst. Rank state is
  *     O(nodes), never collected to the driver.
  *   - Contributions are summed as DECIMAL(18,9) after a 9-dp round:
  *     decimal addition is associative, so the result is independent of
  *     partition order AND engine — that is what makes an ITERATIVE
  *     double-arithmetic pipeline exactly oracle-checkable (the same
  *     trick as the centroid means; a raw double sum would drift by
  *     ulps per iteration and diverge by round 10).
  *   - `localCheckpoint` per iteration truncates lineage (the standard
  *     iterative-DataFrame shape, same as [[Dedup.connectedComponents]]).
  *   - Fixed iteration count (10): deterministic cost, no convergence
  *     action on the critical path; production runs pick iterations by
  *     graph diameter, not residual polling.
  */
object Graph {

  val Iters = 10
  /** Lineage-truncation cadence for the lazy iteration chain. */
  val CkptEvery = 5

  /** Token-transition edge list: (src, dst, cnt). One explode + one
    * aggregation; at 100 TB the explode is narrow (no shuffle) and the
    * aggregate map-side combines to O(vocab²) keys max.
    */
  def tokenEdges(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .selectExpr(s"${TextOps.tokensExpr} AS toks")
      .where("size(toks) >= 2")
      .selectExpr(
        """explode(transform(sequence(1, size(toks) - 1),
          |  i -> struct(toks[i-1] AS src, toks[i] AS dst))) AS e""".stripMargin)
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
  }

  /** Weighted PageRank over the token-transition graph, 10 fixed
    * iterations, damping 0.85, "leaky" dangling handling (nodes with no
    * out-edges leak their mass — both engines implement the identical
    * recurrence, which is the checked contract):
    *
    *   r₀(v)    = 1/n
    *   rₜ₊₁(v) = round(0.15/n + 0.85 · Σ_{u→v} round(rₜ(u)·w_uv, 9), 9)
    *   w_uv     = cnt(u,v) / out_cnt(u)   (double division)
    */
  def pagerank(s: SparkSession, dir: String): DataFrame =
    pagerankOnEdges(tokenEdges(s, dir))

  /** Graph-generic core: any (src, dst, cnt) edge list plugs in (the
    * scale-growth spec drives it with synthetic graphs at 1× and 10×).
    */
  def pagerankOnEdges(rawEdges: DataFrame, iters: Int = Iters): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val edges = rawEdges.localCheckpoint()
    val outW = edges.groupBy($"src").agg(sum($"cnt").as("oc"))
    val weighted = edges.join(outW, "src")
      .select($"src", $"dst",
        ($"cnt".cast("double") / $"oc".cast("double")).as("w"))
      .localCheckpoint()
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst")).distinct().localCheckpoint()
    val n = nodes.count()
    var ranks = nodes.select($"node", lit(1.0 / n).as("rank"))
    // the iteration count is FIXED (no convergence action), so the loop
    // can stay LAZY: one 10-iteration plan, one job at materialization
    // — vs a per-iteration localCheckpoint, which costs 10 sequential
    // tiny jobs (measured ~3 s at sf0.1, mostly scheduling). The inputs
    // (edges/weights/nodes) ARE checkpointed above, so the deep plan
    // bottoms out in pinned blocks; checkpoint every `CkptEvery` rounds
    // only to bound analysis depth on much larger iteration budgets.
    for (i <- 1 to iters) {
      val contribs = weighted.join(ranks, $"src" === $"node")
        .select($"dst",
          round($"rank" * $"w", 9).cast("decimal(18,9)").as("c"))
        .groupBy($"dst").agg(sum($"c").as("csum"))
      ranks = nodes.join(contribs, $"node" === $"dst", "left_outer")
        .select($"node",
          round(lit(0.15 / n) +
            lit(0.85) * coalesce($"csum".cast("double"), lit(0.0)), 9)
            .as("rank"))
      if (i % CkptEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select($"node", $"rank")
  }

  /** Directed token-transition edge CTEs (toks + edges) — the shared
    * DuckDB restatement of [[tokenEdges]].
    */
  private[operators] val tokenEdgesCtes: String =
    s"""toks AS (
       |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
       |edges AS (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT
       |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
       |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
       |    FROM toks WHERE len(t) >= 2)
       |  GROUP BY src, dst)""".stripMargin

  /** DuckDB restatement of [[pagerankOnEdges]] over any `edges`
    * (src, dst, cnt) CTE chain: the 10 iterations unrolled as chained
    * CTEs (recursive CTEs disallow aggregates in the recursive term,
    * and unrolling keeps the recurrence literally identical).
    * `finalize` is the terminal SELECT over `r$Iters` — a parameter
    * (not post-hoc string surgery) so derived oracles like
    * [[textrankSql]] can't silently lose their projection when this
    * template changes.
    */
  private[operators] def pagerankSqlOver(edgesCtes: String,
      finalize: String = s"SELECT node, rank FROM r$Iters"): String = {
    val base =
      s"""WITH $edgesCtes,
         |outw AS (SELECT src, sum(cnt) AS oc FROM edges GROUP BY src),
         |w AS (
         |  SELECT e.src, e.dst, CAST(e.cnt AS DOUBLE) / CAST(o.oc AS DOUBLE) AS w
         |  FROM edges e JOIN outw o ON e.src = o.src),
         |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (
         |  SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank
         |  FROM nodes)""".stripMargin
    val iters = (1 to Iters).map { i =>
      s"""r$i AS (
         |  SELECT nd.node,
         |    round(CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
         |      + CAST(0.85 AS DOUBLE)
         |        * coalesce(CAST(s.csum AS DOUBLE), CAST(0 AS DOUBLE)), 9) AS rank
         |  FROM nodes nd LEFT JOIN (
         |    SELECT w.dst, sum(CAST(round(r.rank * w.w, 9) AS DECIMAL(18,9))) AS csum
         |    FROM w JOIN r${i - 1} r ON w.src = r.node GROUP BY w.dst) s
         |    ON nd.node = s.dst)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$iters\n$finalize"
  }

  val pagerankSql: String = pagerankSqlOver(tokenEdgesCtes)

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank on
    * the UNDIRECTED token co-occurrence graph (adjacent-token window,
    * symmetrized by summing both directions), top 20 words by rank —
    * the unsupervised corpus-keyword readout that needs no training
    * data, as pure composition over [[pagerankOnEdges]]. Ordering is
    * total (rank DESC, then word) so the truncation is engine-stable;
    * ranks are the 9-dp decimal-summed values the pagerank contract
    * already makes engine-exact.
    *
    * Scale: the symmetrize is a union + re-aggregate of the O(vocab²)
    * edge list (map-side combinable, no extra corpus scan); everything
    * else is the pagerank plan.
    */
  def textrank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = tokenEdges(s, dir)
    val sym = e.select($"src", $"dst", $"cnt")
      .union(e.select($"dst".as("src"), $"src".as("dst"), $"cnt"))
      .groupBy($"src", $"dst").agg(sum($"cnt").as("cnt"))
    pagerankOnEdges(sym)
      .orderBy(desc("rank"), $"node")
      .limit(20)
      .select($"node".as("word"), $"rank".as("textrank"))
  }

  val textrankSql: String = {
    // the iteration CTEs consume `edges`; here that must be the
    // symmetrized list, so the directed build is named edges0
    val symCtes =
      s"""toks AS (
         |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
         |edges0 AS (
         |  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT
         |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
         |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
         |    FROM toks WHERE len(t) >= 2)
         |  GROUP BY src, dst),
         |edges AS (
         |  SELECT src, dst, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
         |    SELECT src, dst, cnt FROM edges0
         |    UNION ALL
         |    SELECT dst AS src, src AS dst, cnt FROM edges0)
         |  GROUP BY src, dst)""".stripMargin
    pagerankSqlOver(symCtes,
      s"SELECT node AS word, rank AS textrank FROM r$Iters " +
        "ORDER BY rank DESC, node LIMIT 20")
  }

  /** HITS hubs & authorities — the second classic link-analysis
    * recurrence (PageRank above scores global centrality; HITS scores
    * the DUAL roles: a good hub points at good authorities, a good
    * authority is pointed at by good hubs — the directory-vs-content
    * distinction on a web/citation graph):
    *
    *   aₜ(v) = Σ_{u→v} hₜ₋₁(u)   then L1-normalize, round 9
    *   hₜ(v) = Σ_{v→w} aₜ(w)     then L1-normalize, round 9
    *
    * (Classic HITS normalizes L2; the L1 contract keeps every total an
    * associative DECIMAL sum, which is what lets five chained
    * iterations stay bit-equal to the unrolled oracle — same rationale
    * as the pagerank decimal trick. Rankings are unaffected by the
    * norm choice.) Per iteration: two join+partial-agg shuffles on the
    * edge keys, rank state O(nodes) — the Pregel-on-DataFrames shape.
    */
  val HitsIters = 5

  def hits(s: SparkSession, dir: String): DataFrame =
    hitsOnEdges(tokenEdges(s, dir))

  def hitsOnEdges(rawEdges: DataFrame, iters: Int = HitsIters): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val edges = rawEdges.select($"src", $"dst").distinct().localCheckpoint()
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst")).distinct().localCheckpoint()
    val n = nodes.count()
    var scores = nodes.select($"node",
      lit(1.0 / n).as("hub"), lit(1.0 / n).as("auth"))
    def l1Normalized(df: DataFrame, c: String): DataFrame = {
      val tot = df.agg(
        sum(round(col(c), 9).cast("decimal(18,9)")).as("tot"))
      df.crossJoin(broadcast(tot))
        .withColumn(c,
          round(col(c) / col("tot").cast("double"), 9))
        .drop("tot")
    }
    // EAGER localCheckpoint per normalization — deliberately NOT the
    // lazy pagerank chain: authN is consumed TWICE per iteration (the
    // output join and the hub recurrence), so an unmaterialized chain
    // re-evaluates the doubled subtree per level — measured 9.6 s lazy
    // vs 4.2 s checkpointed at sf0.1 (pagerank's rank frame is consumed
    // once per level, which is why lazy wins there).
    for (i <- 1 to iters) {
      val auth = nodes.join(
        edges.join(scores.select($"node", $"hub"), $"src" === $"node")
          .select($"dst", round($"hub", 9).cast("decimal(18,9)").as("c"))
          .groupBy($"dst").agg(sum($"c").as("araw")),
        $"node" === $"dst", "left_outer")
        .select($"node",
          coalesce($"araw".cast("double"), lit(0.0)).as("auth"))
      val authN = l1Normalized(auth, "auth").localCheckpoint()
      val hub = nodes.join(
        edges.join(authN.select($"node".as("an"), $"auth"), $"dst" === $"an")
          .select($"src", round($"auth", 9).cast("decimal(18,9)").as("c"))
          .groupBy($"src").agg(sum($"c").as("hraw")),
        $"node" === $"src", "left_outer")
        .select($"node",
          coalesce($"hraw".cast("double"), lit(0.0)).as("hub"))
      val hubN = l1Normalized(hub, "hub").localCheckpoint()
      scores = hubN.join(authN.withColumnRenamed("node", "n2"),
        $"node" === $"n2")
        .select($"node", $"hub", $"auth")
    }
    scores
  }

  /** DuckDB restatement: iterations unrolled, each normalization the
    * same decimal-sum → double division → round 9.
    */
  val hitsSql: String = {
    val base =
      s"""WITH toks AS MATERIALIZED (
         |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
         |edges AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT
         |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
         |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
         |    FROM toks WHERE len(t) >= 2)),
         |nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
         |s0 AS (
         |  SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS hub,
         |    CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS auth
         |  FROM nodes)""".stripMargin
    val iters = (1 to HitsIters).map { i =>
      val p = i - 1
      s"""ar$i AS MATERIALIZED (
         |  SELECT nd.node,
         |    coalesce(CAST(x.araw AS DOUBLE), CAST(0 AS DOUBLE)) AS auth
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst, sum(CAST(round(s.hub, 9) AS DECIMAL(18,9))) AS araw
         |    FROM edges e JOIN s$p s ON e.src = s.node GROUP BY e.dst) x
         |    ON nd.node = x.dst),
         |at$i AS (
         |  SELECT CAST(sum(CAST(round(auth, 9) AS DECIMAL(18,9))) AS DOUBLE)
         |    AS tot FROM ar$i),
         |an$i AS MATERIALIZED (
         |  SELECT node, round(auth / (SELECT tot FROM at$i), 9) AS auth
         |  FROM ar$i),
         |hr$i AS MATERIALIZED (
         |  SELECT nd.node,
         |    coalesce(CAST(x.hraw AS DOUBLE), CAST(0 AS DOUBLE)) AS hub
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.src, sum(CAST(round(a.auth, 9) AS DECIMAL(18,9))) AS hraw
         |    FROM edges e JOIN an$i a ON e.dst = a.node GROUP BY e.src) x
         |    ON nd.node = x.src),
         |ht$i AS (
         |  SELECT CAST(sum(CAST(round(hub, 9) AS DECIMAL(18,9))) AS DOUBLE)
         |    AS tot FROM hr$i),
         |s$i AS MATERIALIZED (
         |  SELECT h.node, round(h.hub / (SELECT tot FROM ht$i), 9) AS hub,
         |    a.auth
         |  FROM hr$i h JOIN an$i a ON a.node = h.node)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$iters\nSELECT node, hub, auth FROM s$HitsIters"
  }

  /** Triangle census + global clustering coefficient over the
    * (undirected) token-transition graph — the standard graph-quality
    * summary (community density / spam-farm signal on a link graph).
    *
    * Algorithm: DEGREE-ORDERED wedge counting, the MapReduce-era
    * standard for skewed graphs (Suri & Vassilvitskii's "Counting
    * triangles and the curse of the last reducer"). Each undirected
    * edge is oriented from its (degree, node)-smaller endpoint to the
    * larger; wedges are built only on OUT-neighbor pairs, so a
    * celebrity node of degree d contributes wedges at its LOW-degree
    * neighbors, never d² at itself — out-degree under this orientation
    * is O(√m), which is what keeps the wedge join bounded on a
    * power-law degree distribution at 100 TB. Each triangle is counted
    * exactly once (its order-smallest vertex owns the wedge).
    *
    * Plan shape: one distinct (canonical-edge shuffle), one degree
    * aggregate, the wedge self-join on src (one exchange, reused by
    * both sides), one (b,c)-keyed close join, then three 1-row
    * aggregates combined by the approved 1-row broadcast pattern.
    */
  def triangles(s: SparkSession, dir: String): DataFrame =
    trianglesOnEdges(tokenEdges(s, dir))

  /** Graph-generic core: any (src, dst, *) edge list plugs in. */
  def trianglesOnEdges(rawEdges: DataFrame): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val und = rawEdges.where($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
      .localCheckpoint() // reused by degrees, orientation, and the close
    val deg = und.select($"u".as("node")).union(und.select($"v"))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select($"node".as("u"), $"deg".as("du")), "u")
      .join(deg.select($"node".as("v"), $"deg".as("dv")), "v")
    // total order on vertices: (degree, name) — ties broken by name so
    // the orientation is a strict order and every edge orients uniquely
    val uFirst = struct($"du", $"u") < struct($"dv", $"v")
    val oriented = withDeg.select(
      when(uFirst, $"u").otherwise($"v").as("src"),
      when(uFirst, $"v").otherwise($"u").as("dst"),
      when(uFirst, struct($"dv".as("d"), $"v".as("n")))
        .otherwise(struct($"du".as("d"), $"u".as("n"))).as("dk"))
      .localCheckpoint() // both wedge sides + the close probe
    val wedges = oriented.select($"src", $"dst".as("b"), $"dk".as("bk"))
      .join(oriented.select($"src", $"dst".as("c"), $"dk".as("ck")), "src")
      .where($"bk" < $"ck")
      .select($"b", $"c")
    val tri = wedges
      .join(oriented.select($"src".as("b"), $"dst".as("c")), Seq("b", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    val degStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(degStats))
      .crossJoin(broadcast(tri))
      .select($"n_nodes", $"n_edges", $"n_wedges", $"n_triangles",
        round(lit(3.0) * $"n_triangles" / $"n_wedges", 6).as("global_cc"))
  }

  /** DuckDB restatement: the simpler name-ordered u<v<w join counts the
    * same triangles (orientation scheme changes the join sizes, never
    * the census), which is exactly why it is safe as the oracle.
    */
  val trianglesSql: String =
    s"""WITH toks AS (
       |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
       |tedges AS (
       |  SELECT src, dst FROM (
       |    SELECT
       |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
       |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
       |    FROM toks WHERE len(t) >= 2)
       |  GROUP BY src, dst),
       |und AS (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM tedges WHERE src <> dst),
       |deg AS (
       |  SELECT node, count(*) AS deg FROM (
       |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
       |  GROUP BY node),
       |tri AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
       |  FROM und e1
       |  JOIN und e2 ON e2.u = e1.u AND e1.v < e2.v
       |  JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v),
       |ds AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |    CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
       |  FROM deg),
       |es AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und)
       |SELECT n_nodes, n_edges, n_wedges, n_triangles,
       |  round(CAST(3 AS DOUBLE) * n_triangles / n_wedges, 6) AS global_cc
       |FROM es CROSS JOIN ds CROSS JOIN tri""".stripMargin

  /** Neighbor-overlap similarity (co-occurrence / co-citation Jaccard)
    * — the "related items" measure over any graph: two nodes are
    * similar when their neighborhoods overlap. Exact all-pairs overlap
    * is the d²-per-node wedge enumeration, so the operator's declared
    * contract caps the WITNESS role: only nodes of degree ≤ maxDeg
    * generate neighbor pairs. That is the graph analog of stopword
    * removal — an ultra-hub connected to everything witnesses nothing
    * about relatedness while costing d² — and it is what bounds the
    * wedge join at any scale (work per witness ≤ maxDeg²). Degrees in
    * the Jaccard denominator stay UNcapped, so scores are conservative
    * (never inflated) under the cap; the oracle restates the identical
    * capped semantics.
    */
  def neighborSimilarity(s: SparkSession, dir: String): DataFrame =
    neighborSimilarityOnEdges(tokenEdges(s, dir))

  val MaxWitnessDeg = 1024

  def neighborSimilarityOnEdges(rawEdges: DataFrame,
      maxDeg: Int = MaxWitnessDeg): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val und = rawEdges.where($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
      .localCheckpoint()
    val deg = und.select($"u".as("node")).union(und.select($"v"))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
    // adjacency rows (witness, neighbor), witness capped
    val adj = und.select($"u".as("w"), $"v".as("n"))
      .union(und.select($"v".as("w"), $"u".as("n")))
      .join(deg.select($"node".as("w"), $"deg".as("wdeg")), "w")
      .where($"wdeg" <= maxDeg)
      .select($"w", $"n")
    val commons = adj.select($"w", $"n".as("a"))
      .join(adj.select($"w", $"n".as("b")), "w")
      .where($"a" < $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("common"))
    commons
      .join(deg.select($"node".as("a"), $"deg".as("da")), "a")
      .join(deg.select($"node".as("b"), $"deg".as("db")), "b")
      .where($"common" >= 2)
      .select($"a", $"b", $"common",
        round($"common".cast("double") / ($"da" + $"db" - $"common"), 6)
          .as("jaccard"))
      .orderBy($"jaccard".desc, $"a", $"b")
      .limit(30)
  }

  val neighborSimilaritySql: String =
    s"""WITH toks AS (
       |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
       |tedges AS (
       |  SELECT src, dst FROM (
       |    SELECT
       |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
       |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
       |    FROM toks WHERE len(t) >= 2)
       |  GROUP BY src, dst),
       |und AS (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM tedges WHERE src <> dst),
       |deg AS (
       |  SELECT node, count(*) AS deg FROM (
       |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
       |  GROUP BY node),
       |adj AS (
       |  SELECT x.w, x.n FROM (
       |    SELECT u AS w, v AS n FROM und
       |    UNION ALL SELECT v, u FROM und) x
       |  JOIN deg d ON d.node = x.w WHERE d.deg <= $MaxWitnessDeg),
       |commons AS (
       |  SELECT l.n AS a, r.n AS b, CAST(count(*) AS BIGINT) AS common
       |  FROM adj l JOIN adj r ON l.w = r.w AND l.n < r.n
       |  GROUP BY 1, 2)
       |SELECT c.a, c.b, c.common,
       |  round(CAST(c.common AS DOUBLE) / (da.deg + db.deg - c.common), 6)
       |    AS jaccard
       |FROM commons c
       |JOIN deg da ON da.node = c.a
       |JOIN deg db ON db.node = c.b
       |WHERE c.common >= 2
       |ORDER BY jaccard DESC, a, b
       |LIMIT 30""".stripMargin

  /** Bounded-hop BFS shortest paths — the reachability/distance
    * primitive (supply-chain blast radius, account-linking rings,
    * contamination spread). The graph is the customer↔supplier trade
    * bipartite graph thinned to high-quantity lineitems: unlike the
    * 31-token transition graph (diameter ~2 — every node a hub
    * neighbor), this one has measured eccentricity ≥ 6 at both driver
    * SFs, so every iteration actually moves the frontier.
    *
    * Frontier-only expansion: level h joins ONLY rows at dist h-1
    * against the edge list (keyed on src), then folds into the visited
    * set with a min-aggregate — the Pregel BFS shape. Each level's
    * frame is doubly consumed (filter-join + union), so levels are
    * eagerly localCheckpoint'ed like HITS (the lazy chain would
    * re-evaluate the doubled subtree per level). Per-level cost is one
    * |frontier|-row join + one |visited| min-agg; at 100 TB the edge
    * list partitioning on src is reused across all levels.
    *
    * Oracle: DuckDB recursive CTE (UNION-dedup'd (node, d) walk,
    * d < maxHops) with min(d) per node — an independent formulation of
    * the same bounded-hop distances.
    */
  val BfsHops = 6
  val BfsMinQty = 48

  def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val trade = Tables.lineitem(s, dir)
      .where($"l_quantity" >= BfsMinQty)
      .select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select(concat(lit("C"), $"o_custkey".cast("string")).as("c"),
        concat(lit("S"), $"l_suppkey".cast("string")).as("s"))
      .distinct()
    trade.select($"c".as("src"), $"s".as("dst"))
      .union(trade.select($"s", $"c")).distinct()
  }

  def bfs(s: SparkSession, dir: String): DataFrame =
    bfsOnEdges(tradeEdges(s, dir), BfsHops)

  /** Graph-generic core: any (src, dst) edge list plugs in; seed is the
    * lexicographic min source node (deterministic on both engines).
    */
  def bfsOnEdges(rawEdges: DataFrame, maxHops: Int = BfsHops): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val edges = rawEdges.select($"src", $"dst").localCheckpoint()
    val seed = edges.agg(min($"src").as("node"))
    var dist = seed.select($"node", lit(0L).as("dist")).localCheckpoint()
    for (h <- 1 to maxHops) {
      val next = dist.where($"dist" === (h - 1))
        .join(edges, $"node" === $"src")
        .select($"dst".as("node"), lit(h.toLong).as("dist"))
      dist = dist.union(next)
        .groupBy($"node").agg(min($"dist").as("dist"))
        .localCheckpoint()
    }
    dist.select($"node", $"dist")
  }

  val bfsSql: String =
    s"""WITH RECURSIVE trade AS (
       |  SELECT DISTINCT 'C' || o_custkey AS c, 'S' || l_suppkey AS s
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_quantity >= $BfsMinQty),
       |e AS (
       |  SELECT c AS src, s AS dst FROM trade
       |  UNION
       |  SELECT s, c FROM trade),
       |seed AS (SELECT min(src) AS node FROM e),
       |w AS (
       |  SELECT node, 0 AS d FROM seed
       |  UNION
       |  SELECT e.dst AS node, w.d + 1 AS d
       |  FROM w JOIN e ON e.src = w.node WHERE w.d < $BfsHops)
       |SELECT node, CAST(min(d) AS BIGINT) AS dist
       |FROM w GROUP BY node""".stripMargin

  /** k-core decomposition (fixed k): iteratively peel nodes whose
    * degree among SURVIVORS drops below k until fixpoint — the standard
    * corpus/graph-cleaning primitive (spam rings and isolated tendrils
    * fall out; the dense interaction core remains). Peeling cascades:
    * removing a node can drop a neighbor below k, so the loop re-derives
    * degrees among survivors each round — one edges⋈survivors⋈survivors
    * hash join + one count aggregate per round, the edge list
    * partitioned once on src and reused every round (the BFS idiom).
    * Rounds are eagerly localCheckpoint'ed because each round's
    * survivor frame is consumed twice (both join sides — the HITS
    * doubly-consumed rationale). `KcoreRounds` = 8 is a fixpoint bound
    * for this graph, not a truncation: both driver SFs reach fixpoint
    * in ≤ 3 rounds (KcoreSpec asserts the last round removes nothing
    * and every member keeps ≥ k in-core neighbors), and extra rounds
    * are idempotent, so the 8-round unrolled oracle computes the same
    * core. At 100 TB the peel is O(rounds) shuffles on a shrinking
    * node set — the shape that matters is that no round ever touches
    * more than the surviving edges.
    *
    * Output: core members with their in-core degree.
    */
  val KcoreK = 3
  val KcoreRounds = 8

  def kcore(s: SparkSession, dir: String): DataFrame =
    kcoreOnEdges(tradeEdges(s, dir), KcoreK, KcoreRounds)

  /** Graph-generic core: any symmetrized (src, dst) edge list plugs in. */
  def kcoreOnEdges(rawEdges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val edges = rawEdges.select($"src", $"dst").distinct().localCheckpoint()
    var surv = edges.select($"src".as("node")).distinct().localCheckpoint()
    for (_ <- 1 to rounds) {
      surv = edges
        .join(surv.select($"node".as("_a")), $"src" === $"_a")
        .join(surv.select($"node".as("_b")), $"dst" === $"_b")
        .groupBy($"src").agg(count(lit(1)).as("deg"))
        .where($"deg" >= k)
        .select($"src".as("node"))
        .localCheckpoint()
    }
    edges
      .join(surv.select($"node".as("_a")), $"src" === $"_a")
      .join(surv.select($"node".as("_b")), $"dst" === $"_b")
      .groupBy($"src")
      .agg(count(lit(1)).as("deg"))
      .select($"src".as("node"), $"deg")
  }

  val kcoreSql: String = {
    val header =
      s"""WITH trade AS (
         |  SELECT DISTINCT 'C' || o_custkey AS c, 'S' || l_suppkey AS s
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE l_quantity >= $BfsMinQty),
         |e AS (
         |  SELECT c AS src, s AS dst FROM trade
         |  UNION
         |  SELECT s, c FROM trade),
         |n0 AS (SELECT DISTINCT src AS node FROM e)""".stripMargin
    val stages = (1 to KcoreRounds).map { i =>
      s"""n$i AS (
         |  SELECT e.src AS node FROM e
         |  JOIN n${i - 1} a ON e.src = a.node
         |  JOIN n${i - 1} b ON e.dst = b.node
         |  GROUP BY e.src HAVING count(*) >= $KcoreK)""".stripMargin
    }.mkString(",\n")
    s"""$header,
       |$stages
       |SELECT e.src AS node, CAST(count(*) AS BIGINT) AS deg
       |FROM e
       |JOIN n$KcoreRounds a ON e.src = a.node
       |JOIN n$KcoreRounds b ON e.dst = b.node
       |GROUP BY e.src""".stripMargin
  }

  /** Adamic–Adar link prediction — [[neighborSimilarity]]'s weighted
    * sibling: a shared neighbor contributes 1/ln(deg(witness)) instead
    * of 1, so rare witnesses count more (sharing an obscure
    * acquaintance predicts a link; sharing a celebrity predicts
    * nothing). Same capped-witness wedge join bounds the work (per
    * witness ≤ maxDeg² pairs); witnesses of degree 1 generate no pairs,
    * so ln(deg) ≥ ln 2 and the reciprocal never divides by zero. Each
    * witness's contribution is pinned to integer micro-units
    * (floor(1e6/ln(deg) + 0.5) — the identical IEEE sequence in both
    * engines), summed as exact longs; the one double division happens
    * on the 30 output rows. Degrees and the common count ride along
    * uncapped, so the score is conservative under the cap exactly as
    * the Jaccard form is.
    */
  def adamicAdar(s: SparkSession, dir: String): DataFrame =
    adamicAdarOnEdges(tokenEdges(s, dir))

  def adamicAdarOnEdges(rawEdges: DataFrame,
      maxDeg: Int = MaxWitnessDeg): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val und = rawEdges.where($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
      .localCheckpoint()
    val deg = und.select($"u".as("node")).union(und.select($"v"))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
    val adj = und.select($"u".as("w"), $"v".as("n"))
      .union(und.select($"v".as("w"), $"u".as("n")))
      .join(deg.select($"node".as("w"), $"deg".as("wdeg")), "w")
      .where($"wdeg" <= maxDeg)
      .selectExpr("w", "n",
        "CAST(floor(1e6 / ln(CAST(wdeg AS DOUBLE)) + 0.5) AS BIGINT) AS wt")
    val pairs = adj.select($"w", $"n".as("a"), $"wt")
      .join(adj.select($"w", $"n".as("b")), "w")
      .where($"a" < $"b")
      .groupBy($"a", $"b")
      .agg(count(lit(1)).as("common"), sum($"wt").as("aa_micro"))
    pairs
      .where($"common" >= 2)
      .selectExpr("a", "b", "common",
        "CAST(aa_micro AS DOUBLE) / 1e6 AS adamic_adar")
      .orderBy($"adamic_adar".desc, $"a", $"b")
      .limit(30)
  }

  val adamicAdarSql: String =
    s"""WITH toks AS (
       |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
       |tedges AS (
       |  SELECT src, dst FROM (
       |    SELECT
       |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
       |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
       |    FROM toks WHERE len(t) >= 2)
       |  GROUP BY src, dst),
       |und AS (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM tedges WHERE src <> dst),
       |deg AS (
       |  SELECT node, count(*) AS deg FROM (
       |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
       |  GROUP BY node),
       |adj AS (
       |  SELECT x.w, x.n,
       |    CAST(floor(1e6 / ln(CAST(d.deg AS DOUBLE)) + 0.5) AS BIGINT) AS wt
       |  FROM (
       |    SELECT u AS w, v AS n FROM und
       |    UNION ALL SELECT v, u FROM und) x
       |  JOIN deg d ON d.node = x.w WHERE d.deg <= $MaxWitnessDeg)
       |SELECT l.n AS a, r.n AS b, CAST(count(*) AS BIGINT) AS common,
       |  CAST(sum(l.wt) AS DOUBLE) / 1e6 AS adamic_adar
       |FROM adj l JOIN adj r ON l.w = r.w AND l.n < r.n
       |GROUP BY 1, 2
       |HAVING count(*) >= 2
       |ORDER BY adamic_adar DESC, a, b
       |LIMIT 30""".stripMargin

  /** Per-node local clustering coefficient — [[trianglesOnEdges]]'s
    * node-level refinement: lcc(v) = 2·t(v) / (deg(v)·(deg(v)−1)),
    * the "how clique-like is this node's neighborhood" score (ego-net
    * density; the building block of small-world statistics). Same
    * degree-oriented wedge join (work bounded by the SMALLER-degree
    * endpoint, never d² at a hub); each closed triangle then explodes
    * to its three corners — a constant ×3 fanout — and a corner count
    * per node joins back to the uncapped degrees. Integer arithmetic
    * end-to-end except the one floor-pinned division on the 30-row
    * output head (deterministic (lcc desc, node) order).
    */
  def localClustering(s: SparkSession, dir: String): DataFrame =
    localClusteringOnEdges(tokenEdges(s, dir))

  def localClusteringOnEdges(rawEdges: DataFrame): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val und = rawEdges.where($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
      .localCheckpoint()
    val deg = und.select($"u".as("node")).union(und.select($"v"))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select($"node".as("u"), $"deg".as("du")), "u")
      .join(deg.select($"node".as("v"), $"deg".as("dv")), "v")
    val uFirst = struct($"du", $"u") < struct($"dv", $"v")
    val oriented = withDeg.select(
      when(uFirst, $"u").otherwise($"v").as("src"),
      when(uFirst, $"v").otherwise($"u").as("dst"),
      when(uFirst, struct($"dv".as("d"), $"v".as("n")))
        .otherwise(struct($"du".as("d"), $"u".as("n"))).as("dk"))
      .localCheckpoint()
    val wedges = oriented.select($"src", $"dst".as("b"), $"dk".as("bk"))
      .join(oriented.select($"src", $"dst".as("c"), $"dk".as("ck")), "src")
      .where($"bk" < $"ck")
      .select($"src".as("a"), $"b", $"c")
    val corners = wedges
      .join(oriented.select($"src".as("b"), $"dst".as("c")), Seq("b", "c"))
      .selectExpr("explode(array(a, b, c)) AS node")
      .groupBy($"node").agg(count(lit(1)).as("n_tri"))
    deg.join(corners, Seq("node"), "left")
      .where($"deg" >= 2)
      .selectExpr("node", "deg", "coalesce(n_tri, 0) AS n_tri",
        """floor(CAST(2 * coalesce(n_tri, 0) AS DOUBLE)
          |  / CAST(deg * (deg - 1) AS DOUBLE) * 1e6 + 0.5) / 1e6
          |  AS lcc""".stripMargin)
      .orderBy($"lcc".desc, $"node")
      .limit(30)
  }

  val localClusteringSql: String =
    s"""WITH toks AS (
       |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
       |tedges AS (
       |  SELECT src, dst FROM (
       |    SELECT
       |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
       |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
       |    FROM toks WHERE len(t) >= 2)
       |  GROUP BY src, dst),
       |und AS (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM tedges WHERE src <> dst),
       |deg AS (
       |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
       |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
       |  GROUP BY node),
       |tri AS (
       |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |  FROM und e1
       |  JOIN und e2 ON e2.u = e1.v
       |  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
       |corners AS (
       |  SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
       |    SELECT a AS node FROM tri
       |    UNION ALL SELECT b FROM tri
       |    UNION ALL SELECT c FROM tri)
       |  GROUP BY node)
       |SELECT d.node, d.deg, coalesce(c.n_tri, 0) AS n_tri,
       |  floor(CAST(2 * coalesce(c.n_tri, 0) AS DOUBLE)
       |    / CAST(d.deg * (d.deg - 1) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS lcc
       |FROM deg d LEFT JOIN corners c ON c.node = d.node
       |WHERE d.deg >= 2
       |ORDER BY lcc DESC, d.node
       |LIMIT 30""".stripMargin

  /** Degree assortativity — the Pearson correlation of endpoint
    * degrees over edges, THE one-number mixing summary of a network
    * (positive: hubs link hubs, social-graph-like; negative: hubs link
    * leaves, hub-and-spoke/technological — Newman 2002). The
    * symmetrized edge list (each undirected edge contributes both
    * orientations, so the correlation is exchange-symmetric by
    * construction) carries (deg(src), deg(dst)) from one broadcast-
    * sized degree frame; the five sufficient statistics are exact
    * integer sums (one map-side-combinable aggregate — degrees on a
    * token-transition graph are vocabulary-bounded, so no overflow),
    * and r is one double expression with the identical IEEE sequence
    * in both engines, NULL when a variance vanishes (regular graph).
    */
  def assortativity(s: SparkSession, dir: String): DataFrame =
    assortativityOnEdges(tokenEdges(s, dir))

  def assortativityOnEdges(rawEdges: DataFrame): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val und = rawEdges.where($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
      .localCheckpoint()
    val deg = und.select($"u".as("node")).union(und.select($"v"))
      .groupBy($"node").agg(count(lit(1)).as("deg"))
    val sym = und.select($"u".as("a"), $"v".as("b"))
      .union(und.select($"v".as("a"), $"u".as("b")))
      .join(deg.select($"node".as("a"), $"deg".as("x")), "a")
      .join(deg.select($"node".as("b"), $"deg".as("y")), "b")
    sym.agg(count(lit(1)).as("m"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
      .selectExpr("m div 2 AS n_edges",
        """CASE WHEN (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
          |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |    * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
          |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0.0 THEN NULL
          |  ELSE floor((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
          |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          |    / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
          |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |      * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
          |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
          |    * 1e6 + 0.5) / 1e6 END AS assortativity""".stripMargin)
  }

  val assortativitySql: String =
    s"""WITH toks AS (
       |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
       |tedges AS (
       |  SELECT src, dst FROM (
       |    SELECT
       |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
       |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
       |    FROM toks WHERE len(t) >= 2)
       |  GROUP BY src, dst),
       |und AS (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM tedges WHERE src <> dst),
       |deg AS (
       |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
       |    SELECT u AS node FROM und UNION ALL SELECT v FROM und)
       |  GROUP BY node),
       |sym AS (
       |  SELECT da.deg AS x, db.deg AS y
       |  FROM (SELECT u AS a, v AS b FROM und
       |        UNION ALL SELECT v, u FROM und) e
       |  JOIN deg da ON da.node = e.a
       |  JOIN deg db ON db.node = e.b),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM sym)
       |SELECT m // 2 AS n_edges,
       |  CASE WHEN (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |      * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
       |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0.0 THEN NULL
       |    ELSE floor((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |      / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |        * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
       |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       |      * 1e6 + 0.5) / 1e6 END AS assortativity
       |FROM g""".stripMargin

  /** Modularity of a node labeling — Newman's Q = Σ_c (e_c/m −
    * (d_c/2m)²): how much more intra-community mass the partition
    * captures than a degree-preserving random graph would. Modularity
    * is a function of (graph, labeling) — the quality score every
    * community detector optimizes and every partition report prints;
    * the registered query evaluates the deterministic first-character
    * labeling of the token graph (any labeling column plugs in).
    * Everything reduces to three exact integer statistics — m, intra
    * (edges with both ends in one community) and Σ_c d_c² — via two
    * bounded map-side-combinable aggregates (communities ≤ alphabet);
    * Q is one double expression, floor-pinned, identical both engines:
    * Q = intra/m − Σd_c²/(4m²).
    */
  def modularity(s: SparkSession, dir: String): DataFrame =
    modularityOnEdges(tokenEdges(s, dir))

  def modularityOnEdges(rawEdges: DataFrame): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val und = rawEdges.where($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
      .localCheckpoint()
    val lab = (c: String) => expr(s"substring($c, 1, 1)")
    val edgeStats = und.agg(count(lit(1)).as("m"),
      sum(when(lab("u") === lab("v"), 1L).otherwise(0L)).as("intra"))
    val dc = und.select(lab("u").as("c")).union(und.select(lab("v").as("c")))
      .groupBy($"c").agg(count(lit(1)).as("d_c"))
    val dcStats = dc.agg(count(lit(1)).as("n_communities"),
      sum($"d_c" * $"d_c").as("sdc2"))
    edgeStats.crossJoin(broadcast(dcStats))
      .selectExpr("m", "intra", "n_communities",
        """floor((CAST(intra AS DOUBLE) / m
          |  - CAST(sdc2 AS DOUBLE)
          |    / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)))
          |  * 1e6 + 0.5) / 1e6 AS modularity""".stripMargin)
  }

  val modularitySql: String =
    s"""WITH toks AS (
       |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
       |tedges AS (
       |  SELECT src, dst FROM (
       |    SELECT
       |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
       |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
       |    FROM toks WHERE len(t) >= 2)
       |  GROUP BY src, dst),
       |und AS (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM tedges WHERE src <> dst),
       |es AS (
       |  SELECT CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(CASE WHEN substring(u, 1, 1) = substring(v, 1, 1)
       |      THEN 1 ELSE 0 END) AS BIGINT) AS intra
       |  FROM und),
       |dc AS (
       |  SELECT c, CAST(count(*) AS BIGINT) AS d_c FROM (
       |    SELECT substring(u, 1, 1) AS c FROM und
       |    UNION ALL SELECT substring(v, 1, 1) FROM und)
       |  GROUP BY c),
       |ds AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_communities,
       |    CAST(sum(d_c * d_c) AS BIGINT) AS sdc2
       |  FROM dc)
       |SELECT m, intra, n_communities,
       |  floor((CAST(intra AS DOUBLE) / m
       |    - CAST(sdc2 AS DOUBLE)
       |      / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)))
       |    * 1e6 + 0.5) / 1e6 AS modularity
       |FROM es CROSS JOIN ds""".stripMargin

  // ------------------------------------------- weighted shortest paths

  /** Bounded-hop weighted single-source shortest paths (Bellman–Ford):
    * the BFS trade graph carries an integer edge cost (min contributing
    * quantity − 47 ∈ {1,2,3}), and each of the [[BfsHops]] rounds
    * relaxes EVERY current tentative distance through the edge list —
    * unlike BFS's frontier-only expansion, a weighted distance can
    * improve at a later hop, so the full distance frame joins each
    * round (textbook Bellman–Ford, one join + one min-aggregate per
    * round on the same edge partitioning, frames localCheckpoint'ed for
    * the doubly-consumed chain). Integer costs keep the min exact; the
    * oracle is the recursive-CTE walk enumeration bounded by the same
    * hop count with min(total cost) per node.
    *
    * At 100 TB: per-round cost is one shuffle keyed on node over a
    * frame bounded by reachable nodes; hop-bounding (the production
    * norm for trust/fraud radius queries) caps rounds, and early-exit
    * on an unchanged frame would drop the constant further.
    */
  def sssp(s: SparkSession, dir: String): DataFrame =
    ssspOnEdges(weightedTradeEdges(s, dir), BfsHops)

  def weightedTradeEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val trade = Tables.lineitem(s, dir)
      .where($"l_quantity" >= BfsMinQty)
      .select($"l_orderkey", $"l_suppkey", $"l_quantity")
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy(concat(lit("C"), $"o_custkey".cast("string")).as("c"),
        concat(lit("S"), $"l_suppkey".cast("string")).as("s"))
      .agg((min($"l_quantity").cast("long") - 47L).as("cost"))
    trade.select($"c".as("src"), $"s".as("dst"), $"cost")
      .union(trade.select($"s", $"c", $"cost"))
      .groupBy($"src", $"dst").agg(min($"cost").as("cost"))
  }

  def ssspOnEdges(rawEdges: DataFrame, maxHops: Int = BfsHops): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val edges = rawEdges.select($"src", $"dst", $"cost").localCheckpoint()
    val seed = edges.agg(min($"src").as("node"))
    var dist = seed.select($"node", lit(0L).as("dist")).localCheckpoint()
    for (_ <- 1 to maxHops) {
      val relaxed = dist.join(edges, $"node" === $"src")
        .select($"dst".as("node"), ($"dist" + $"cost").as("dist"))
      dist = dist.union(relaxed)
        .groupBy($"node").agg(min($"dist").as("dist"))
        .localCheckpoint()
    }
    dist.select($"node", $"dist")
  }

  val ssspSql: String =
    s"""WITH RECURSIVE trade AS (
       |  SELECT 'C' || o_custkey AS c, 'S' || l_suppkey AS s,
       |    CAST(min(l_quantity) AS BIGINT) - 47 AS cost
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_quantity >= $BfsMinQty
       |  GROUP BY 1, 2),
       |e AS (
       |  SELECT src, dst, min(cost) AS cost FROM (
       |    SELECT c AS src, s AS dst, cost FROM trade
       |    UNION ALL
       |    SELECT s, c, cost FROM trade)
       |  GROUP BY src, dst),
       |seed AS (SELECT min(src) AS node FROM e),
       |w AS (
       |  SELECT node, CAST(0 AS BIGINT) AS d, 0 AS h FROM seed
       |  UNION
       |  SELECT e.dst AS node, w.d + e.cost AS d, w.h + 1 AS h
       |  FROM w JOIN e ON e.src = w.node WHERE w.h < $BfsHops)
       |SELECT node, min(d) AS dist
       |FROM w GROUP BY node""".stripMargin

  // ------------------------------------------- label propagation (LPA)

  val LpaIters = 3

  /** Synchronous label-propagation community detection — the
    * community-STRUCTURE complement to [[modularity]] (which SCORES a
    * given assignment): every node starts as its own label, and each of
    * [[LpaIters]] synchronous rounds re-labels every node with the
    * label most frequent among its neighbors, ties to the
    * lexicographically smallest label. Deterministic by construction
    * (no random visit order — the classic LPA nondeterminism is
    * removed by full-synchronous rounds + the total tie order), so the
    * unrolled recurrence IS the oracle contract.
    *
    * Per round: one equi-join of the symmetric neighbor list against
    * the label frame (both keyed on the node), a (node, label) partial
    * count, and a per-node argmax window — the Pregel-on-DataFrames
    * shape every iterative op here uses, with `localCheckpoint`
    * truncating the doubly-consumed lineage. At 100 TB the round cost
    * is one shuffle keyed on node over the edge list; fixed rounds cap
    * the chain (production LPA runs 3–5 sweeps).
    */
  def labelProp(s: SparkSession, dir: String): DataFrame =
    labelPropOnEdges(tokenEdges(s, dir))

  def labelPropOnEdges(rawEdges: DataFrame): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val und = rawEdges.where($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
    val nbr = und.select($"u".as("node"), $"v".as("n"))
      .union(und.select($"v".as("node"), $"u".as("n")))
      .localCheckpoint()
    val init = nbr.select($"node").distinct()
      .select($"node", $"node".as("lab"))
    val w = Window.partitionBy($"node")
      .orderBy($"c".desc, $"lab".asc)
    val fin = (1 to LpaIters).foldLeft(init) { (labels, _) =>
      nbr.join(labels.select($"node".as("n"), $"lab"), "n")
        .groupBy($"node", $"lab").agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"node", $"lab")
        .localCheckpoint()
    }
    fin.select($"node".as("token"), $"lab".as("community"))
  }

  val labelPropSql: String = {
    val iters = (1 to LpaIters).map { i =>
      s"""l$i AS (
         |  SELECT node, lab FROM (
         |    SELECT nb.node, l.lab, count(*) AS c,
         |      row_number() OVER (PARTITION BY nb.node
         |        ORDER BY count(*) DESC, l.lab ASC) AS rn
         |    FROM nbr nb JOIN l${i - 1} l ON l.node = nb.n
         |    GROUP BY nb.node, l.lab)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (
       |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
       |tedges AS (
       |  SELECT src, dst FROM (
       |    SELECT
       |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
       |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
       |    FROM toks WHERE len(t) >= 2)
       |  GROUP BY src, dst),
       |und AS (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM tedges WHERE src <> dst),
       |nbr AS (
       |  SELECT u AS node, v AS n FROM und
       |  UNION ALL
       |  SELECT v AS node, u AS n FROM und),
       |l0 AS (
       |  SELECT DISTINCT node, node AS lab FROM nbr),
       |$iters
       |SELECT node AS token, lab AS community FROM l$LpaIters""".stripMargin
  }

  // ------------------------------------------------ maximum spanning tree

  /** Borůvka-round backstop: components at least halve per round, so
    * 30 rounds cover 2³⁰ nodes; overshooting is a loud failure.
    */
  val MstMaxRounds = 30

  /** Undirected weighted co-occurrence edges for the spanning tree:
    * canonical (src < dst) pair, weight = total transition count in
    * both directions, self-loops dropped.
    */
  private[graft] def undirectedWeighted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    tokenEdges(s, dir).where($"src" =!= $"dst")
      .select(least($"src", $"dst").as("a"),
        greatest($"src", $"dst").as("b"), $"cnt")
      .groupBy($"a", $"b").agg(sum($"cnt").as("w"))
  }

  /** MAXIMUM spanning forest of the token co-occurrence graph —
    * Chow–Liu-flavored structure discovery (the max-weight tree over
    * pairwise association is the optimal tree-shaped dependency
    * approximation) and the single-linkage backbone every
    * hierarchical-clustering pass reduces to. Distributed Borůvka:
    * each round every component picks its best outgoing edge under the
    * STRICT total order (w DESC, a, b) — strictness makes the spanning
    * forest unique, which is what lets the oracle verify the RESULT
    * while free to iterate differently — then picked edges contract by
    * connected components ([[Dedup.connectedComponents]] reused on the
    * component graph, which is ≤ |V| rows and halves every round).
    *
    * Scale shape: the edge list re-joins the label table once per
    * round (O(log V) rounds); labels are O(V) and partition-hashed;
    * picks/contraction frames are component-sized, never edge-sized.
    * No driver state — `isEmpty` on the candidate frame is the loop's
    * only action, and the accumulated forest stays distributed.
    */
  def maxSpanningTree(s: SparkSession, dir: String): DataFrame =
    maxSpanningForestOnEdges(undirectedWeighted(s, dir))

  /** Borůvka core over a canonical undirected weighted edge list
    * (a < b, weight w) — split out so specs can plant graphs.
    */
  private[graft] def maxSpanningForestOnEdges(und0: DataFrame): DataFrame = {
    val s = und0.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val und = und0.localCheckpoint()
    val bi = und.select($"a", $"b", $"w", $"a".as("u"), $"b".as("v"))
      .union(und.select($"a", $"b", $"w", $"b".as("u"), $"a".as("v")))
    var labels = bi.select($"u".as("node")).distinct()
      .select($"node", $"node".as("c")).localCheckpoint()
    var mst = und.limit(0)
    var round = 0
    var done = false
    while (!done && round < MstMaxRounds) {
      val cand = bi
        .join(labels.select($"node".as("u"), $"c".as("cu")), "u")
        .join(labels.select($"node".as("v"), $"c".as("cv")), "v")
        .where($"cu" =!= $"cv")
      val picks = cand
        .withColumn("rn", row_number().over(
          Window.partitionBy($"cu").orderBy($"w".desc, $"a", $"b")))
        .where($"rn" === 1)
        .select($"cu", $"cv", $"a", $"b", $"w").localCheckpoint()
      if (picks.isEmpty) done = true
      else {
        mst = mst.union(picks.select($"a", $"b", $"w").distinct())
        // Contraction: the pick graph is COMPONENT-level metadata (≤
        // #components rows, halving every round), so it is contracted
        // in one per-partition union-find pass on a single coalesced
        // partition — the mapPartitions escape hatch used exactly where
        // the brief reserves it (genuine per-partition imperative
        // logic on a metadata-sized frame). One task, no inner
        // convergence loop, no per-iteration driver actions; labels are
        // canonicalized to the min member id, matching the oracle's
        // min-reachable closure.
        val comp = ufLabels(picks.select($"cu".as("s"), $"cv".as("d")))
          .select(col("member").as("c"), col("label").as("nc"))
        labels = labels
          .join(comp, Seq("c"), "left")
          .select($"node", coalesce($"nc", $"c").as("c"))
          .localCheckpoint()
        round += 1
      }
    }
    if (!done) throw new IllegalStateException(
      s"Borůvka failed to finish in $MstMaxRounds rounds")
    mst.select($"a".as("src"), $"b".as("dst"), $"w")
  }

  /** Oracle: the same Borůvka recurrence, R fixed rounds generated as
    * chained CTEs (idle rounds are no-ops once the forest is spanning),
    * per-round contraction via a RECURSIVE reach closure over the
    * picked component edges (fixpoint semantics — no unrolled jump
    * count to keep in sync). Pick/label CTEs are MATERIALIZED: the
    * round chain re-references each stage several times and DuckDB's
    * inlining would otherwise re-expand the whole prefix per reference.
    * Uniqueness of the strictly-ordered spanning forest is what makes
    * the two engines' different iteration orders land on the
    * identical edge set.
    */
  /** The Borůvka oracle's CTE body through the final `mst` table —
    * shared by [[maxSpanningTreeSql]] and the single-linkage clustering
    * oracle built on the forest.
    */
  private val mstCtes: String = {
    val R = 20 // covers 2^20 components; fixture vocab is far below
    val rounds = (1 to R).map { r =>
      val prev = s"lab${r - 1}"
      s"""cand$r AS MATERIALIZED (
         |  SELECT lu.c AS cu, lv.c AS cv, e.a, e.b, e.w,
         |    row_number() OVER (PARTITION BY lu.c
         |      ORDER BY e.w DESC, e.a, e.b) AS rn
         |  FROM bi e
         |  JOIN $prev lu ON e.u = lu.node
         |  JOIN $prev lv ON e.v = lv.node
         |  WHERE lu.c <> lv.c),
         |pick$r AS MATERIALIZED (
         |  SELECT cu, cv, a, b, w FROM cand$r WHERE rn = 1),
         |pe$r AS MATERIALIZED (
         |  SELECT cu AS s, cv AS d FROM pick$r
         |  UNION SELECT cv, cu FROM pick$r),
         |reach$r(x, y) AS (
         |  SELECT s, s FROM pe$r
         |  UNION
         |  SELECT rr.x, e.d FROM reach$r rr JOIN pe$r e ON rr.y = e.s),
         |cmap$r AS MATERIALIZED (
         |  SELECT x AS c, min(y) AS nc FROM reach$r GROUP BY x),
         |lab$r AS MATERIALIZED (
         |  SELECT l.node, coalesce(m.nc, l.c) AS c
         |  FROM lab${r - 1} l LEFT JOIN cmap$r m ON l.c = m.c)""".stripMargin
    }.mkString(",\n")
    val allPicks = (1 to R)
      .map(r => s"SELECT a, b, w FROM pick$r").mkString(" UNION ALL ")
    s"""toks AS (
       |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
       |tedges AS (
       |  SELECT src, dst, count(*) AS cnt FROM (
       |    SELECT
       |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
       |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
       |    FROM toks WHERE len(t) >= 2)
       |  GROUP BY src, dst),
       |und AS MATERIALIZED (
       |  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
       |    CAST(sum(cnt) AS BIGINT) AS w
       |  FROM tedges WHERE src <> dst GROUP BY 1, 2),
       |bi AS MATERIALIZED (
       |  SELECT a, b, w, a AS u, b AS v FROM und
       |  UNION ALL SELECT a, b, w, b, a FROM und),
       |lab0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS c FROM bi),
       |$rounds,
       |mst AS MATERIALIZED (
       |  SELECT DISTINCT a, b, w FROM ($allPicks))""".stripMargin
  }

  val maxSpanningTreeSql: String =
    s"""WITH RECURSIVE $mstCtes
       |SELECT a AS src, b AS dst, w FROM mst""".stripMargin

  /** Clusters kept after cutting the weakest forest edges. */
  val SingleLinkCuts = 7

  /** Single-linkage flat clustering — the textbook REDUCTION from the
    * spanning forest: cutting the k−1 weakest forest edges (strict
    * order w ASC, a, b) yields exactly the k clusters single-linkage
    * agglomeration would stop at, because the forest edge weights ARE
    * the linkage merge heights. Output: every graph node with its
    * cluster's canonical (minimum) member. The cut is a rank over the
    * FOREST (|V|−1 rows, metadata), the labeling one union-find pass
    * over the kept edges — at 100 TB the cost remains the forest
    * build's.
    */
  def singleLinkage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val und = undirectedWeighted(s, dir).localCheckpoint()
    val mst = maxSpanningForestOnEdges(und).localCheckpoint()
    // cut set by distributed TakeOrdered (per-partition top-K under the
    // strict total order, never all forest edges through one window
    // partition), removed by anti-join on the forest's unique (src, dst)
    val cut = mst.orderBy($"w".asc, $"src", $"dst").limit(SingleLinkCuts)
      .select($"src".as("c_src"), $"dst".as("c_dst"))
    val kept = mst.join(cut,
      $"src" === $"c_src" && $"dst" === $"c_dst", "left_anti")
    val labels = ufLabels(kept.select($"src".as("s"), $"dst".as("d")))
    und.select(explode(array($"a", $"b")).as("token")).distinct()
      .join(labels, $"token" === $"member", "left")
      .select($"token", coalesce($"label", $"token").as("cluster"))
  }

  /** Per-partition union-find over an edge list coalesced to one
    * partition (metadata-sized inputs only) — labels every touched
    * member with its tree's minimum id.
    */
  private[graft] def ufLabels(edges: DataFrame): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    edges.as[(String, String)].coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.Map.empty[String, String]
        def find(x: String): String = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        val members = scala.collection.mutable.Set.empty[String]
        it.foreach { case (a, b) =>
          members += a; members += b
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(ra) = rb
        }
        val minOf = scala.collection.mutable.Map.empty[String, String]
        members.foreach { m =>
          val r = find(m)
          if (!minOf.contains(r) || m < minOf(r)) minOf(r) = m
        }
        members.iterator.map(m => (m, minOf(find(m))))
      }.toDF("member", "label")
  }

  val singleLinkageSql: String =
    s"""WITH RECURSIVE $mstCtes,
       |ranked AS (
       |  SELECT a, b, w,
       |    row_number() OVER (ORDER BY w ASC, a, b) AS rk
       |  FROM mst),
       |kept AS MATERIALIZED (
       |  SELECT a, b FROM ranked WHERE rk > $SingleLinkCuts),
       |ke AS (SELECT a AS s, b AS d FROM kept
       |  UNION SELECT b, a FROM kept),
       |creach(x, y) AS (
       |  SELECT s, s FROM ke
       |  UNION
       |  SELECT r.x, e.d FROM creach r JOIN ke e ON r.y = e.s),
       |clab AS (SELECT x AS member, min(y) AS label FROM creach GROUP BY x),
       |nodes AS (SELECT DISTINCT u AS token FROM bi)
       |SELECT n.token, coalesce(c.label, n.token) AS cluster
       |FROM nodes n LEFT JOIN clab c ON n.token = c.member""".stripMargin

  /** Walks started per source node and steps per walk for
    * [[randomWalks]] — the (walks × length) budget of a DeepWalk /
    * node2vec corpus generation (Perozzi et al., KDD'14 run 80×40;
    * the toy graph keeps the same plan at 3×8).
    */
  val WalksPerNode = 3
  val WalkLen = 8

  def randomWalks(s: SparkSession, dir: String): DataFrame =
    randomWalksOnEdges(tokenEdges(s, dir))

  /** Weight-proportional random-walk corpus over the edge list — the
    * sequence generator DeepWalk/node2vec feed to a skip-gram trainer
    * (node embeddings from co-visitation). Every "random" choice is
    * DERIVED, not drawn: at step t a walk sitting on node u picks the
    * out-edge whose cumulative-count interval [lo, hi) contains
    * md5₆₀("walk:start:wid:t:u") mod out_count(u) — the repo's salted
    * md5-60 idiom ([[Curation]] sampling), so the corpus is exactly
    * reproducible under retry/speculation AND replayable by the
    * oracle. Walks END at sink nodes (no out-edges): the inner join
    * drops them, exactly like the reference recursion.
    *
    * Scale shape: the per-src cumulative intervals are one window over
    * the edge list (edge-count-sized, built once); each step is ONE
    * equi-join of the (starts × W) frontier against the interval table
    * on the current node — never a gather to the driver, state is
    * O(active walks). Frontier lineage is truncated every 4 steps
    * ([[CkptEvery]]-style); the plan chain between checkpoints is
    * linear in steps. At 100 TB the frontier is billions of rows and
    * the same L joins run shuffle-partitioned on the node key.
    */
  def randomWalksOnEdges(rawEdges: DataFrame): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val edges = rawEdges.localCheckpoint()
    val cum = Window.partitionBy($"src").orderBy($"dst")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outW = edges.groupBy($"src").agg(sum($"cnt").as("oc"))
    val intervals = edges
      .withColumn("hi", sum($"cnt").over(cum))
      .withColumn("lo", $"hi" - $"cnt")
      .join(outW, "src")
      .select($"src", $"dst", $"lo", $"hi", $"oc")
      .localCheckpoint()
    var frontier = edges.select($"src").distinct()
      .crossJoin(broadcast(s.range(0, WalksPerNode).select($"id".as("wid"))))
      .select($"src".as("start"), $"wid", $"src".as("node"))
      .localCheckpoint()
    var out = frontier.select($"start", $"wid", lit(0L).as("step"), $"node")
    for (t <- 1 to WalkLen) {
      val r = conv(substring(md5(concat_ws(":",
        lit("walk"), $"start", $"wid", lit(t - 1), $"node")), 1, 15), 16, 10)
        .cast("long") % $"oc"
      var next = frontier.join(intervals, $"node" === $"src")
        .where(r >= $"lo" && r < $"hi")
        .select($"start", $"wid", $"dst".as("node"))
      if (t % 4 == 0) next = next.localCheckpoint()
      frontier = next
      out = out.union(
        frontier.select($"start", $"wid", lit(t.toLong).as("step"), $"node"))
    }
    out
  }

  /** DuckDB restatement: identical edge build, cumulative intervals,
    * and md5-60 pick, with the [[WalkLen]] steps unrolled as
    * MATERIALIZED CTEs (each step's frontier feeds the next — the
    * ladder discipline that stops projection-inlining re-expansion).
    * Every integer sum is CAST BIGINT (HUGEINT rule).
    */
  val randomWalksSql: String = {
    val base =
      s"""WITH toks AS (
         |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
         |edges AS MATERIALIZED (
         |  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT
         |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
         |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
         |    FROM toks WHERE len(t) >= 2)
         |  GROUP BY src, dst),
         |outw AS (
         |  SELECT src, CAST(sum(cnt) AS BIGINT) AS oc FROM edges GROUP BY src),
         |iv AS MATERIALIZED (
         |  SELECT e.src, e.dst,
         |    CAST(sum(e.cnt) OVER (PARTITION BY e.src ORDER BY e.dst
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - e.cnt
         |      AS BIGINT) AS lo,
         |    CAST(sum(e.cnt) OVER (PARTITION BY e.src ORDER BY e.dst
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS hi,
         |    o.oc
         |  FROM edges e JOIN outw o ON e.src = o.src),
         |s0 AS MATERIALIZED (
         |  SELECT src AS start, CAST(wid AS BIGINT) AS wid, src AS node
         |  FROM (SELECT DISTINCT src FROM edges)
         |  CROSS JOIN (SELECT unnest(range(0, $WalksPerNode)) AS wid))""".stripMargin
    val steps = (1 to WalkLen).map { t =>
      s"""s$t AS MATERIALIZED (
         |  SELECT start, wid, dst AS node FROM (
         |    SELECT f.start, f.wid, i.dst, i.lo, i.hi,
         |      CAST(('0x' || substring(md5('walk:' || f.start
         |          || ':' || CAST(f.wid AS VARCHAR)
         |          || ':${t - 1}:' || f.node), 1, 15)) AS BIGINT) % i.oc AS r
         |    FROM s${t - 1} f JOIN iv i ON i.src = f.node)
         |  WHERE r >= lo AND r < hi)""".stripMargin
    }.mkString(",\n")
    val rows = (0 to WalkLen)
      .map(t => s"SELECT start, wid, CAST($t AS BIGINT) AS step, node FROM s$t")
      .mkString(" UNION ALL ")
    s"$base,\n$steps\n$rows"
  }

  /** Level-unroll bound for [[betweenness]] — must exceed the graph
    * diameter (the spec computes the true eccentricity bound and
    * asserts it; the token-transition graph's diameter is ≤ 6 at every
    * fixture vintage, and the 10× replica shares the vocabulary).
    */
  val BetwMaxDepth = 10

  def betweenness(s: SparkSession, dir: String): DataFrame =
    betweennessOnEdges(tokenEdges(s, dir))

  /** Betweenness centrality by Brandes' algorithm (2001) over the
    * directed unweighted token graph — the broker/bottleneck score
    * (how much shortest-path traffic a node carries) completing the
    * centrality family beside pagerank (flow), HITS (duality), and
    * k-core (cohesion). All-sources BFS runs SIMULTANEOUSLY as
    * level-synchronous (source, node) frontiers — path counts σ are
    * exact BIGINT sums — then dependencies accumulate BACKWARD through
    * the shortest-path DAG: δ(s,v) = Σ_{w ∈ succ} σ(s,v)/σ(s,w) ·
    * (1 + δ(s,w)), each term floor-rounded to 9 dp and decimal-summed
    * (order-free ⇒ engine-exact), and B(v) = Σ_{s≠v} δ(s,v) as a
    * decimal sum of the 9-dp deltas.
    *
    * Scale shape: every frontier/backward step is an equi-join on
    * (source, node) keys — |pairs| ≤ n² state sharded by source, never
    * a driver structure; the level loop is LAZY between checkpoint
    * pins every 3 levels (the pagerank discipline). At 100 TB one
    * runs this on a sampled source set — the plan is unchanged, only
    * the seed frontier shrinks.
    */
  def betweennessOnEdges(rawEdges: DataFrame,
      maxDepth: Int = BetwMaxDepth): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val edges = rawEdges.select($"src", $"dst").localCheckpoint()
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst")).distinct().localCheckpoint()
    val deltas = brandesDeltas(edges, nodes.select($"node".as("s")), maxDepth)
    nodes.join(deltas, $"node" === $"v", "left_outer")
      .select($"node", coalesce($"b", lit(0.0)).as("betweenness"))
  }

  /** Brandes forward + backward passes from an arbitrary SOURCE frame
    * (one column `s`) — the seam [[betweennessOnEdges]] (all sources,
    * exact) and [[betweennessApproxOnEdges]] (k sampled sources) share.
    * Returns per-node dependency totals (v, b) with b = Σ_{s≠v} δ(s,v)
    * over the given sources, 9-dp decimal-summed (engine-exact).
    */
  private def brandesDeltas(edges: DataFrame, sources: DataFrame,
      maxDepth: Int): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    var frontier = sources
      .select($"s", $"s".as("v"), lit(1L).as("sigma"))
      .localCheckpoint()
    var seen = frontier.select($"s", $"v").localCheckpoint()
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    for (l <- 1 to maxDepth) {
      frontier = frontier.join(edges, $"v" === $"src")
        .select($"s", $"dst".as("v2"), $"sigma")
        .join(seen.select($"s", $"v".as("v2")), Seq("s", "v2"), "left_anti")
        .groupBy($"s", $"v2").agg(sum($"sigma").as("sigma"))
        .select($"s", $"v2".as("v"), $"sigma")
      seen = seen.union(frontier.select($"s", $"v"))
      if (l % 3 == 0) {
        frontier = frontier.localCheckpoint()
        seen = seen.localCheckpoint()
      }
      levels += frontier
    }
    val termExpr =
      """CAST(floor(CAST(sigma AS DOUBLE) / sigma_w
        |  * (1 + coalesce(delta_w, CAST(0 AS DOUBLE))) * 1e9 + 0.5) / 1e9
        |  AS DECIMAL(18,9))""".stripMargin
    var dep: DataFrame = levels(maxDepth)
      .select($"s", $"v", lit(0.0).as("delta")).where(lit(false))
    val deps = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (l <- (maxDepth - 1) to 1 by -1) {
      dep = levels(l).join(edges, $"v" === $"src")
        .join(levels(l + 1)
            .select($"s".as("sw"), $"v".as("w"), $"sigma".as("sigma_w")),
          $"s" === $"sw" && $"dst" === $"w")
        .join(dep.select($"s".as("s2"), $"v".as("w2"), $"delta".as("delta_w")),
          $"s" === $"s2" && $"w" === $"w2", "left_outer")
        .select($"s", $"v", $"sigma", $"sigma_w", $"delta_w")
        .withColumn("term", expr(termExpr))
        .groupBy($"s", $"v")
        .agg(sum($"term").cast("double").as("delta"))
      if (l % 3 == 0) dep = dep.localCheckpoint()
      deps += dep
    }
    val allDeps = deps.reduce(_ union _).where($"v" =!= $"s")
    allDeps.groupBy($"v")
      .agg(sum(expr("CAST(delta AS DECIMAL(18,9))")).cast("double").as("b"))
  }

  /** Seed count for the SAMPLED betweenness estimator. */
  val BetwApproxSeeds = 12

  def betweennessApprox(s: SparkSession, dir: String): DataFrame =
    betweennessApproxOnEdges(tokenEdges(s, dir))

  /** Sampled Brandes betweenness — the production form of
    * [[betweennessOnEdges]] at 100 TB: the exact algorithm runs the
    * forward/backward passes from ALL |V| sources simultaneously, so
    * frontier state is O(|V|·frontier) — the one cost a 100× token
    * graph would feel. The standard estimator (Brandes & Pich 2007:
    * centrality estimation from k pivots) runs the SAME passes from k
    * pivot sources and extrapolates B̂(v) = (n/k)·Σ_{s∈S} δ(s,v);
    * state shrinks linearly to O(k·|V|) and cost to O(k·E) per level,
    * with the plan — equi-joins on (source, node), checkpoint pins —
    * unchanged. Pivots are the [[ClosenessSeeds]] discipline: the k
    * highest-out-mass nodes under a total order (out-mass DESC, token
    * ASC), engine-stable, so both engines pick the identical seed set
    * and the estimate is exactly reproducible (hub pivots, not uniform
    * draws — deterministic AND they cover the most shortest-path mass,
    * the Brandes-Pich "high-centrality pivots" variant).
    *
    * Output: every node with its scaled estimate (9-dp decimal delta
    * sums, one micro-floored double at the end — oracle-exact).
    */
  def betweennessApproxOnEdges(rawEdges: DataFrame,
      k: Int = BetwApproxSeeds, maxDepth: Int = BetwMaxDepth): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val edges = rawEdges.select($"src", $"dst").localCheckpoint()
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst")).distinct().localCheckpoint()
    val seeds = rawEdges.groupBy($"src").agg(sum($"cnt").as("m"))
      .orderBy(desc("m"), $"src").limit(k)
      .select($"src".as("s")).localCheckpoint()
    val deltas = brandesDeltas(edges, seeds, maxDepth)
    val nNodes = nodes.agg(count(lit(1)).as("n_nodes"))
    val nSeeds = seeds.agg(count(lit(1)).as("n_seeds"))
    nodes.join(deltas, $"node" === $"v", "left_outer")
      .crossJoin(broadcast(nNodes))
      .crossJoin(broadcast(nSeeds))
      .select($"node",
        expr("""floor(coalesce(b, CAST(0 AS DOUBLE)) * n_nodes / n_seeds
               |  * 1e6 + 0.5) / 1e6""".stripMargin).as("betweenness_est"))
  }

  /** DuckDB restatement: forward levels f0..fD (σ as BIGINT sums,
    * NOT-EXISTS dedupe against the running seen set), backward
    * dependency CTEs with the identical 9-dp floor terms, decimal
    * rollup per node.
    */
  /** Forward-level / backward-dependency CTE chains shared by the
    * exact and sampled betweenness oracles — both reference the f0 /
    * seen0 / edges CTEs their caller assembles.
    */
  private lazy val betwFwdSql: String = (1 to BetwMaxDepth).map { l =>
    s"""f$l AS MATERIALIZED (
       |  SELECT f.s, e.dst AS v, CAST(sum(f.sigma) AS BIGINT) AS sigma
       |  FROM f${l - 1} f JOIN edges e ON e.src = f.v
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM seen${l - 1} x WHERE x.s = f.s AND x.v = e.dst)
       |  GROUP BY f.s, e.dst),
       |seen$l AS MATERIALIZED (
       |  SELECT s, v FROM seen${l - 1} UNION SELECT s, v FROM f$l)"""
      .stripMargin
  }.mkString(",\n")

  private lazy val betwBwdSql: String = ((BetwMaxDepth - 1) to 1 by -1).map { l =>
    val prevDep = if (l == BetwMaxDepth - 1) "bD" else s"b${l + 1}"
    s"""b$l AS MATERIALIZED (
       |  SELECT fl.s, fl.v,
       |    CAST(sum(CAST(floor(CAST(fl.sigma AS DOUBLE) / fw.sigma
       |      * (1 + coalesce(bw.delta, CAST(0 AS DOUBLE))) * 1e9 + 0.5)
       |      / 1e9 AS DECIMAL(18,9))) AS DOUBLE) AS delta
       |  FROM f$l fl
       |  JOIN edges e ON e.src = fl.v
       |  JOIN f${l + 1} fw ON fw.s = fl.s AND fw.v = e.dst
       |  LEFT JOIN $prevDep bw ON bw.s = fl.s AND bw.v = e.dst
       |  GROUP BY fl.s, fl.v)""".stripMargin
  }.mkString(",\n")

  private lazy val betwDepUnionSql: String = ((BetwMaxDepth - 1) to 1 by -1)
    .map(l => s"SELECT s, v, delta FROM b$l").mkString(" UNION ALL ")

  val betweennessSql: String =
    s"""WITH toks AS (
       |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT
       |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
       |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
       |    FROM toks WHERE len(t) >= 2)),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |f0 AS (SELECT node AS s, node AS v, CAST(1 AS BIGINT) AS sigma
       |  FROM nodes),
       |seen0 AS (SELECT s, v FROM f0),
       |$betwFwdSql,
       |bD AS (SELECT s, v, CAST(0 AS DOUBLE) AS delta
       |  FROM f$BetwMaxDepth WHERE 1 = 0),
       |$betwBwdSql
       |SELECT n.node,
       |  coalesce(bc.b, CAST(0 AS DOUBLE)) AS betweenness
       |FROM nodes n LEFT JOIN (
       |  SELECT v, CAST(sum(CAST(delta AS DECIMAL(18,9))) AS DOUBLE) AS b
       |  FROM ($betwDepUnionSql) u WHERE v <> s GROUP BY v) bc
       |  ON bc.v = n.node""".stripMargin

  /** Sampled-betweenness oracle: identical chain CTEs, f0 restricted to
    * the k highest-out-mass seeds (same total order as the engine),
    * scaled n/k with the identical left-assoc double expression.
    */
  val betweennessApproxSql: String =
    s"""WITH toks AS (
       |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
       |wedges AS MATERIALIZED (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT
       |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
       |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
       |    FROM toks WHERE len(t) >= 2)
       |  GROUP BY src, dst),
       |edges AS MATERIALIZED (SELECT src, dst FROM wedges),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |seeds AS (
       |  SELECT src AS s FROM (
       |    SELECT src, sum(cnt) AS m FROM wedges GROUP BY src
       |    ORDER BY m DESC, src LIMIT $BetwApproxSeeds)),
       |f0 AS (SELECT s, s AS v, CAST(1 AS BIGINT) AS sigma FROM seeds),
       |seen0 AS (SELECT s, v FROM f0),
       |$betwFwdSql,
       |bD AS (SELECT s, v, CAST(0 AS DOUBLE) AS delta
       |  FROM f$BetwMaxDepth WHERE 1 = 0),
       |$betwBwdSql
       |SELECT n.node,
       |  floor(coalesce(bc.b, CAST(0 AS DOUBLE))
       |      * (SELECT count(*) FROM nodes)
       |      / (SELECT count(*) FROM seeds) * 1e6 + 0.5) / 1e6
       |    AS betweenness_est
       |FROM nodes n LEFT JOIN (
       |  SELECT v, CAST(sum(CAST(delta AS DECIMAL(18,9))) AS DOUBLE) AS b
       |  FROM ($betwDepUnionSql) u WHERE v <> s GROUP BY v) bc
       |  ON bc.v = n.node""".stripMargin

  // ------------------------------------------------------- closeness

  /** Seed-set size for closeness: the analysis runs from the highest
    * out-mass nodes (the hub vocabulary), not all sources — the
    * standard production compromise, since exact all-sources closeness
    * is an n·BFS that no 100 TB graph runs for a dashboard.
    */
  val ClosenessSeeds = 8
  val ClosenessMaxDepth = 10

  def closeness(s: SparkSession, dir: String): DataFrame =
    closenessOnEdges(tokenEdges(s, dir))

  /** Closeness + harmonic centrality from the [[ClosenessSeeds]]
    * highest-out-mass nodes (ties lexical — a total order, so the seed
    * set is engine-stable): level-synchronous BFS to depth
    * [[ClosenessMaxDepth]] over the directed unweighted token graph,
    * then per seed
    *
    *   closeness(s) = (|reached| − 1) / Σ_v d(s,v)
    *   harmonic(s)  = Σ_{v≠s} 1/d(s,v)
    *
    * — the freeman closeness beside its disconnection-robust harmonic
    * variant (harmonic degrades gracefully when the BFS ball doesn't
    * cover the graph; closeness of an isolated seed rides as NULL via
    * nullif on both engines). The 1/d terms are floor-rounded to 9 dp
    * and decimal-summed (order-free ⇒ engine-exact); the final
    * division micro-floors once.
    *
    * Scale shape: frontier/seen state is O(seeds·nodes) sharded by
    * seed — the [[betweennessOnEdges]] forward pass restricted to a
    * fixed seed frontier, which is exactly how it stays runnable at
    * 100 TB (the seed list shrinks the state linearly; the plan is
    * unchanged).
    */
  def closenessOnEdges(rawEdges: DataFrame,
      maxDepth: Int = ClosenessMaxDepth): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val edges = rawEdges.select($"src", $"dst").distinct().localCheckpoint()
    val seeds = rawEdges.groupBy($"src").agg(sum($"cnt").as("m"))
      .orderBy(desc("m"), $"src").limit(ClosenessSeeds)
      .select($"src".as("s")).localCheckpoint()
    var frontier = seeds.select($"s", $"s".as("v"), lit(0L).as("dist"))
    var seen = frontier.select($"s", $"v").localCheckpoint()
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    for (l <- 1 to maxDepth) {
      frontier = frontier.join(edges, $"v" === $"src")
        .select($"s", $"dst".as("v2"))
        .join(seen.select($"s", $"v".as("v2")), Seq("s", "v2"), "left_anti")
        .distinct()
        .select($"s", $"v2".as("v"), lit(l.toLong).as("dist"))
      seen = seen.union(frontier.select($"s", $"v"))
      if (l % 3 == 0) {
        frontier = frontier.localCheckpoint()
        seen = seen.localCheckpoint()
      }
      levels += frontier
    }
    levels.reduce(_ union _)
      .groupBy($"s")
      .agg(
        (count(lit(1)) - 1).as("n_reached"),
        sum($"dist").as("sum_dist"),
        sum(when($"dist" > 0,
          expr("CAST(floor(1.0 / dist * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9))")))
          .cast("double").as("harmonic"))
      .select($"s".as("word"), $"n_reached", $"sum_dist",
        expr("floor(n_reached / nullif(CAST(sum_dist AS DOUBLE), 0) * 1e6 + 0.5) / 1e6")
          .as("closeness"),
        $"harmonic")
  }

  /** DuckDB restatement: seed pick by the same total order, frontier
    * CTEs g1..gD with NOT-EXISTS dedupe (the [[betweennessSql]] forward
    * shape minus σ), per-seed rollup with identical rounding.
    */
  val closenessSql: String = {
    val fwd = (1 to ClosenessMaxDepth).map { l =>
      s"""g$l AS MATERIALIZED (
         |  SELECT DISTINCT f.s, e.dst AS v, CAST($l AS BIGINT) AS dist
         |  FROM g${l - 1} f JOIN ed e ON e.src = f.v
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM gseen${l - 1} x WHERE x.s = f.s AND x.v = e.dst)),
         |gseen$l AS MATERIALIZED (
         |  SELECT s, v FROM gseen${l - 1} UNION SELECT s, v FROM g$l)"""
        .stripMargin
    }.mkString(",\n")
    val lvlUnion = (0 to ClosenessMaxDepth)
      .map(l => s"SELECT s, v, dist FROM g$l").mkString(" UNION ALL ")
    s"""WITH $tokenEdgesCtes,
       |ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
       |seeds AS (
       |  SELECT src AS s FROM edges GROUP BY src
       |  ORDER BY sum(cnt) DESC, src LIMIT $ClosenessSeeds),
       |g0 AS (SELECT s, s AS v, CAST(0 AS BIGINT) AS dist FROM seeds),
       |gseen0 AS (SELECT s, v FROM g0),
       |$fwd
       |SELECT s AS word,
       |  CAST(count(*) - 1 AS BIGINT) AS n_reached,
       |  CAST(sum(dist) AS BIGINT) AS sum_dist,
       |  floor((count(*) - 1) / nullif(CAST(sum(dist) AS DOUBLE), 0)
       |    * 1e6 + 0.5) / 1e6 AS closeness,
       |  CAST(sum(CASE WHEN dist > 0 THEN
       |    CAST(floor(1.0 / dist * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9))
       |    END) AS DOUBLE) AS harmonic
       |FROM ($lvlUnion) u GROUP BY s""".stripMargin
  }

  def personalizedPagerank(s: SparkSession, dir: String): DataFrame =
    pprOnEdges(tokenEdges(s, dir))

  /** Personalized PageRank — the node-proximity primitive behind
    * related-item recommendation and local community scoring: the same
    * damped recurrence as [[pagerankOnEdges]], but ALL teleport mass
    * returns to one personalization seed (the highest-out-mass node,
    * ties lexical — a 1-row model artifact collected once), so the
    * stationary distribution concentrates around the seed's
    * neighborhood instead of scoring global centrality:
    *
    *   r₀(v)    = 1{v = seed}
    *   rₜ₊₁(v) = 0.15·1{v = seed} + 0.85 · Σ_{u→v} rₜ(u)·w_uv
    *
    * Same Pregel-on-DataFrames shape and decimal-summed contributions
    * as pagerank; both re-rounds use the floor(x·1e9+0.5)/1e9 idiom
    * (the `doc_lm_kn_nll` 10× lesson — native round(double, n) is a
    * cross-engine boundary hazard).
    */
  def pprOnEdges(rawEdges: DataFrame, iters: Int = Iters): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val edges = rawEdges.localCheckpoint()
    val outW = edges.groupBy($"src").agg(sum($"cnt").as("oc"))
    val weighted = edges.join(outW, "src")
      .select($"src", $"dst",
        ($"cnt".cast("double") / $"oc".cast("double")).as("w"))
      .localCheckpoint()
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst")).distinct().localCheckpoint()
    val seed = outW.orderBy($"oc".desc, $"src").limit(1)
      .select($"src").as[String].head().replace("'", "''")
    var ranks = nodes.select($"node",
      when($"node" === seed, lit(1.0)).otherwise(lit(0.0)).as("rank"))
    for (i <- 1 to iters) {
      val contribs = weighted.join(ranks, $"src" === $"node")
        .select($"dst", expr(
          "CAST(floor(rank * w * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9))").as("c"))
        .groupBy($"dst").agg(sum($"c").as("csum"))
      ranks = nodes.join(contribs, $"node" === $"dst", "left_outer")
        .select($"node", expr(
          s"""floor((CASE WHEN node = '$seed' THEN CAST(0.15 AS DOUBLE)
             |  ELSE CAST(0 AS DOUBLE) END
             |  + CAST(0.85 AS DOUBLE)
             |    * coalesce(CAST(csum AS DOUBLE), CAST(0 AS DOUBLE)))
             |  * 1e9 + 0.5) / 1e9""".stripMargin).as("ppr"))
        .select($"node", $"ppr".as("rank"))
      if (i % CkptEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select($"node", $"rank".as("ppr"))
  }

  /** DuckDB restatement: pagerank's edge CTEs, the seed pick, the
    * unrolled iterations with identical floor-idiom re-rounds.
    */
  val pprSql: String = {
    val base =
      s"""WITH toks AS (
         |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
         |edges AS (
         |  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT
         |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
         |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
         |    FROM toks WHERE len(t) >= 2)
         |  GROUP BY src, dst),
         |outw AS (SELECT src, sum(cnt) AS oc FROM edges GROUP BY src),
         |w AS (
         |  SELECT e.src, e.dst, CAST(e.cnt AS DOUBLE) / CAST(o.oc AS DOUBLE) AS w
         |  FROM edges e JOIN outw o ON e.src = o.src),
         |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
         |sd AS (SELECT src FROM outw ORDER BY oc DESC, src LIMIT 1),
         |rp0 AS (
         |  SELECT node,
         |    CASE WHEN node = (SELECT src FROM sd) THEN CAST(1 AS DOUBLE)
         |         ELSE CAST(0 AS DOUBLE) END AS rank
         |  FROM nodes)""".stripMargin
    val iters = (1 to Iters).map { i =>
      s"""rp$i AS (
         |  SELECT nd.node,
         |    floor((CASE WHEN nd.node = (SELECT src FROM sd)
         |        THEN CAST(0.15 AS DOUBLE)
         |      ELSE CAST(0 AS DOUBLE) END
         |      + CAST(0.85 AS DOUBLE)
         |        * coalesce(CAST(s.csum AS DOUBLE), CAST(0 AS DOUBLE)))
         |      * 1e9 + 0.5) / 1e9 AS rank
         |  FROM nodes nd LEFT JOIN (
         |    SELECT w.dst,
         |      sum(CAST(floor(r.rank * w.w * 1e9 + 0.5) / 1e9
         |        AS DECIMAL(18,9))) AS csum
         |    FROM w JOIN rp${i - 1} r ON w.src = r.node GROUP BY w.dst) s
         |    ON nd.node = s.dst)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$iters\nSELECT node, rank AS ppr FROM rp$Iters"
  }

  /** node2vec walk budget: walks per start node and steps per walk. */
  val N2vWalks = 2
  val N2vLen = 6

  /** Integer-scaled second-order bias multipliers (×4 so every weight
    * stays BIGINT): return (dst = prev) ×1 ≡ 1/p with p = 4; distance-1
    * (dst adjacent to prev) ×4 ≡ 1; exploration ×16 ≡ 1/q with
    * q = 0.25 — the DFS-leaning setting of Grover & Leskovec (KDD'16
    * §3.2.2; their α_pq with the common p > 1 > q choice).
    */
  val N2vReturnM = 1L
  val N2vNearM = 4L
  val N2vFarM = 16L

  def node2vec(s: SparkSession, dir: String): DataFrame =
    node2vecOnEdges(tokenEdges(s, dir))

  /** node2vec: SECOND-order biased random walks — [[randomWalksOnEdges]]
    * with the Grover–Leskovec α(prev, dst) multiplier on each out-edge
    * weight (discourage returning, encourage exploring), which is what
    * turns a DeepWalk corpus into a BFS/DFS-tunable one. Step 1 is
    * first-order (no prev); steps 2..L re-weight the current node's
    * out-edges by α and pick via the same salted md5-60 draw, located
    * in PER-WALK cumulative intervals computed by a window over the
    * candidate frame (the bias depends on prev, so intervals cannot be
    * precomputed per src — the window runs per step, partitioned by
    * the walk key, exactly the shape that shards by walk at 100 TB).
    * All weights are integer-scaled (×4) so cumulative bounds stay
    * BIGINT-exact on both engines; adjacency (distance-1 test) is a
    * left join against the undirected edge set. Deterministic end to
    * end — replayed by the oracle's unrolled step CTEs and the spec's
    * independent Scala walker.
    */
  def node2vecOnEdges(rawEdges: DataFrame): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val edges = rawEdges.localCheckpoint()
    val cum = Window.partitionBy($"src").orderBy($"dst")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outW = edges.groupBy($"src").agg(sum($"cnt").as("oc"))
    val intervals = edges
      .withColumn("hi", sum($"cnt").over(cum))
      .withColumn("lo", $"hi" - $"cnt")
      .join(outW, "src")
      .select($"src", $"dst", $"lo", $"hi", $"oc")
      .localCheckpoint()
    val und = edges.select($"src".as("au"), $"dst".as("av"))
      .union(edges.select($"dst".as("au"), $"src".as("av")))
      .distinct()
      .withColumn("adj", lit(1))
      .localCheckpoint()
    var frontier = edges.select($"src").distinct()
      .crossJoin(broadcast(s.range(0, N2vWalks).select($"id".as("wid"))))
      .select($"src".as("start"), $"wid", $"src".as("node"))
      .localCheckpoint()
    var out = frontier.select($"start", $"wid", lit(0L).as("step"), $"node")
    // step 1: first-order (identical pick rule to randomWalks, n2v salt)
    val r1 = conv(substring(md5(concat_ws(":",
      lit("n2v"), $"start", $"wid", lit(0), $"node")), 1, 15), 16, 10)
      .cast("long") % $"oc"
    var f2 = frontier.join(intervals, $"node" === $"src")
      .where(r1 >= $"lo" && r1 < $"hi")
      .select($"start", $"wid", $"node".as("prev"), $"dst".as("node"))
      .localCheckpoint()
    out = out.union(f2.select($"start", $"wid", lit(1L).as("step"), $"node"))
    val wlk = Window.partitionBy($"start", $"wid")
    val wcum = wlk.orderBy($"dst")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for (t <- 2 to N2vLen) {
      val cands = f2.join(edges, $"node" === $"src")
        .join(und, $"prev" === $"au" && $"dst" === $"av", "left")
        .withColumn("m",
          when($"dst" === $"prev", N2vReturnM)
            .when($"adj".isNotNull, N2vNearM).otherwise(N2vFarM))
        .withColumn("w", $"cnt" * $"m")
        .withColumn("hi", sum($"w").over(wcum))
        .withColumn("lo", $"hi" - $"w")
        .withColumn("tot", sum($"w").over(wlk))
      val r = conv(substring(md5(concat_ws(":",
        lit("n2v"), $"start", $"wid", lit(t - 1), $"node")), 1, 15), 16, 10)
        .cast("long") % $"tot"
      var next = cands.where(r >= $"lo" && r < $"hi")
        .select($"start", $"wid", $"node".as("prev"), $"dst".as("node"))
      if (t % 3 == 0) next = next.localCheckpoint()
      f2 = next
      out = out.union(f2.select($"start", $"wid", lit(t.toLong).as("step"), $"node"))
    }
    out
  }

  /** DuckDB restatement: unrolled step CTEs; per-walk window sums CAST
    * BIGINT (HUGEINT rule); identical α multipliers and md5-60 draws.
    */
  val node2vecSql: String = {
    val base =
      s"""WITH toks AS (
         |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
         |edges AS MATERIALIZED (
         |  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT
         |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
         |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
         |    FROM toks WHERE len(t) >= 2)
         |  GROUP BY src, dst),
         |outw AS (
         |  SELECT src, CAST(sum(cnt) AS BIGINT) AS oc FROM edges GROUP BY src),
         |iv AS MATERIALIZED (
         |  SELECT e.src, e.dst,
         |    CAST(sum(e.cnt) OVER (PARTITION BY e.src ORDER BY e.dst
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - e.cnt
         |      AS BIGINT) AS lo,
         |    CAST(sum(e.cnt) OVER (PARTITION BY e.src ORDER BY e.dst
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS hi,
         |    o.oc
         |  FROM edges e JOIN outw o ON e.src = o.src),
         |und AS MATERIALIZED (
         |  SELECT src AS au, dst AS av FROM edges
         |  UNION SELECT dst, src FROM edges),
         |n0 AS MATERIALIZED (
         |  SELECT src AS start, CAST(wid AS BIGINT) AS wid, src AS node
         |  FROM (SELECT DISTINCT src FROM edges)
         |  CROSS JOIN (SELECT unnest(range(0, $N2vWalks)) AS wid)),
         |n1 AS MATERIALIZED (
         |  SELECT start, wid, prev, node FROM (
         |    SELECT f.start, f.wid, f.node AS prev, i.dst AS node, i.lo, i.hi,
         |      CAST(('0x' || substring(md5('n2v:' || f.start
         |          || ':' || CAST(f.wid AS VARCHAR)
         |          || ':0:' || f.node), 1, 15)) AS BIGINT) % i.oc AS r
         |    FROM n0 f JOIN iv i ON i.src = f.node)
         |  WHERE r >= lo AND r < hi)""".stripMargin
    val steps = (2 to N2vLen).map { t =>
      s"""n$t AS MATERIALIZED (
         |  SELECT start, wid, cur AS prev, dst AS node FROM (
         |    SELECT start, wid, cur, dst, lo, hi, rh % tot AS r
         |    FROM (
         |      SELECT c.start, c.wid, c.cur, c.dst, c.rh,
         |        CAST(sum(c.w) OVER (PARTITION BY c.start, c.wid
         |          ORDER BY c.dst
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c.w
         |          AS BIGINT) AS lo,
         |        CAST(sum(c.w) OVER (PARTITION BY c.start, c.wid
         |          ORDER BY c.dst
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |          AS BIGINT) AS hi,
         |        CAST(sum(c.w) OVER (PARTITION BY c.start, c.wid)
         |          AS BIGINT) AS tot
         |      FROM (
         |        SELECT f.start, f.wid, f.node AS cur, e.dst,
         |          e.cnt * (CASE WHEN e.dst = f.prev THEN $N2vReturnM
         |            WHEN u.au IS NOT NULL THEN $N2vNearM
         |            ELSE $N2vFarM END) AS w,
         |          CAST(('0x' || substring(md5('n2v:' || f.start
         |              || ':' || CAST(f.wid AS VARCHAR)
         |              || ':${t - 1}:' || f.node), 1, 15)) AS BIGINT) AS rh
         |        FROM n${t - 1} f
         |        JOIN edges e ON e.src = f.node
         |        LEFT JOIN und u ON u.au = f.prev AND u.av = e.dst) c))
         |  WHERE r >= lo AND r < hi)""".stripMargin
    }.mkString(",\n")
    val rows = (s"SELECT start, wid, CAST(0 AS BIGINT) AS step, node FROM n0" +:
      (1 to N2vLen).map(t =>
        s"SELECT start, wid, CAST($t AS BIGINT) AS step, node FROM n$t"))
      .mkString(" UNION ALL ")
    s"$base,\n$steps\n$rows"
  }

  // ------------------------------------------- neighborhood function

  /** Propagation rounds for [[anf]] — must exceed the graph diameter
    * (≤ 6 on every fixture vintage; [[BetwMaxDepth]]'s spec bound
    * covers the same graph), so the last rounds are no-op fixpoints.
    */
  val AnfRounds = 8

  def anf(s: SparkSession, dir: String): DataFrame =
    anfOnEdges(tokenEdges(s, dir))

  /** Approximate neighborhood function by HLL-register propagation —
    * HyperANF (Boldi, Rosa & Vigna, WWW'11): per node, the HLL sketch
    * of ball(v, t) = {u : d(v,u) ≤ t}; one round max-merges each
    * node's registers with its out-neighbors' (register max is
    * exactly set union, the property that makes the sketch
    * composable), so after t rounds the registers ARE the t-ball's
    * sketch. N(t) = Σ_v est(v, t) is the neighborhood function whose
    * saturation point is the effective diameter — at 100 TB this is
    * THE way reach/diameter is measured (exact all-pairs BFS state is
    * |V|² and off the table; per-node register state here is O(V·m)
    * and every round is one equi-join + one max-aggregate, the
    * Pregel-with-mergeable-state shape).
    *
    * Engine-exactness: registers are the md5-60 integer kit
    * ([[Sketches.hllRowSignals]] — DuckDB reproduces every register
    * bit), per-node estimates round to 4 dp, and N(t) sums them as
    * DECIMAL(18,4) — order-free, so the curve compares exactly.
    */
  private[graft] def anfOnEdges(rawEdges: DataFrame,
      rounds: Int = AnfRounds): DataFrame = {
    val s = rawEdges.sparkSession
    import s.implicits._
    val edges = rawEdges.select($"src", $"dst").localCheckpoint()
    val nodes = edges.select($"src".as("node"))
      .union(edges.select($"dst")).distinct().localCheckpoint()
    val (idx, mv) = Sketches.hllRowSignals($"node")
    var regs = nodes.select($"node", idx.as("idx"), mv.as("m_val"))
      .localCheckpoint()
    def nfAt(t: Int, r: DataFrame): DataFrame =
      Sketches.hllFinalize(r, Seq("node"))
        .agg(sum($"hll_est".cast("decimal(18,4)")).cast("double").as("nf_est"))
        .select(lit(t.toLong).as("t"), $"nf_est")
    val curve = scala.collection.mutable.ArrayBuffer(nfAt(0, regs))
    for (t <- 1 to rounds) {
      regs = regs
        .unionByName(edges
          .join(regs.withColumnRenamed("node", "nbr"), $"dst" === $"nbr")
          .select($"src".as("node"), $"idx", $"m_val"))
        .groupBy($"node", $"idx").agg(max($"m_val").as("m_val"))
      if (t % 2 == 0) regs = regs.localCheckpoint()
      curve += nfAt(t, regs)
    }
    curve.reduce(_ unionByName _)
  }

  /** DuckDB restatement: register tables r0..rT unrolled as
    * MATERIALIZED CTEs (self ∪ out-neighbor max-merge per round), the
    * [[Sketches]] estimator per node, DECIMAL(18,4) rollup per t.
    */
  val anfSql: String = {
    import Sketches.{HllM, HllAlpha, HllRemMod, HllRemBits}
    val roundsSql = (1 to AnfRounds).map { t =>
      s"""r$t AS MATERIALIZED (
         |  SELECT node, idx, max(m_val) AS m_val FROM (
         |    SELECT node, idx, m_val FROM r${t - 1}
         |    UNION ALL
         |    SELECT e.src AS node, r.idx, r.m_val
         |    FROM edges e JOIN r${t - 1} r ON r.node = e.dst)
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    def estAt(t: Int): String =
      s"""SELECT CAST($t AS BIGINT) AS t,
         |  CAST(sum(CAST(round(CASE WHEN raw_est <= 2.5 * $HllM AND zeros > 0
         |    THEN CAST($HllM AS DOUBLE) * ln(CAST($HllM AS DOUBLE) / zeros)
         |    ELSE raw_est END, 4) AS DECIMAL(18,4))) AS DOUBLE) AS nf_est
         |FROM (
         |  SELECT node, $HllM - count(*) AS zeros,
         |    CAST($HllAlpha AS DOUBLE) * $HllM * $HllM /
         |      (CAST(sum(CAST(round(pow(2.0, -m_val), 18) AS DECIMAL(38,18)))
         |         AS DOUBLE) + ($HllM - count(*))) AS raw_est
         |  FROM r$t GROUP BY node)""".stripMargin
    val curve = (0 to AnfRounds).map(estAt).mkString(" UNION ALL ")
    s"""WITH toks AS (
       |  SELECT ${TextOps.duckTokensExpr} AS t FROM documents),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT
       |      unnest(list_transform(range(1, len(t)), i -> t[i])) AS src,
       |      unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS dst
       |    FROM toks WHERE len(t) >= 2)),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |r0 AS MATERIALIZED (
       |  SELECT node, hv // $HllRemMod AS idx,
       |    max(CASE WHEN hv % $HllRemMod = 0 THEN 49
       |        ELSE ${HllRemBits + 1} - length(bin(hv % $HllRemMod)) END)
       |      AS m_val
       |  FROM (
       |    SELECT node,
       |      CAST('0x' || substr(md5(node), 1, 15) AS BIGINT) AS hv
       |    FROM nodes)
       |  GROUP BY 1, 2),
       |$roundsSql
       |$curve""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_textrank" -> (textrank _),
    "graph_anf" -> (anf _),
    "graph_closeness" -> (closeness _),
    "graph_node2vec" -> (node2vec _),
    "graph_ppr" -> (personalizedPagerank _),
    "graph_betweenness" -> (betweenness _),
    "graph_betweenness_approx" -> (betweennessApprox _),
    "graph_random_walks" -> (randomWalks _),
    "graph_mst" -> (maxSpanningTree _),
    "graph_single_linkage" -> (singleLinkage _),
    "graph_labelprop" -> (labelProp _),
    "graph_sssp" -> (sssp _),
    "graph_modularity" -> (modularity _),
    "graph_assortativity" -> (assortativity _),
    "graph_local_clustering" -> (localClustering _),
    "graph_kcore" -> (kcore _),
    "graph_bfs" -> (bfs _),
    "graph_pagerank" -> (pagerank _),
    "graph_triangles" -> (triangles _),
    "graph_neighbor_jaccard" -> (neighborSimilarity _),
    "graph_adamic_adar" -> (adamicAdar _),
    "graph_hits" -> (hits _))

  def oracles: Map[String, String] = Map(
    "graph_anf" -> anfSql,
    "graph_node2vec" -> node2vecSql,
    "graph_ppr" -> pprSql,
    "graph_betweenness" -> betweennessSql,
    "graph_betweenness_approx" -> betweennessApproxSql,
    "graph_random_walks" -> randomWalksSql,
    "graph_mst" -> maxSpanningTreeSql,
    "graph_single_linkage" -> singleLinkageSql,
    "graph_labelprop" -> labelPropSql,
    "graph_sssp" -> ssspSql,
    "graph_modularity" -> modularitySql,
    "graph_assortativity" -> assortativitySql,
    "graph_local_clustering" -> localClusteringSql,
    "graph_kcore" -> kcoreSql,
    "graph_bfs" -> bfsSql,
    "graph_pagerank" -> pagerankSql,
    "graph_triangles" -> trianglesSql,
    "graph_neighbor_jaccard" -> neighborSimilaritySql,
    "graph_adamic_adar" -> adamicAdarSql,
    "graph_hits" -> hitsSql,
    "doc_textrank" -> textrankSql,
    "graph_closeness" -> closenessSql)
}
