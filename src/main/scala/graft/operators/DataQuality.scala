package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality expectation checks — the admission gate a training-data
  * pipeline runs before anything is allowed into the corpus: null and
  * range violations, key uniqueness, domain membership, and
  * derived-column consistency, each as a single map-side-combinable
  * aggregation pass (one scan per table, one 1-row result — the shape
  * that still costs one pass at 100 TB).
  */
object DataQuality {

  /** Events expectations: key uniqueness, null/negative rates, event
    * type domain membership, timestamp bounds sanity.
    */
  def dqEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir).agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - countDistinct($"event_id")).as("dup_event_ids"),
      sum(when($"user_id".isNull, 1L).otherwise(0L)).as("null_user"),
      sum(when($"value".isNull, 1L).otherwise(0L)).as("null_value"),
      sum(when($"value" < 0, 1L).otherwise(0L)).as("neg_value"),
      sum(when($"event_type".isin("click", "view", "purchase", "error"), 0L)
        .otherwise(1L)).as("bad_type"),
      // bounds at µs: the finest granularity both engines read
      // identically from the nanos parquet column
      min(expr("ts_ns div 1000")).as("min_ts_us"),
      max(expr("ts_ns div 1000")).as("max_ts_us"))
  }

  val dqEventsSql: String =
    """SELECT count(*) AS n_rows,
      |  CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS dup_event_ids,
      |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user,
      |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
      |  CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_value,
      |  CAST(sum(CASE WHEN event_type IN ('click','view','purchase','error')
      |           THEN 0 ELSE 1 END) AS BIGINT) AS bad_type,
      |  min(epoch_us(ts)) AS min_ts_us,
      |  max(epoch_us(ts)) AS max_ts_us
      |FROM events""".stripMargin

  /** Documents expectations: id uniqueness, empty/whitespace text,
    * lang-domain membership, and the n_chars = length(text) derived-
    * column consistency contract.
    */
  def dqDocuments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - countDistinct($"doc_id")).as("dup_doc_ids"),
      sum(when($"text".isNull || length(trim($"text")) === 0, 1L)
        .otherwise(0L)).as("blank_text"),
      sum(when($"lang".isin("en", "de", "fr", "es", "zh"), 0L)
        .otherwise(1L)).as("bad_lang"),
      sum(when($"n_chars" =!= length($"text"), 1L).otherwise(0L))
        .as("n_chars_mismatch"))
  }

  val dqDocumentsSql: String =
    """SELECT count(*) AS n_rows,
      |  CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS dup_doc_ids,
      |  CAST(sum(CASE WHEN text IS NULL OR length(trim(text)) = 0
      |           THEN 1 ELSE 0 END) AS BIGINT) AS blank_text,
      |  CAST(sum(CASE WHEN lang IN ('en','de','fr','es','zh')
      |           THEN 0 ELSE 1 END) AS BIGINT) AS bad_lang,
      |  CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_chars_mismatch
      |FROM documents""".stripMargin

  /** Embedding-table expectations: id uniqueness, vector-dimension
    * uniformity (every index pipeline assumes ONE dim), null/NaN
    * element screening, and label-domain size — the gate that runs
    * before any ANN index build at scale (a single ragged or NaN
    * vector poisons a distance kernel silently).
    */
  def dqEmbeddings(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir).agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - countDistinct($"vec_id")).as("dup_vec_ids"),
      // dims only over non-null vectors: Spark's size(NULL) is -1 under
      // the legacy sizeOfNull default while DuckDB's len(NULL) is NULL
      // (ignored by count/min) — a null vector is null_vecs' job, and it
      // must not skew the dimension stats on either engine
      countDistinct(when($"embedding".isNotNull, size($"embedding")))
        .as("n_distinct_dims"),
      min(when($"embedding".isNotNull, size($"embedding"))).as("min_dim"),
      sum(when($"embedding".isNull, 1L).otherwise(0L)).as("null_vecs"),
      sum(expr(
        "CASE WHEN exists(embedding, x -> isnan(x) OR x IS NULL) THEN 1 ELSE 0 END"))
        .as("nan_vecs"),
      countDistinct($"label").as("n_labels"))
  }

  val dqEmbeddingsSql: String =
    """SELECT count(*) AS n_rows,
      |  CAST(count(*) - count(DISTINCT vec_id) AS BIGINT) AS dup_vec_ids,
      |  count(DISTINCT len(embedding)) AS n_distinct_dims,
      |  CAST(min(len(embedding)) AS INT) AS min_dim,
      |  CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS null_vecs,
      |  CAST(sum(CASE WHEN len(list_filter(embedding,
      |      x -> isnan(x) OR x IS NULL)) > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS nan_vecs,
      |  count(DISTINCT label) AS n_labels
      |FROM embeddings""".stripMargin

  /** ANALYZE-style table profile — the stats-collection pass a
    * cost-based optimizer (and every data catalog) needs, as ONE scan:
    * per column of `lineitem`, null count, exact distinct count, and
    * min/max (stringified into one uniform schema). All per-column
    * aggregates compute in a single wide aggregation (Spark plans the
    * multi-distinct via expand — still one scan, map-side partial), then
    * unpivot to one row per column via a literal stack. At 100 TB the
    * exact distincts swap for the KMV/HLL sketches above — same one-scan
    * shape, bounded state; the oracle here pins the exact contract.
    */
  def dqTableProfile(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus")
    val li = Tables.lineitem(s, dir)
    // one single-column aggregate per column, unioned — NOT one wide
    // multi-distinct aggregate: N distincts in one agg plan via Expand,
    // multiplying every row N× before the shuffle (measured 14.8 s vs
    // 1.9 s at sf0.1). Columnar scans make the per-column passes read
    // the same total bytes (each ReadSchema prunes to its one column),
    // each single-distinct aggregate stays the partial+final two-phase
    // shape, and the N passes parallelize as independent stages.
    cols.map { c =>
      li.select(col(c))
        .agg(count(lit(1)).minus(count(col(c))).cast("long").as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("col_name"), col("n_nulls"), col("n_distinct"),
          col("min_val"), col("max_val"))
    }.reduce(_ unionAll _)
  }

  val dqTableProfileSql: String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus")
    cols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val,
         |  CAST(max($c) AS VARCHAR) AS max_val
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  /** Referential-integrity audit across the star schema's foreign keys
    * — the pre-flight check a pipeline runs before trusting joins:
    * per FK edge, child rows, orphaned child rows (no matching parent),
    * and distinct orphaned keys. Each edge is ONE left-anti-shaped
    * aggregate: a child-side partial aggregate on the FK (shuffle
    * bounded by distinct keys, not rows) left-joined to the parent key
    * set, so the fact table is never shuffled whole; edges union into
    * one small report frame. Clean fixtures report zeros — the value is
    * the contract (the 10× replica harness and any real ingest run the
    * same audit, where nonzero rows mean key-offset bugs).
    */
  def dqReferential(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def edge(name: String, child: DataFrame, fk: String,
        parent: DataFrame, pk: String): DataFrame = {
      val keyed = child.groupBy(col(fk).as("k"))
        .agg(count(lit(1)).as("child_rows"))
      keyed.join(parent.select(col(pk).as("k"), lit(1).as("hit")),
          Seq("k"), "left")
        .agg(sum($"child_rows").as("n_child"),
          coalesce(sum(when($"hit".isNull, $"child_rows")), lit(0L))
            .as("n_orphan_rows"),
          // null FKs count as orphan ROWS, but a null key is not a
          // distinct orphan KEY (mirrors count(DISTINCT CASE...) which
          // ignores NULL on the oracle side)
          coalesce(count(when($"hit".isNull && $"k".isNotNull, 1)), lit(0L))
            .as("n_orphan_keys"))
        .select(lit(name).as("fk_edge"), $"n_child", $"n_orphan_rows",
          $"n_orphan_keys")
    }
    val (c, o, l, su, p, n) = (Tables.customer(s, dir), Tables.orders(s, dir),
      Tables.lineitem(s, dir), Tables.supplier(s, dir), Tables.part(s, dir),
      Tables.nation(s, dir))
    edge("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey")
      .unionAll(edge("lineitem.l_orderkey->orders", l, "l_orderkey", o, "o_orderkey"))
      .unionAll(edge("lineitem.l_partkey->part", l, "l_partkey", p, "p_partkey"))
      .unionAll(edge("lineitem.l_suppkey->supplier", l, "l_suppkey", su, "s_suppkey"))
      .unionAll(edge("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"))
      .unionAll(edge("supplier.s_nationkey->nation", su, "s_nationkey", n, "n_nationkey"))
  }

  val dqReferentialSql: String =
    """SELECT * FROM (
      |  SELECT 'orders.o_custkey->customer' AS fk_edge,
      |    CAST(count(*) AS BIGINT) AS n_child,
      |    CAST(count(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS BIGINT)
      |      AS n_orphan_rows,
      |    CAST(count(DISTINCT CASE WHEN c.c_custkey IS NULL
      |      THEN o.o_custkey END) AS BIGINT) AS n_orphan_keys
      |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |  UNION ALL
      |  SELECT 'lineitem.l_orderkey->orders',
      |    CAST(count(*) AS BIGINT),
      |    CAST(count(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS BIGINT),
      |    CAST(count(DISTINCT CASE WHEN o.o_orderkey IS NULL
      |      THEN l.l_orderkey END) AS BIGINT)
      |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  UNION ALL
      |  SELECT 'lineitem.l_partkey->part',
      |    CAST(count(*) AS BIGINT),
      |    CAST(count(CASE WHEN p.p_partkey IS NULL THEN 1 END) AS BIGINT),
      |    CAST(count(DISTINCT CASE WHEN p.p_partkey IS NULL
      |      THEN l.l_partkey END) AS BIGINT)
      |  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |  UNION ALL
      |  SELECT 'lineitem.l_suppkey->supplier',
      |    CAST(count(*) AS BIGINT),
      |    CAST(count(CASE WHEN s.s_suppkey IS NULL THEN 1 END) AS BIGINT),
      |    CAST(count(DISTINCT CASE WHEN s.s_suppkey IS NULL
      |      THEN l.l_suppkey END) AS BIGINT)
      |  FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  UNION ALL
      |  SELECT 'customer.c_nationkey->nation',
      |    CAST(count(*) AS BIGINT),
      |    CAST(count(CASE WHEN n.n_nationkey IS NULL THEN 1 END) AS BIGINT),
      |    CAST(count(DISTINCT CASE WHEN n.n_nationkey IS NULL
      |      THEN c.c_nationkey END) AS BIGINT)
      |  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  UNION ALL
      |  SELECT 'supplier.s_nationkey->nation',
      |    CAST(count(*) AS BIGINT),
      |    CAST(count(CASE WHEN n.n_nationkey IS NULL THEN 1 END) AS BIGINT),
      |    CAST(count(DISTINCT CASE WHEN n.n_nationkey IS NULL
      |      THEN s.s_nationkey END) AS BIGINT)
      |  FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey)""".stripMargin

  /** Distribution drift between time periods — the PSI (population
    * stability index) monitor every production pipeline runs on its
    * numeric features: event values binned into 10 fixed-width buckets,
    * reference period (first half of the timeline) vs current period
    * (second half), per-bin PSI terms (p−q)·ln(p/q) with add-one
    * smoothing so empty bins stay defined and the arithmetic stays a
    * pure function of the integer counts. Fixed-width bins (not
    * quantile edges) keep the bin assignment an exact integer map on
    * both engines. ONE scan feeds a map-side-combinable per-bin
    * aggregate carrying both period counters (conditional sums on the
    * timestamp); the shared [[driftFromBinCounts]] finalize scaffolds
    * the 10-bin support and closes empty bins on both sides.
    */
  /** Reference/current period boundary (2024-01-15T00:00:00Z, nanos)
    * and the fixed bin width — shared by the batch query and the
    * streaming monitor so both observe the identical bin map.
    */
  private[graft] val DriftSplitNs = 1705276800000000000L
  private[graft] val DriftBinW = 40.0

  def dqValueDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.events(s, dir)
      .select($"ts_ns", least(lit(9L),
        floor($"value" / DriftBinW).cast("long")).as("bin"))
      .groupBy($"bin").agg(
        sum(when($"ts_ns" < DriftSplitNs, 1L).otherwise(0L)).as("n_ref"),
        sum(when($"ts_ns" >= DriftSplitNs, 1L).otherwise(0L)).as("n_cur"))
    driftFromBinCounts(counts)
  }

  /** PSI finalize from a sparse per-bin counts frame `(bin, n_ref,
    * n_cur)` — shared VERBATIM by the batch query above and
    * `stream_value_drift` (whose drained update-mode state IS such a
    * frame). Scaffolds the fixed 10-bin support so empty bins stay
    * present, re-derives the period totals from the counts (every
    * event lands in exactly one bin, so Σ per-bin counts ≡ the period
    * totals the previous formulation computed from the raw scan — one
    * fewer pass), and emits the add-one-smoothed per-bin PSI terms.
    * The totals frame is the approved 1-row broadcast cross.
    */
  private[graft] def driftFromBinCounts(counts: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    val bins = s.range(0, 10).select($"id".as("bin"))
    val tot = counts.agg(
      coalesce(sum($"n_ref"), lit(0L)).as("tr"),
      coalesce(sum($"n_cur"), lit(0L)).as("tc"))
    bins.join(counts, Seq("bin"), "left")
      .select($"bin", coalesce($"n_ref", lit(0L)).as("n_ref"),
        coalesce($"n_cur", lit(0L)).as("n_cur"))
      .crossJoin(broadcast(tot))
      .selectExpr("bin", "n_ref", "n_cur",
        """round((CAST(n_ref + 1 AS DOUBLE) / (tr + 10)
          |      - CAST(n_cur + 1 AS DOUBLE) / (tc + 10))
          |  * ln((CAST(n_ref + 1 AS DOUBLE) / (tr + 10))
          |      / (CAST(n_cur + 1 AS DOUBLE) / (tc + 10))), 9)
          | AS psi_term""".stripMargin)
  }

  val dqValueDriftSql: String =
    """WITH ev AS (
      |  SELECT epoch_us(ts) * 1000 AS ts_ns,
      |    least(9, CAST(floor("value" / 40.0) AS BIGINT)) AS bin
      |  FROM events),
      |ref AS (
      |  SELECT bin, count(*) AS n_ref FROM ev
      |  WHERE ts_ns < 1705276800000000000 GROUP BY bin),
      |cur AS (
      |  SELECT bin, count(*) AS n_cur FROM ev
      |  WHERE ts_ns >= 1705276800000000000 GROUP BY bin),
      |tot AS (
      |  SELECT CAST(sum(CASE WHEN ts_ns < 1705276800000000000
      |           THEN 1 ELSE 0 END) AS BIGINT) AS tr,
      |    CAST(sum(CASE WHEN ts_ns >= 1705276800000000000
      |           THEN 1 ELSE 0 END) AS BIGINT) AS tc
      |  FROM ev),
      |bins AS (SELECT unnest(range(0, 10)) AS bin)
      |SELECT b.bin, CAST(coalesce(r.n_ref, 0) AS BIGINT) AS n_ref,
      |  CAST(coalesce(c.n_cur, 0) AS BIGINT) AS n_cur,
      |  round((CAST(coalesce(r.n_ref, 0) + 1 AS DOUBLE) / (t.tr + 10)
      |       - CAST(coalesce(c.n_cur, 0) + 1 AS DOUBLE) / (t.tc + 10))
      |    * ln((CAST(coalesce(r.n_ref, 0) + 1 AS DOUBLE) / (t.tr + 10))
      |        / (CAST(coalesce(c.n_cur, 0) + 1 AS DOUBLE) / (t.tc + 10))), 9)
      |    AS psi_term
      |FROM bins b
      |LEFT JOIN ref r ON r.bin = b.bin
      |LEFT JOIN cur c ON c.bin = b.bin
      |CROSS JOIN tot t""".stripMargin

  /** Embedding-space drift monitor — the PSI discipline of
    * [[dqValueDrift]] lifted to the EMBEDDING collection (the ML-ops
    * check a feature-store/retrieval pipeline runs when the encoder or
    * upstream corpus shifts): distance-to-global-centroid as the 1-D
    * drift statistic, reference = the id-median older half of the
    * collection, bins = the reference distribution's own deciles
    * (exact `percentile` ↔ `quantile_cont` edges — equal-mass by
    * construction, so any psi_term structure IS drift), add-one
    * smoothed per-bin PSI terms. The centroid is an exact decimal
    * per-dim mean (the k-means update idiom) collected once as a
    * 65-double artifact; distances are sequential squared folds
    * (engine-exact); the decile edge frame and totals are the approved
    * 1-row broadcasts.
    */
  def dqEmbeddingDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
    // exact per-dim decimal mean, floor-idiom re-round (KMeans.update)
    val cent = emb
      .select(posexplode($"embedding").as(Seq("dim", "ev")))
      .groupBy($"dim")
      .agg((floor((sum(floor($"ev".cast("double") * 1e6 + 0.5)
          .cast("decimal(18,0)")).cast("double") / count(lit(1))) + 0.5)
        / 1e6).as("mv"))
      .orderBy($"dim").select($"mv").as[Double].collect()
    val centLit = cent.map(x => s"${x}D").mkString("array(", ", ", ")")
    val dists = emb.selectExpr("vec_id",
      s"""aggregate(zip_with(embedding, $centLit,
         |  (a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)),
         |  CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS dist""".stripMargin)
    val medId = dists.agg(expr("percentile(vec_id, 0.5)").as("mid"))
    val flagged = dists.crossJoin(broadcast(medId))
      .withColumn("is_ref", $"vec_id" <= $"mid")
    val edgeAggs = (1 to 9).map(d =>
      expr(s"percentile(dist, 0.$d)").as(s"e$d"))
    val edges = flagged.where($"is_ref")
      .agg(edgeAggs.head, edgeAggs.tail: _*)
    val binExpr = (1 to 9)
      .map(d => s"(CASE WHEN dist > e$d THEN 1 ELSE 0 END)").mkString(" + ")
    val counts = flagged.crossJoin(broadcast(edges))
      .selectExpr("is_ref", s"CAST($binExpr AS BIGINT) AS bin")
      .groupBy($"bin").agg(
        sum(when($"is_ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("n_cur"))
    driftFromBinCounts(counts)
  }

  /** Oracle: identical centroid arithmetic RE-DERIVED from the table
    * (exact decimal ops ⇒ same doubles as the collected artifact),
    * same folds, edges, and PSI finalize.
    */
  val dqEmbeddingDriftSql: String = {
    val edgeList = (1 to 9).map(d => s"0.$d").mkString("[", ", ", "]")
    val binExpr = (1 to 9)
      .map(d => s"(CASE WHEN dist > e[$d] THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH ex AS (
       |  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS dim,
       |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS ev
       |  FROM embeddings),
       |cent AS MATERIALIZED (
       |  SELECT dim,
       |    floor((CAST(sum(CAST(floor(ev * 1e6 + 0.5) AS DECIMAL(18,0)))
       |      AS DOUBLE) / count(*)) + 0.5) / 1e6 AS mv
       |  FROM ex GROUP BY dim),
       |cvec AS (
       |  SELECT list(mv ORDER BY dim) AS cv FROM cent),
       |dists AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(range(1, len(embedding) + 1),
       |        i -> (CAST(embedding[i] AS DOUBLE) - cv[i])
       |           * (CAST(embedding[i] AS DOUBLE) - cv[i]))),
       |      (a, b) -> a + b) AS dist
       |  FROM embeddings CROSS JOIN cvec),
       |mid AS (SELECT quantile_cont(vec_id, 0.5) AS mid FROM dists),
       |fl AS (
       |  SELECT vec_id, dist, vec_id <= mid AS is_ref
       |  FROM dists CROSS JOIN mid),
       |ed AS (
       |  SELECT quantile_cont(dist, $edgeList) AS e FROM fl WHERE is_ref),
       |cnts AS (
       |  SELECT CAST($binExpr AS BIGINT) AS bin,
       |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
       |    CAST(sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_cur
       |  FROM fl CROSS JOIN ed GROUP BY 1),
       |tot AS (
       |  SELECT CAST(coalesce(sum(n_ref), 0) AS BIGINT) AS tr,
       |    CAST(coalesce(sum(n_cur), 0) AS BIGINT) AS tc
       |  FROM cnts),
       |bins AS (SELECT unnest(range(0, 10)) AS bin)
       |SELECT b.bin, CAST(coalesce(c.n_ref, 0) AS BIGINT) AS n_ref,
       |  CAST(coalesce(c.n_cur, 0) AS BIGINT) AS n_cur,
       |  round((CAST(coalesce(c.n_ref, 0) + 1 AS DOUBLE) / (t.tr + 10)
       |       - CAST(coalesce(c.n_cur, 0) + 1 AS DOUBLE) / (t.tc + 10))
       |    * ln((CAST(coalesce(c.n_ref, 0) + 1 AS DOUBLE) / (t.tr + 10))
       |        / (CAST(coalesce(c.n_cur, 0) + 1 AS DOUBLE) / (t.tc + 10))), 9)
       |    AS psi_term
       |FROM bins b
       |LEFT JOIN cnts c ON c.bin = b.bin
       |CROSS JOIN tot t""".stripMargin
  }

  /** Benford first-digit probabilities log₁₀(1 + 1/d), d = 1..9,
    * computed ONCE on the JVM, rounded to 6 dp, and embedded as double
    * literals in the generated oracle (the centroid-embedding pattern —
    * and like every embedded double in this repo they are PRE-ROUNDED:
    * a full-precision 17-digit literal goes through DuckDB's
    * DECIMAL→DOUBLE cast whose int/10^k division double-rounds once the
    * numerator exceeds 2⁵³, landing 1 ulp off the JVM value; a 6-dp
    * numerator is exact). No cross-engine log10 anywhere.
    */
  private val benfordP: IndexedSeq[Double] =
    (1 to 9).map(d =>
      math.floor(math.log10(1 + 1.0 / d) * 1e6 + 0.5) / 1e6)

  /** Benford first-digit drift on `l_extendedprice` — the classic
    * fabricated/corrupted-numeric-data screen: naturally occurring
    * multiplicative amounts follow log₁₀(1+1/d) first-digit frequencies
    * and synthetic or truncated feeds don't, so per-digit χ² terms
    * localize WHICH digits drifted (a uniform generator shows up as
    * depressed 1s and inflated 7–9s). One narrow digit-extraction map +
    * a 9-key aggregate + two tiny joins.
    *
    * Determinism: the first digit comes from `floor(price)` (exact on
    * integral doubles in both engines) stringified — never from
    * `CAST(double AS BIGINT)`, whose truncate-vs-round semantics differ
    * across engines, and never from log10 digit math. Expected
    * frequencies are embedded literals; each χ² term is a fixed chain
    * of IEEE ops on (int, int, literal), floor-rounded 6 dp.
    */
  def dqBenford(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val obs = Tables.lineitem(s, dir)
      .where($"l_extendedprice" >= 1)
      .selectExpr("""CAST(substring(CAST(CAST(floor(l_extendedprice) AS BIGINT)
        | AS STRING), 1, 1) AS BIGINT) AS digit""".stripMargin)
      .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
    val probs = benfordP.zipWithIndex
      .map { case (p, i) => ((i + 1).toLong, p) }.toDF("digit", "exp_p")
    val tot = obs.agg(sum($"n_obs").as("n"))
    obs.join(probs, Seq("digit"))
      .crossJoin(broadcast(tot))
      .selectExpr("digit", "n_obs", "exp_p",
        """floor((CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * exp_p)
          |  * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * exp_p)
          |  / (CAST(n AS DOUBLE) * exp_p) * 1e6 + 0.5) / 1e6
          |  AS chi2_term""".stripMargin)
  }

  val dqBenfordSql: String = {
    val probRows = benfordP.zipWithIndex
      .map { case (p, i) => s"(${i + 1}, ${p}::DOUBLE)" }.mkString(", ")
    s"""WITH probs(digit, exp_p) AS (VALUES $probRows),
       |digits AS (
       |  SELECT CAST(substring(CAST(CAST(floor(l_extendedprice) AS BIGINT)
       |    AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM lineitem WHERE l_extendedprice >= 1),
       |obs AS (SELECT digit, count(*) AS n_obs FROM digits GROUP BY digit),
       |tot AS (SELECT sum(n_obs) AS n FROM obs)
       |SELECT o.digit, CAST(o.n_obs AS BIGINT) AS n_obs, p.exp_p,
       |  floor((CAST(o.n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p.exp_p)
       |    * (CAST(o.n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p.exp_p)
       |    / (CAST(n AS DOUBLE) * p.exp_p) * 1e6 + 0.5) / 1e6 AS chi2_term
       |FROM obs o JOIN probs p ON p.digit = o.digit CROSS JOIN tot""".stripMargin
  }

  /** Diagonal-covariance Mahalanobis outlier scores over the embedding
    * collection — the model-free GLOBAL outlier screen beside
    * `sim_ood_knn`'s local neighborhood-isolation score and
    * [[dqEmbeddingDrift]]'s distribution-shift monitor: standardize
    * each dimension by the collection's own mean/variance and rank
    * vectors by Σ_d (x_d − μ_d)²/σ²_d (top 20, ties by vec_id).
    *
    * Exactness: μ_d is the exact-decimal 6-dp mean (the
    * [[dqEmbeddingDrift]]/KMeans idiom); σ²_d sums 9-dp-floored
    * squared deviations as DECIMAL(18,9) (order-free) before ONE
    * division + 6-dp floor; the per-vector score is a SEQUENTIAL fold
    * over dimensions (identical order both engines), zero-variance
    * dims contribute 0. Spark collects the 2·|dims| model artifact
    * once and ships it as array literals; the oracle re-derives the
    * identical decimal arithmetic in CTEs.
    *
    * Scale: two corpus scans (moment pass + score pass) and a top-k —
    * the 100 TB plan is scan-bound with a 20-row result; the model
    * artifact is O(dims), never the collection.
    */
  def dqEmbeddingOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
    val moments = emb
      .select(posexplode($"embedding").as(Seq("dim", "ev")))
      .groupBy($"dim")
      .agg(
        (floor((sum(floor($"ev".cast("double") * 1e6 + 0.5)
            .cast("decimal(18,0)")).cast("double") / count(lit(1))) + 0.5)
          / 1e6).as("mv"),
        count(lit(1)).as("n"))
    val mu = moments.orderBy($"dim").select($"mv").as[Double].collect()
    val muLit = mu.map(x => s"${x}D").mkString("array(", ", ", ")")
    val vars = emb
      .select(posexplode($"embedding").as(Seq("dim", "ev")))
      .select($"dim",
        (floor($"ev".cast("double") * 1e6 + 0.5) / 1e6).as("qv"))
      .withColumn("mu", expr(s"element_at($muLit, dim + 1)"))
      .groupBy($"dim")
      .agg((floor((sum(expr(
          "CAST(floor((qv - mu) * (qv - mu) * 1e9 + 0.5) / 1e9 " +
            "AS DECIMAL(18,9))")).cast("double") / count(lit(1)))
          * 1e6 + 0.5) / 1e6).as("vv"))
      .orderBy($"dim").select($"vv").as[Double].collect()
    val varLit = vars.map(x => s"${x}D").mkString("array(", ", ", ")")
    emb.selectExpr("vec_id",
      s"""floor(aggregate(sequence(1, size(embedding)),
         |  CAST(0 AS DOUBLE),
         |  (acc, i) -> acc + (CASE WHEN element_at($varLit, i) = 0
         |    THEN CAST(0 AS DOUBLE)
         |    ELSE (floor(CAST(element_at(embedding, i) AS DOUBLE) * 1e6 + 0.5) / 1e6
         |        - element_at($muLit, i))
         |      * (floor(CAST(element_at(embedding, i) AS DOUBLE) * 1e6 + 0.5) / 1e6
         |        - element_at($muLit, i))
         |      / element_at($varLit, i) END)) * 1e6 + 0.5) / 1e6
         |  AS maha_sq""".stripMargin)
      .orderBy(desc("maha_sq"), $"vec_id")
      .limit(20)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("maha_sq"), $"vec_id")).cast("long"))
  }

  /** Oracle: identical decimal moment arithmetic re-derived in CTEs,
    * the same sequential fold via list_prepend + list_reduce.
    */
  val dqEmbeddingOutliersSql: String =
    """WITH ex AS (
      |  SELECT vec_id, unnest(range(1, len(embedding) + 1)) AS dim,
      |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS ev
      |  FROM embeddings),
      |mom AS MATERIALIZED (
      |  SELECT dim,
      |    floor((CAST(sum(CAST(floor(ev * 1e6 + 0.5) AS DECIMAL(18,0)))
      |      AS DOUBLE) / count(*)) + 0.5) / 1e6 AS mv
      |  FROM ex GROUP BY dim),
      |vr AS MATERIALIZED (
      |  SELECT e.dim,
      |    floor((CAST(sum(CAST(floor(
      |        (floor(e.ev * 1e6 + 0.5) / 1e6 - m.mv)
      |        * (floor(e.ev * 1e6 + 0.5) / 1e6 - m.mv) * 1e9 + 0.5) / 1e9
      |      AS DECIMAL(18,9))) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6
      |      AS vv
      |  FROM ex e JOIN mom m ON m.dim = e.dim GROUP BY e.dim),
      |mvec AS (SELECT list(mv ORDER BY dim) AS mu FROM mom),
      |vvec AS (SELECT list(vv ORDER BY dim) AS vv FROM vr),
      |scored AS MATERIALIZED (
      |  SELECT vec_id,
      |    floor(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(range(1, len(embedding) + 1),
      |        i -> CASE WHEN vv[i] = 0 THEN CAST(0 AS DOUBLE)
      |          ELSE (floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) / 1e6
      |              - mu[i])
      |            * (floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) / 1e6
      |              - mu[i])
      |            / vv[i] END)),
      |      (a, b) -> a + b) * 1e6 + 0.5) / 1e6 AS maha_sq
      |  FROM embeddings CROSS JOIN mvec CROSS JOIN vvec)
      |SELECT vec_id, maha_sq,
      |  CAST(row_number() OVER (ORDER BY maha_sq DESC, vec_id) AS BIGINT)
      |    AS rn
      |FROM scored ORDER BY maha_sq DESC, vec_id LIMIT 20""".stripMargin

  /** Re-identification bar for [[dqKAnonymity]]: an equivalence class
    * smaller than this is a privacy risk (the conventional k = 5).
    */
  val KAnonRiskK = 5L

  /** K-anonymity census over the customer table — the privacy-risk
    * audit a data-governance gate runs before records feed a training
    * corpus: generalize the quasi-identifiers (nation, market segment,
    * account-balance band of width 1000 — floor'd, so negative
    * balances band correctly), group into equivalence classes, and
    * report per segment the class count, the smallest class (min k),
    * the rows in classes below [[KAnonRiskK]], and that risk mass as a
    * 6-dp fraction. Two aggregation passes (class sizes, then the
    * census), both map-side-combinable; |segments| rows out.
    */
  def dqKAnonymity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val classes = Tables.customer(s, dir)
      .selectExpr("c_mktsegment", "c_nationkey",
        "CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band")
      .groupBy($"c_mktsegment", $"c_nationkey", $"bal_band")
      .agg(count(lit(1)).as("k"))
    classes.groupBy($"c_mktsegment".as("segment"))
      .agg(sum($"k").as("n_rows"),
        count(lit(1)).as("n_classes"),
        min($"k").as("min_k"),
        sum(when($"k" < KAnonRiskK, $"k").otherwise(0L)).as("risk_rows"))
      .selectExpr("segment",
        "CAST(n_rows AS BIGINT) AS n_rows",
        "CAST(n_classes AS BIGINT) AS n_classes",
        "CAST(min_k AS BIGINT) AS min_k",
        "CAST(risk_rows AS BIGINT) AS risk_rows",
        """floor(CAST(risk_rows AS DOUBLE) / n_rows * 1e6 + 0.5) / 1e6
          | AS risk_frac""".stripMargin)
  }

  val dqKAnonymitySql: String =
    s"""WITH classes AS (
       |  SELECT c_mktsegment, c_nationkey,
       |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
       |    count(*) AS k
       |  FROM customer GROUP BY 1, 2, 3)
       |SELECT c_mktsegment AS segment,
       |  CAST(sum(k) AS BIGINT) AS n_rows,
       |  CAST(count(*) AS BIGINT) AS n_classes,
       |  CAST(min(k) AS BIGINT) AS min_k,
       |  CAST(sum(CASE WHEN k < $KAnonRiskK THEN k ELSE 0 END) AS BIGINT)
       |    AS risk_rows,
       |  floor(CAST(sum(CASE WHEN k < $KAnonRiskK THEN k ELSE 0 END)
       |    AS DOUBLE) / sum(k) * 1e6 + 0.5) / 1e6 AS risk_frac
       |FROM classes GROUP BY c_mktsegment""".stripMargin

  /** l-diversity floor: an equivalence class whose sensitive attribute
    * takes fewer than this many distinct values is flagged — mirrored
    * verbatim in the oracle.
    */
  val LDivThresh = 3

  /** l-diversity audit — the k-anonymity companion a governance
    * pipeline runs next: k bounds RE-IDENTIFICATION (how many rows
    * share my quasi-identifiers), but a class can be large and still
    * leak the SENSITIVE attribute when every member shares one value
    * (homogeneity attack). Same quasi-identifier classes as
    * [[dqKAnonymity]] (segment, nation, banded balance); the sensitive
    * attribute is the EXACT account balance the band generalizes away.
    * Per segment: class count, the minimum per-class distinct-value
    * count l, and the row mass sitting in classes under
    * [[LDivThresh]] — the population a homogeneity attack could strip.
    *
    * Scale shape: one hash groupBy to the classes (countDistinct adds
    * its expand-shuffle, still key-partitioned), one re-aggregation to
    * |segments| rows. No joins, no windows.
    */
  def dqLDiversity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val classes = Tables.customer(s, dir)
      .selectExpr("c_mktsegment", "c_nationkey",
        "CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band", "c_acctbal")
      .groupBy($"c_mktsegment", $"c_nationkey", $"bal_band")
      .agg(count(lit(1)).as("k"), countDistinct($"c_acctbal").as("l"))
    classes.groupBy($"c_mktsegment".as("segment"))
      .agg(count(lit(1)).as("n_classes"),
        min($"l").as("min_l"),
        sum(when($"l" < LDivThresh, 1L).otherwise(0L)).as("risk_classes"),
        sum($"k").as("n_rows"),
        sum(when($"l" < LDivThresh, $"k").otherwise(0L)).as("risk_rows"))
      .selectExpr("segment",
        "CAST(n_classes AS BIGINT) AS n_classes",
        "CAST(min_l AS BIGINT) AS min_l",
        "CAST(risk_classes AS BIGINT) AS risk_classes",
        "CAST(risk_rows AS BIGINT) AS risk_rows",
        """floor(CAST(risk_rows AS DOUBLE) / n_rows * 1e6 + 0.5) / 1e6
          | AS risk_frac""".stripMargin)
  }

  val dqLDiversitySql: String =
    s"""WITH classes AS (
       |  SELECT c_mktsegment, c_nationkey,
       |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
       |    count(*) AS k,
       |    count(DISTINCT c_acctbal) AS l
       |  FROM customer GROUP BY 1, 2, 3)
       |SELECT c_mktsegment AS segment,
       |  CAST(count(*) AS BIGINT) AS n_classes,
       |  CAST(min(l) AS BIGINT) AS min_l,
       |  CAST(sum(CASE WHEN l < $LDivThresh THEN 1 ELSE 0 END) AS BIGINT)
       |    AS risk_classes,
       |  CAST(sum(CASE WHEN l < $LDivThresh THEN k ELSE 0 END) AS BIGINT)
       |    AS risk_rows,
       |  floor(CAST(sum(CASE WHEN l < $LDivThresh THEN k ELSE 0 END)
       |    AS DOUBLE) / sum(k) * 1e6 + 0.5) / 1e6 AS risk_frac
       |FROM classes GROUP BY c_mktsegment""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_ldiversity" -> (dqLDiversity _),
    "dq_kanonymity" -> (dqKAnonymity _),
    "dq_embedding_outliers" -> (dqEmbeddingOutliers _),
    "dq_benford" -> (dqBenford _),
    "dq_value_drift" -> (dqValueDrift _),
    "dq_embedding_drift" -> (dqEmbeddingDrift _),
    "dq_referential" -> (dqReferential _),
    "dq_table_profile" -> (dqTableProfile _),
    "dq_embeddings" -> (dqEmbeddings _),
    "dq_events" -> (dqEvents _),
    "dq_documents" -> (dqDocuments _))

  def oracles: Map[String, String] = Map(
    "dq_ldiversity" -> dqLDiversitySql,
    "dq_kanonymity" -> dqKAnonymitySql,
    "dq_embedding_outliers" -> dqEmbeddingOutliersSql,
    "dq_benford" -> dqBenfordSql,
    "dq_value_drift" -> dqValueDriftSql,
    "dq_embedding_drift" -> dqEmbeddingDriftSql,
    "dq_referential" -> dqReferentialSql,
    "dq_table_profile" -> dqTableProfileSql,
    "dq_embeddings" -> dqEmbeddingsSql,
    "dq_events" -> dqEventsSql,
    "dq_documents" -> dqDocumentsSql)
}
