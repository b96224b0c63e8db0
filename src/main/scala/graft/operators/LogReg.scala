package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed logistic-regression training — the fastText-shaped
  * linear classifier every curation stack runs (quality gates, language
  * ID, domain routing), trained INSIDE the engine as a fixed-iteration
  * batch-gradient loop, the exact discipline of [[KMeans]]:
  *
  *   - features are data-derived (bias + the corpus's top-[[F]] tokens
  *     by frequency, ties by token) — no fixture constants;
  *   - the per-doc feature value is STANDARDIZED length-normalized tf
  *     (z-score per feature over the dense matrix, μ/σ from one
  *     decimal-sum pass), floor-rounded to 6 dp at materialization, so
  *     every later product starts from bit-identical doubles on both
  *     engines — see [[featureRows]] for why standardization is what
  *     makes batch GD converge here at all;
  *   - forward pass (z), sigmoid, gradient, and update are each ONE
  *     distributed aggregate per iteration with the decimal-sum
  *     convention (9-dp-rounded products summed in DECIMAL — exact,
  *     associative, partition-order-proof), sigmoid outputs re-rounded
  *     to 6 dp via the same floor(x·1e6+0.5)/1e6 idiom as the updates
  *     before entering the gradient so a last-ulp `exp` difference
  *     between libm implementations cannot propagate;
  *   - updates use the floor(x·1e6 + 0.5)/1e6 rounding ([[KMeans
  *     .update]]'s note: both engines run the same IEEE op sequence,
  *     unlike their native round(double, 6));
  *   - only the (F+1)-row weight vector round-trips through the driver
  *     per iteration — data rows never leave the cluster; at 100 TB
  *     each iteration is one scan-side map + one tree-aggregated
  *     gradient, the same shape MLlib's LBFGS/GD costs.
  *
  * Label: mean token character length ≥ the corpus mean — a quality-
  * gate-shaped target that is EXACTLY linear in the normalized-tf
  * feature space (every token has a fixed character length, so the
  * doc's mean length is Σ len(w)·tf_w/n_toks — a linear functional of
  * the features), which makes convergence a provable expectation the
  * spec pins (training accuracy well above the majority-class rate).
  * The fixture's `lang`/`source` columns are decorative (every
  * language draws the identical 31-token vocabulary at proportional
  * rates — measured, not assumed), so a real learnability statement
  * must target a property the text itself determines.
  *
  * Output: one row per feature (feature_id, token, weight) plus the
  * training-set correct-prediction count — 17 rows that pin every
  * arithmetic step of the whole trajectory, [[KMeans.kmeans]] style.
  */
object LogReg {

  val F = 32
  val Iters = 5
  val Lr = 5.0

  /** (doc_id, j, x, y) rows: j=0 bias with x=1, j=1..F the top tokens
    * by corpus count with x = the STANDARDIZED normalized tf,
    * floor-rounded to 6 dp. Standardization (z-score per feature,
    * over the DENSE matrix — a doc without the token contributes
    * v = 0) is load-bearing, not cosmetic: raw normalized-tf features
    * are compositional (they sum to ≤ 1 per row) and tiny, so
    * batch-GD's gradient is dominated by the shared mean direction
    * and training plateaus at the majority-class rate no matter the
    * learning rate (measured: 254–258/500 for lr ∈ [5, 400] on raw
    * features vs 482/500 standardized, same 5 iterations — a perfect
    * linear separator exists either way). μ and σ come from one
    * decimal-sum pass (order-proof); σ = 0 features standardize to 0.
    */
  private def featureRows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // The token explode feeds FOUR aggregates (feats, docLen, tf, the
    // label's length stats); each would otherwise re-run the documents
    // scan + split/explode inside the one featureRows evaluation —
    // aggregates share no exchange, so nothing dedupes the subtree.
    // One materialization (guide §1.2), identical rows.
    val toks = TextOps.tokens(Tables.documents(s, dir)).localCheckpoint()
    val feats = toks.groupBy($"word").agg(count(lit(1)).as("cnt"))
      .withColumn("j", row_number().over(
        Window.partitionBy(lit(1)).orderBy($"cnt".desc, $"word")))
      .where($"j" <= F).select($"j", $"word")
    val docLen = toks.groupBy($"doc_id").agg(count(lit(1)).as("n_toks"))
    val tf = toks.groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    val tfv = tf.join(broadcast(feats), "word")
      .join(docLen, "doc_id")
      .select($"doc_id", $"j",
        round($"tf".cast("double") / $"n_toks", 6).as("v"))
    val nDocs = docLen.agg(count(lit(1)).as("nd"))
    val fstats = tfv.groupBy($"j")
      .agg(sum($"v".cast("decimal(28,12)")).cast("double").as("s1"),
        sum(round($"v" * $"v", 9).cast("decimal(28,12)"))
          .cast("double").as("s2"))
      .crossJoin(broadcast(nDocs))
      .select($"j", ($"s1" / $"nd").as("mu"), ($"s2" / $"nd").as("m2"))
      .select($"j", $"mu", sqrt($"m2" - $"mu" * $"mu").as("sigma"))
    val xf = docLen.select($"doc_id")
      .crossJoin(broadcast(fstats))
      .join(tfv, Seq("doc_id", "j"), "left_outer")
      .select($"doc_id", $"j",
        (floor(((coalesce($"v", lit(0.0)) - $"mu") /
          when($"sigma" > 0, $"sigma").otherwise(lit(1.0))) * 1e6 + 0.5)
          / 1e6).as("x"))
    val bias = docLen.select($"doc_id", lit(0).as("j"),
      lit(1.0).as("x"))
    // label: doc mean token length >= corpus mean token length, both
    // 6-dp-rounded before the compare (integer char sums, one division
    // each — engine-exact)
    val wl = toks.select($"doc_id", length($"word").as("wl"))
    val docMean = wl.groupBy($"doc_id")
      .agg(round(sum($"wl").cast("double") / count(lit(1)), 6).as("mlen"))
    val corpusMean = wl.agg(
      round(sum($"wl").cast("double") / count(lit(1)), 6).as("cmean"))
    val y = docMean.crossJoin(broadcast(corpusMean))
      .select($"doc_id",
        when($"mlen" >= $"cmean", 1.0).otherwise(0.0).as("y"))
    xf.unionByName(bias).join(y, "doc_id")
  }

  /** One forward pass: per-doc decimal dot with the broadcast weight
    * rows, sigmoid re-rounded to 6 dp.
    */
  private def forward(x: DataFrame, w: Seq[(Int, Double)]): DataFrame = {
    val s = x.sparkSession
    import s.implicits._
    val wdf = w.toDF("j", "w")
    x.join(broadcast(wdf), "j")
      .groupBy($"doc_id", $"y")
      .agg(sum(round($"x" * $"w", 9).cast("decimal(28,12)"))
        .cast("double").as("z"))
      .select($"doc_id", $"y",
        (floor((lit(1.0) / (lit(1.0) + exp(-$"z"))) * 1e6 + 0.5) / 1e6)
          .as("p"))
  }

  /** Memoized training runs per (session, corpus fingerprint, iteration
    * count) — the [[Bpe]]/[[Unigram]]/[[KMeans]] trained-model
    * discipline applied to the LR trajectory: `doc_lr_classifier` and
    * `doc_lr_calibration` consume the IDENTICAL [[Iters]]-step fit
    * (they differ only in the readout over the final predictions), and
    * `curate_el2n` its [[El2nIters]] early checkpoint, so each
    * trajectory is trained once per corpus and every later consumer
    * rides the checkpointed feature matrix + the driver-side weight
    * vector. Values are pure functions of the fingerprinted corpus;
    * build seconds land in the bench memo ledger under "lr".
    */
  private val fitCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), (DataFrame, Seq[(Int, Double)], DataFrame)]

  private def fit(s: SparkSession, dir: String, iters: Int = Iters)
      : (DataFrame, Seq[(Int, Double)], DataFrame) =
    graft.Memo.cached(fitCache, s,
      Similarity.dataKey(dir, "documents") + s":iters=$iters", "lr") {
      import s.implicits._
      val x = featureRows(s, dir).localCheckpoint()
      val n = x.select($"doc_id").distinct().count()
      var w: Seq[(Int, Double)] = (0 to F).map(j => (j, 0.0))
      for (_ <- 1 to iters) {
        val p = forward(x, w).select($"doc_id", $"p")
        val grad = x.join(p, Seq("doc_id"))
          .groupBy($"j")
          .agg(sum(round(($"p" - $"y") * $"x", 9).cast("decimal(28,12)"))
            .cast("double").as("g"))
          .as[(Int, Double)].collect().toMap
        w = w.map { case (j, wj) =>
          (j, math.floor((wj - Lr * grad.getOrElse(j, 0.0) / n) * 1e6 + 0.5) / 1e6)
        }
      }
      (x, w, forward(x, w))
    }

  def lrClassifier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val (_, w, p) = fit(s, dir)
    val correct = p.agg(count(when(
      ($"p" >= 0.5 && $"y" === 1.0) || ($"p" < 0.5 && $"y" === 0.0),
      lit(1))).as("train_correct"))
    val toks = TextOps.tokens(Tables.documents(s, dir))
    val feats = toks.groupBy($"word").agg(count(lit(1)).as("cnt"))
      .withColumn("j", row_number().over(
        Window.partitionBy(lit(1)).orderBy($"cnt".desc, $"word")))
      .where($"j" <= F).select($"j", $"word")
    val names = feats.unionByName(
      Seq((0, "__bias__")).toDF("j", "word"))
    w.toDF("j", "w")
      .join(names, "j")
      .crossJoin(broadcast(correct))
      .select($"j".as("feature_id"), $"word".as("token"),
        $"w".as("weight"), $"train_correct")
  }

  /** Reliability diagram of the trained classifier — the calibration
    * readout a quality-scoring pipeline checks before TRUSTING the
    * scores as sampling weights (a miscalibrated classifier skews
    * every downstream quality-binned mixture): predictions bucketed
    * into 10 confidence bins (p = 1.0 folds into the top bin), each
    * bin reporting its size, mean predicted probability, and observed
    * positive rate. Means are ratios of EXACT decimal sums — p is the
    * 6-dp-stabilized sigmoid, so summing as DECIMAL(8,6) is
    * order-independent and engine-exact; a double sum would wobble in
    * the last ulp under Spark's partition-order nondeterminism. Same
    * training pass as [[lrClassifier]]; |bins| rows out.
    */
  def lrCalibration(s: SparkSession, dir: String): DataFrame = {
    val (_, _, p) = fit(s, dir)
    p.selectExpr("least(CAST(floor(p * 10) AS INT), 9) AS bin", "p", "y")
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("p").cast("decimal(8,6)")).as("psum"),
        sum(col("y").cast("decimal(8,6)")).as("ysum"))
      .selectExpr("bin", "CAST(n AS BIGINT) AS n",
        "floor(CAST(psum AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS avg_p",
        "floor(CAST(ysum AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS frac_pos",
        """floor(abs(floor(CAST(psum AS DOUBLE) / n * 1e6 + 0.5) / 1e6
          |  - floor(CAST(ysum AS DOUBLE) / n * 1e6 + 0.5) / 1e6)
          |  * 1e6 + 0.5) / 1e6 AS gap""".stripMargin)
  }

  // ------------------------------------------------------- EL2N selection

  /** Early-checkpoint iteration count and keep fraction for [[el2nSelect]]. */
  val El2nIters = 2

  /** EL2N data selection (Paul et al. 2021, "Deep Learning on a Data
    * Diet"): score every training example by the error L2 norm
    * ‖p(x) − y‖ at an EARLY training checkpoint ([[El2nIters]] of the
    * [[Iters]]-step trajectory — the paper's point is that a few steps
    * suffice to separate easy from important examples), rank by score,
    * and keep the hardest half — pruning the easy examples the model
    * already classifies confidently. For the binary classifier the
    * norm is |p − y|; p is the same 6-dp-stabilized sigmoid as
    * training, so the score column is bit-identical across engines.
    *
    * The global rank runs as a [[Scans.segmentedRowNumber]] — score
    * buckets (monotone in the el2n DESC order, ties never split)
    * ranked in parallel with broadcast row-count carries, never a
    * single-partition total sort; the exact-rank alternative at even
    * larger scale is thresholding on a mergeable quantile sketch
    * (`sketch_group_quantiles`). Training cost shape is
    * [[lrClassifier]]'s with 2/5 the iterations: one scan-side
    * aggregate per step, 17-row driver round-trips only.
    */
  def el2nSelect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (x, w, _) = fit(s, dir, El2nIters)
    val p = forward(x, w)
    val scored = p.select($"doc_id", $"y", $"p",
      abs($"p" - $"y").as("el2n"))
    val n = scored.agg(count(lit(1)).as("n"))
    // shard = score bucket, non-decreasing along (el2n DESC): equal
    // scores share a bucket, so the within-shard (el2n DESC, doc_id)
    // order composes to the exact global rank
    val sharded = scored.withColumn("__shard",
      floor((lit(1.0) - $"el2n") * Scans.ScanShards).cast("long"))
    Scans.segmentedRowNumber(sharded, "__shard",
      Seq($"el2n".desc, $"doc_id"), "rnk")
      .drop("__shard")
      .crossJoin(broadcast(n))
      .select($"doc_id", $"y", $"p", $"el2n", $"rnk",
        ($"rnk" <= ceil($"n" * 0.5)).as("keep"))
  }

  // ------------------------------------------------------------- oracle

  /** \W+ word tokens — the [[TextOps.tokens]] PAIR (lowercase, split on
    * non-word runs, drop empties). The Spark side above tokenizes via
    * TextOps.tokens, so the oracle must split on \W+ too; the \s+ pair
    * (duckTokensExpr) would silently diverge on any punctuation-bearing
    * text even though both coincide on the current fixture.
    */
  private val duckWordToks: String =
    """list_filter(regexp_split_to_array(lower(text), '\W+'), t -> t <> '')"""

  private val sqlBase: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($duckWordToks) AS word
       |  FROM documents),
       |feats AS (
       |  SELECT j, word FROM (
       |    SELECT word, row_number() OVER (ORDER BY count(*) DESC, word) AS j
       |    FROM toks GROUP BY word)
       |  WHERE j <= $F),
       |doclen AS (SELECT doc_id, count(*) AS n_toks FROM toks GROUP BY doc_id),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
       |tfv AS MATERIALIZED (
       |  SELECT t.doc_id, f.j, round(CAST(t.tf AS DOUBLE) / d.n_toks, 6) AS v
       |  FROM tf t JOIN feats f ON t.word = f.word
       |  JOIN doclen d ON t.doc_id = d.doc_id),
       |nd AS (SELECT count(*) AS nd FROM doclen),
       |fstats AS MATERIALIZED (
       |  SELECT j,
       |    CAST(sum(CAST(v AS DECIMAL(28,12))) AS DOUBLE) AS s1,
       |    CAST(sum(CAST(round(v * v, 9) AS DECIMAL(28,12))) AS DOUBLE) AS s2
       |  FROM tfv GROUP BY j),
       |fsig AS (
       |  SELECT j, mu, sqrt(m2 - mu * mu) AS sigma FROM (
       |    SELECT j, s1 / nd.nd AS mu, s2 / nd.nd AS m2
       |    FROM fstats CROSS JOIN nd) m),
       |xf AS MATERIALIZED (
       |  SELECT d.doc_id, f.j,
       |    floor(((coalesce(v.v, 0) - f.mu) /
       |      CASE WHEN f.sigma > 0 THEN f.sigma ELSE 1 END) * 1e6 + 0.5)
       |      / 1e6 AS x
       |  FROM doclen d CROSS JOIN fsig f
       |  LEFT JOIN tfv v ON v.doc_id = d.doc_id AND v.j = f.j
       |  UNION ALL
       |  SELECT doc_id, 0 AS j, CAST(1.0 AS DOUBLE) AS x FROM doclen),
       |docmean AS (
       |  SELECT doc_id,
       |    round(CAST(sum(len(word)) AS DOUBLE) / count(*), 6) AS mlen
       |  FROM toks GROUP BY doc_id),
       |cmean AS (
       |  SELECT round(CAST(sum(len(word)) AS DOUBLE) / count(*), 6) AS cmean
       |  FROM toks),
       |labels AS MATERIALIZED (
       |  SELECT d.doc_id,
       |    CASE WHEN d.mlen >= c.cmean THEN 1.0 ELSE 0.0 END AS y
       |  FROM docmean d CROSS JOIN cmean c),
       |xy AS MATERIALIZED (
       |  SELECT x.doc_id, x.j, x.x, l.y
       |  FROM xf x JOIN labels l ON x.doc_id = l.doc_id),
       |n AS (SELECT count(DISTINCT doc_id) AS n FROM xy),
       |w0 AS (SELECT unnest(range(0, ${F + 1})) AS j, CAST(0 AS DOUBLE) AS w)""".stripMargin

  /** One iteration: forward CTE p{i} from w{i-1}, gradient, update. */
  private def sqlIter(i: Int): String = {
    val p = i - 1
    s"""p$i AS MATERIALIZED (
       |  SELECT x.doc_id, x.y,
       |    floor((1.0 / (1.0 + exp(-CAST(sum(CAST(round(x.x * w.w, 9)
       |      AS DECIMAL(28,12))) AS DOUBLE)))) * 1e6 + 0.5) / 1e6 AS p
       |  FROM xy x JOIN w$p w ON x.j = w.j
       |  GROUP BY x.doc_id, x.y),
       |g$i AS MATERIALIZED (
       |  SELECT x.j,
       |    CAST(sum(CAST(round((pr.p - x.y) * x.x, 9) AS DECIMAL(28,12)))
       |      AS DOUBLE) AS g
       |  FROM xy x JOIN p$i pr ON x.doc_id = pr.doc_id
       |  GROUP BY x.j),
       |w$i AS MATERIALIZED (
       |  SELECT w.j,
       |    floor((w.w - $Lr * coalesce(g.g, 0) / n.n) * 1e6 + 0.5) / 1e6 AS w
       |  FROM w$p w LEFT JOIN g$i g ON w.j = g.j CROSS JOIN n)""".stripMargin
  }

  val lrClassifierSql: String = {
    val iters = (1 to Iters).map(sqlIter).mkString(",\n")
    s"""$sqlBase,
       |$iters,
       |pfin AS MATERIALIZED (
       |  SELECT x.doc_id, x.y,
       |    floor((1.0 / (1.0 + exp(-CAST(sum(CAST(round(x.x * w.w, 9)
       |      AS DECIMAL(28,12))) AS DOUBLE)))) * 1e6 + 0.5) / 1e6 AS p
       |  FROM xy x JOIN w$Iters w ON x.j = w.j
       |  GROUP BY x.doc_id, x.y),
       |correct AS (
       |  SELECT count(*) FILTER ((p >= 0.5 AND y = 1.0) OR (p < 0.5 AND y = 0.0))
       |    AS train_correct
       |  FROM pfin),
       |names AS (
       |  SELECT j, word FROM feats
       |  UNION ALL SELECT 0 AS j, '__bias__' AS word)
       |SELECT CAST(w.j AS INT) AS feature_id, nm.word AS token,
       |  w.w AS weight, c.train_correct
       |FROM w$Iters w JOIN names nm ON w.j = nm.j CROSS JOIN correct c""".stripMargin
  }

  /** Oracle: the shared feature/label/iteration CTEs cut at the early
    * checkpoint, then the identical score/rank/keep finalize.
    */
  val el2nSelectSql: String = {
    val iters = (1 to El2nIters).map(sqlIter).mkString(",\n")
    s"""$sqlBase,
       |$iters,
       |pe AS MATERIALIZED (
       |  SELECT x.doc_id, x.y,
       |    floor((1.0 / (1.0 + exp(-CAST(sum(CAST(round(x.x * w.w, 9)
       |      AS DECIMAL(28,12))) AS DOUBLE)))) * 1e6 + 0.5) / 1e6 AS p
       |  FROM xy x JOIN w$El2nIters w ON x.j = w.j
       |  GROUP BY x.doc_id, x.y),
       |scored AS MATERIALIZED (
       |  SELECT doc_id, y, p, abs(p - y) AS el2n FROM pe),
       |nn AS (SELECT count(*) AS n FROM scored)
       |SELECT doc_id, y, p, el2n, CAST(rnk AS BIGINT) AS rnk,
       |  rnk <= ceil(nn.n * 0.5) AS keep
       |FROM (
       |  SELECT doc_id, y, p, el2n,
       |    row_number() OVER (ORDER BY el2n DESC, doc_id) AS rnk
       |  FROM scored) s CROSS JOIN nn""".stripMargin
  }

  /** Oracle: the shared CTEs + full-iteration forward, then the same
    * decimal-sum binning.
    */
  val lrCalibrationSql: String = {
    val iters = (1 to Iters).map(sqlIter).mkString(",\n")
    s"""$sqlBase,
       |$iters,
       |pfin AS MATERIALIZED (
       |  SELECT x.doc_id, x.y,
       |    floor((1.0 / (1.0 + exp(-CAST(sum(CAST(round(x.x * w.w, 9)
       |      AS DECIMAL(28,12))) AS DOUBLE)))) * 1e6 + 0.5) / 1e6 AS p
       |  FROM xy x JOIN w$Iters w ON x.j = w.j
       |  GROUP BY x.doc_id, x.y),
       |binned AS (
       |  SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin, p, y FROM pfin)
       |SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |  floor(CAST(sum(CAST(p AS DECIMAL(8,6))) AS DOUBLE) / count(*)
       |    * 1e6 + 0.5) / 1e6 AS avg_p,
       |  floor(CAST(sum(CAST(y AS DECIMAL(8,6))) AS DOUBLE) / count(*)
       |    * 1e6 + 0.5) / 1e6 AS frac_pos,
       |  floor(abs(
       |    floor(CAST(sum(CAST(p AS DECIMAL(8,6))) AS DOUBLE) / count(*)
       |      * 1e6 + 0.5) / 1e6
       |    - floor(CAST(sum(CAST(y AS DECIMAL(8,6))) AS DOUBLE) / count(*)
       |      * 1e6 + 0.5) / 1e6) * 1e6 + 0.5) / 1e6 AS gap
       |FROM binned GROUP BY bin""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_lr_classifier" -> (lrClassifier _),
    "doc_lr_calibration" -> (lrCalibration _),
    "curate_el2n" -> (el2nSelect _))

  def oracles: Map[String, String] = Map(
    "doc_lr_classifier" -> lrClassifierSql,
    "doc_lr_calibration" -> lrCalibrationSql,
    "curate_el2n" -> el2nSelectSql)
}
