package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed Lloyd's k-means over the embedding collection — the
  * iterative ML operator proper (IVF training in [[Similarity]] fits a
  * codebook on a bounded SAMPLE; this is the full-collection fixed-
  * iteration fit, the shape MLlib's KMeans runs):
  *
  *   - ASSIGNMENT is fully distributed: each vector joins the k-row
  *     broadcast centroid table, squared-L2 computed by a sequential
  *     double fold (`aggregate(zip_with(...))` — the same fold order
  *     DuckDB's list_sum uses, which is what makes double distances
  *     engine-exact), argmin by `row_number() over (d, k)` so ties
  *     break deterministically.
  *   - UPDATE is distributed: per (cluster, dim) mean with the
  *     decimal-summed 6-dp-rounded convention ([[Similarity
  *     .langCentroids]]) — partition-order-proof, so five chained
  *     iterations cannot drift between engines.
  *   - Only the k×dim centroid table (512 doubles) round-trips through
  *     the driver per iteration — exactly what MLlib collects; data
  *     rows never leave the cluster. Empty clusters keep their previous
  *     centroid (coalesce against the prior table) on BOTH engines.
  *
  * Init = the first k vectors by vec_id (deterministic, restated by the
  * oracle); [[Iters]] fixed iterations, no convergence polling on the
  * critical path. Output = final centroids (exploded to (cluster, dim,
  * mean_v)) joined with final-assignment cluster sizes — 512 rows that
  * pin every arithmetic step of the whole fit.
  */
object KMeans {

  val K = 8
  val Iters = 5

  /** Squared-L2 between the embedding column and a centroid array
    * column, as a sequential double fold (matches DuckDB list_sum).
    */
  private val distExpr =
    """aggregate(
      |  zip_with(embedding, cvec,
      |    (a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)),
      |  CAST(0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin

  /** One assignment pass against a k-row centroid frame. */
  private[operators] def assign(emb: DataFrame,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    val cdf = cents.toDF("k", "cvec")
    emb.crossJoin(broadcast(cdf))
      .withColumn("d", expr(distExpr))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"vec_id").orderBy($"d", $"k")))
      .where($"rn" === 1)
      .select($"vec_id", $"k", $"embedding")
  }

  /** One update pass: decimal-exact per-(cluster, dim) means, with the
    * previous centroid carried for any cluster that lost all members.
    */
  private def update(assigned: DataFrame,
      prev: Seq[(Int, Seq[Double])]): Seq[(Int, Seq[Double])] = {
    val s = assigned.sparkSession
    import s.implicits._
    // rounding via floor(x*1e6 + 0.5)/1e6, NOT round(): the engines'
    // native round(double, 6) implementations disagree within an ulp of
    // the .5 boundary (Spark goes through exact BigDecimal, DuckDB
    // multiplies in double first) — observed as a single last-digit
    // centroid diff after 5 iterations. The floor form is the same IEEE
    // op sequence on both engines, so it cannot diverge.
    val means = assigned
      .select($"k", posexplode($"embedding").as(Seq("dim", "ev")))
      .groupBy($"k", $"dim")
      .agg((floor((sum(floor($"ev".cast("double") * 1e6 + 0.5)
          .cast("decimal(18,0)")).cast("double") / count(lit(1))) + 0.5)
        / 1e6).as("mv"))
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    prev.map { case (k, old) => (k, means.getOrElse(k, old)) }
  }

  private val centCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Int, Seq[Double])]]

  /** Final centroids of the 5-iteration fit, memoized per corpus
    * fingerprint — the trained MODEL artifact the streaming scorer
    * ([[graft.streaming.StreamQueries]] `stream_kmeans_assign`) applies
    * at ingest: train batch, score stream.
    */
  def trainedCentroids(s: SparkSession, dir: String): Seq[(Int, Seq[Double])] =
    graft.Memo.capped(centCache)(Similarity.dataKey(dir, "embeddings"), {
      import s.implicits._
      val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
      var cents = initCentroids(s, dir)
      for (_ <- 1 to Iters) cents = update(assign(emb, cents), cents)
      cents
    })

  private def initCentroids(s: SparkSession, dir: String): Seq[(Int, Seq[Double])] = {
    import s.implicits._
    Tables.embeddings(s, dir).select($"vec_id", $"embedding")
      .where($"vec_id" < K).as[(Long, Array[Float])].collect()
      .sortBy(_._1)
      .map { case (id, v) => (id.toInt, v.map(_.toDouble).toSeq) }.toSeq
  }

  def kmeans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
    var cents: Seq[(Int, Seq[Double])] = initCentroids(s, dir)
    var lastAssign: DataFrame = null
    for (_ <- 1 to Iters) {
      lastAssign = assign(emb, cents)
      cents = update(lastAssign, cents)
    }
    val sizes = lastAssign.groupBy($"k").agg(count(lit(1)).as("n_vecs"))
    val centRows = cents
      .flatMap { case (k, v) => v.zipWithIndex.map { case (mv, d) => (k, d, mv) } }
      .toDF("k", "dim", "mean_v")
    centRows.join(sizes, Seq("k"), "left")
      .select($"k".as("cluster"), $"dim", $"mean_v",
        coalesce($"n_vecs", lit(0L)).as("n_vecs"))
  }

  /** DuckDB restatement: init from the first k vectors, the five
    * iterations unrolled as chained CTEs (assignment via the same
    * list_sum fold + (d, k) row_number, update via the same decimal
    * means with previous-centroid coalesce), sizes from the final
    * assignment.
    */
  private val sqlInit =
    s"""WITH c0 AS (
       |  SELECT CAST(vec_id AS INT) AS k,
       |    CAST(rv.i - 1 AS INT) AS dim,
       |    CAST(embedding[rv.i] AS DOUBLE) AS mv
       |  FROM embeddings, LATERAL (
       |    SELECT unnest(range(1, len(embedding) + 1)) AS i) rv
       |  WHERE vec_id < $K)""".stripMargin

  /** One assignment CTE: every vector to its nearest `cvName` centroid. */
  private def sqlAssign(cvName: String, outName: String): String =
    s"""$outName AS (
       |  SELECT vec_id, k, embedding FROM (
       |    SELECT e.vec_id, c.k, e.embedding,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |          list_transform(range(1, len(e.embedding) + 1),
       |            j -> (CAST(e.embedding[j] AS DOUBLE) - c.cvec[j])
       |               * (CAST(e.embedding[j] AS DOUBLE) - c.cvec[j]))),
       |          (s, v) -> s + v),
       |        c.k) AS rn
       |    FROM embeddings e CROSS JOIN $cvName c)
       |  WHERE rn = 1)""".stripMargin

  private def sqlIter(i: Int): String = {
    val p = i - 1
    s"""cv$p AS (
       |  SELECT k, list(mv ORDER BY dim) AS cvec FROM c$p GROUP BY k),
       |${sqlAssign(s"cv$p", s"a$i")},
       |m$i AS (
       |  SELECT k, CAST(rv.i - 1 AS INT) AS dim,
       |    floor(CAST(sum(CAST(floor(CAST(embedding[rv.i] AS DOUBLE) * 1e6 + 0.5)
       |      AS DECIMAL(18,0))) AS DOUBLE) / count(*) + 0.5) / 1e6 AS mv
       |  FROM a$i, LATERAL (
       |    SELECT unnest(range(1, len(embedding) + 1)) AS i) rv
       |  GROUP BY k, rv.i),
       |c$i AS (
       |  SELECT p.k, p.dim, coalesce(m.mv, p.mv) AS mv
       |  FROM c$p p LEFT JOIN m$i m ON m.k = p.k AND m.dim = p.dim)""".stripMargin
  }

  val kmeansSql: String = {
    val iters = (1 to Iters).map(sqlIter).mkString(",\n")
    s"""$sqlInit,
       |$iters,
       |sizes AS (SELECT k, CAST(count(*) AS BIGINT) AS n_vecs
       |  FROM a$Iters GROUP BY k)
       |SELECT c.k AS cluster, c.dim, c.mv AS mean_v,
       |  coalesce(s.n_vecs, 0) AS n_vecs
       |FROM c$Iters c LEFT JOIN sizes s ON s.k = c.k""".stripMargin
  }

  /** Oracle for the streaming scorer (`stream_kmeans_assign`): the same
    * unrolled fit, then ONE more assignment of the whole collection
    * against the final centroids, counted per cluster — what the
    * stream's drained delta log must equal.
    */
  val streamAssignSql: String = {
    val iters = (1 to Iters).map(sqlIter).mkString(",\n")
    s"""$sqlInit,
       |$iters,
       |cv$Iters AS (
       |  SELECT k, list(mv ORDER BY dim) AS cvec FROM c$Iters GROUP BY k),
       |${sqlAssign(s"cv$Iters", "a_final")}
       |SELECT k AS cluster, count(*) AS n_vecs
       |FROM a_final GROUP BY k""".stripMargin
  }

  /** The unrolled fit + final full-collection assignment as a reusable
    * CTE prefix: downstream oracles (`sim_semdedup`) continue from
    * `a_final` (vec_id, k, embedding) — the exact table [[assign]]
    * against [[trainedCentroids]] produces on the Spark side.
    */
  private[operators] def fitAssignCtes: String = {
    val iters = (1 to Iters).map(sqlIter).mkString(",\n")
    s"""$sqlInit,
       |$iters,
       |cv$Iters AS (
       |  SELECT k, list(mv ORDER BY dim) AS cvec FROM c$Iters GROUP BY k),
       |${sqlAssign(s"cv$Iters", "a_final")}""".stripMargin
  }

  /** Nearest-centroid classifier evaluation — the eval step every
    * training-data pipeline runs on its labeled slice: fit one centroid
    * per TRUE label (single distributed pass, the [[update]] decimal
    * convention, no driver collect — the centroid frame stays a
    * |labels|-row DataFrame), classify every vector to its nearest
    * centroid (same broadcast + sequential-fold distance + (d, k)
    * tie-break as [[assign]]), and report the per-class confusion
    * metrics. Precision/recall/F1 all derive from three INTEGER counts
    * (true, predicted, true-positive) per class — F1 via the harmonic
    * identity 2·tp/(n_pred+n_true), so no rounded quantity ever feeds
    * another rounded quantity. A class never predicted gets NULL
    * precision (0/0) on both engines.
    */
  def centroidEval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir).select($"vec_id", $"label", $"embedding")
    val cvec = e.select($"label", posexplode($"embedding").as(Seq("dim", "ev")))
      .groupBy($"label", $"dim")
      .agg((floor((sum(floor($"ev".cast("double") * 1e6 + 0.5)
          .cast("decimal(18,0)")).cast("double") / count(lit(1))) + 0.5)
        / 1e6).as("mv"))
      .groupBy($"label")
      .agg(transform(array_sort(collect_list(struct($"dim", $"mv"))),
        c => c("mv")).as("cvec"))
      .select($"label".as("k"), $"cvec")
    val pred = e.crossJoin(broadcast(cvec))
      .withColumn("d", expr(distExpr))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"vec_id").orderBy($"d", $"k")))
      .where($"rn" === 1)
      .select($"vec_id", $"label", $"k")
    val trueN = pred.groupBy($"label").agg(count(lit(1)).as("n_true"))
    val predN = pred.groupBy($"k").agg(count(lit(1)).as("n_pred"))
    val tp = pred.where($"label" === $"k")
      .groupBy($"label").agg(count(lit(1)).as("tp"))
    trueN
      .join(predN.withColumnRenamed("k", "label"), Seq("label"), "left")
      .join(tp, Seq("label"), "left")
      .select($"label", $"n_true",
        coalesce($"n_pred", lit(0L)).as("n_pred"),
        coalesce($"tp", lit(0L)).as("tp"))
      .select($"label", $"n_true", $"n_pred", $"tp",
        when($"n_pred" === 0, lit(null).cast("double"))
          .otherwise(round($"tp".cast("double") / $"n_pred", 6))
          .as("precision"),
        round($"tp".cast("double") / $"n_true", 6).as("recall"),
        round(lit(2.0) * $"tp" / ($"n_pred" + $"n_true"), 6).as("f1"))
  }

  val centroidEvalSql: String =
    s"""WITH cm AS (
       |  SELECT label, CAST(rv.i - 1 AS INT) AS dim,
       |    floor(CAST(sum(CAST(floor(CAST(embedding[rv.i] AS DOUBLE) * 1e6 + 0.5)
       |      AS DECIMAL(18,0))) AS DOUBLE) / count(*) + 0.5) / 1e6 AS mv
       |  FROM embeddings, LATERAL (
       |    SELECT unnest(range(1, len(embedding) + 1)) AS i) rv
       |  GROUP BY label, rv.i),
       |cv AS (SELECT label AS k, list(mv ORDER BY dim) AS cvec
       |  FROM cm GROUP BY label),
       |${sqlAssign("cv", "a")},
       |pred AS (
       |  SELECT a.vec_id, e.label, a.k
       |  FROM a JOIN embeddings e ON e.vec_id = a.vec_id),
       |tn AS (SELECT label, CAST(count(*) AS BIGINT) AS n_true
       |  FROM pred GROUP BY 1),
       |pn AS (SELECT k, CAST(count(*) AS BIGINT) AS n_pred
       |  FROM pred GROUP BY 1),
       |tp AS (SELECT label, CAST(count(*) AS BIGINT) AS tp
       |  FROM pred WHERE label = k GROUP BY 1)
       |SELECT tn.label, tn.n_true,
       |  coalesce(pn.n_pred, 0) AS n_pred, coalesce(tp.tp, 0) AS tp,
       |  CASE WHEN coalesce(pn.n_pred, 0) = 0 THEN NULL
       |    ELSE round(CAST(coalesce(tp.tp, 0) AS DOUBLE) / pn.n_pred, 6)
       |    END AS precision,
       |  round(CAST(coalesce(tp.tp, 0) AS DOUBLE) / tn.n_true, 6) AS recall,
       |  round(CAST(2.0 AS DOUBLE) * coalesce(tp.tp, 0)
       |    / (coalesce(pn.n_pred, 0) + tn.n_true), 6) AS f1
       |FROM tn
       |LEFT JOIN pn ON pn.k = tn.label
       |LEFT JOIN tp ON tp.label = tn.label""".stripMargin

  /** Univariate feature screening by rank-based ROC AUC — the other
    * half of the labeled-slice eval toolkit ([[centroidEval]] scores a
    * CLASSIFIER; this scores individual FEATURES): for each of the
    * first [[AucDims]] embedding dimensions, the AUC of that raw
    * coordinate separating label 0 from the rest, via the Mann–Whitney
    * rank-sum identity AUC = (Σ_pos avgrank − n⁺(n⁺+1)/2) / (n⁺·n⁻).
    * Ties are handled exactly with the doubled-average-rank trick from
    * `q_spearman` (2·avgrank = 2·rank + ties − 1 — integer arithmetic,
    * no 0.5 fractions), so every sufficient statistic is an exact long
    * and the single double division happens once at the end under the
    * floor(x·1e6+0.5) cross-engine rounding convention.
    *
    * Scale shape: one narrow posexplode (constant ×[[AucDims]] fanout),
    * one rank window per dim partition (the per-dim sort — at 100 TB
    * this is the standard sort-based AUC, one shuffle keyed on dim,
    * skew-free because dims are uniform by construction), one final
    * 8-row aggregate. Nothing driver-side; no per-pair comparison —
    * the rank identity is exactly what makes AUC affordable where the
    * O(n⁺·n⁻) definition is not.
    */
  val AucDims = 8

  def featureAuc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    aucByDim(Tables.embeddings(s, dir)
      .select($"label", posexplode(slice($"embedding", 1, AucDims)).as(Seq("p", "score")))
      .select(($"p" + 1).cast("int").as("dim"),
        when($"label" === 0, 1L).otherwise(0L).as("pos"), $"score"))
  }

  /** Rank-sum AUC per `dim` group over (dim, pos ∈ {0,1} long, score)
    * rows — the engine behind [[featureAuc]], factored so specs can
    * plant separable / constant / inverted features.
    */
  def aucByDim(scored: DataFrame): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    scored
      .withColumn("r", rank().over(Window.partitionBy($"dim").orderBy($"score")))
      .withColumn("t", count(lit(1)).over(Window.partitionBy($"dim", $"score")))
      .select($"dim", $"pos", (lit(2L) * $"r" + $"t" - 1L).as("dr"))
      .groupBy($"dim")
      .agg(sum($"pos").as("n_pos"),
        (count(lit(1)) - sum($"pos")).as("n_neg"),
        sum(when($"pos" === 1L, $"dr")).as("s2"))
      .selectExpr("dim", "n_pos", "n_neg",
        """CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
          |  ELSE floor(CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
          |    / CAST(2 * n_pos * n_neg AS DOUBLE) * 1e6 + 0.5) / 1e6
          |  END AS auc""".stripMargin)
  }

  val featureAucSql: String =
    s"""WITH ex AS (
       |  SELECT CAST(d.dim AS INT) AS dim,
       |    CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos,
       |    embedding[d.dim] AS score
       |  FROM embeddings
       |  CROSS JOIN (SELECT unnest(range(1, $AucDims + 1)) AS dim) d),
       |r AS (
       |  SELECT dim, pos,
       |    2 * rank() OVER (PARTITION BY dim ORDER BY score)
       |      + count(*) OVER (PARTITION BY dim, score) - 1 AS dr
       |  FROM ex),
       |g AS (
       |  SELECT dim, CAST(sum(pos) AS BIGINT) AS n_pos,
       |    CAST(count(*) - sum(pos) AS BIGINT) AS n_neg,
       |    CAST(sum(CASE WHEN pos = 1 THEN dr END) AS BIGINT) AS s2
       |  FROM r GROUP BY dim)
       |SELECT dim, n_pos, n_neg,
       |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
       |    ELSE floor(CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
       |      / CAST(2 * n_pos * n_neg AS DOUBLE) * 1e6 + 0.5) / 1e6
       |    END AS auc
       |FROM g""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_kmeans" -> (kmeans _),
    "sim_centroid_eval" -> (centroidEval _),
    "sim_feature_auc" -> (featureAuc _))

  def oracles: Map[String, String] = Map(
    "sim_kmeans" -> kmeansSql,
    "sim_centroid_eval" -> centroidEvalSql,
    "sim_feature_auc" -> featureAucSql)
}
