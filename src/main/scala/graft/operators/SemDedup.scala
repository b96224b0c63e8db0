package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.DotF64

/** Semantic deduplication (SemDeDup, Abbas et al., arXiv:2303.09540):
  * cluster the embedding collection with k-means, then drop every
  * vector that has a cosine-similar neighbor WITHIN ITS CLUSTER —
  * the embedding-space analogue of MinHash near-dup, and the standard
  * way web-scale corpora prune semantically redundant samples before
  * training.
  *
  * Composition story: the cluster model is [[KMeans.trainedCentroids]]
  * — the SAME memoized 5-iteration fit `sim_kmeans` and
  * `stream_kmeans_assign` verify — so this query is model reuse, not a
  * refit. Assignment is one distributed pass ([[KMeans.assign]]:
  * broadcast k-row centroid table, sequential-fold distance, (d, k)
  * tie-break).
  *
  * Scale shape: the pairwise stage is a self-join ON THE CLUSTER KEY —
  * never a global all-pairs. Work is Σ |cluster|², bounded by choosing
  * k ∝ n (the paper runs k ≈ 100k on LAION so mean cluster size stays
  * ~constant); here K = 8 over 500 vectors is the same plan at toy
  * scale. Skewed clusters are the known failure mode — at production
  * scale the mitigation is raising k, which changes ONLY the broadcast
  * model table, not the plan.
  *
  * Drop rule (deterministic): a vector is dropped iff some same-cluster
  * neighbor with a SMALLER vec_id is > τ cosine-similar — the greedy
  * keep-first convention the streaming near-dup path
  * (`stream_neardup`) already uses. Cosine is the sequential-fold dot
  * ([[graft.functions.DotF64]]) over exact doubles — bit-identical to
  * DuckDB's `list_reduce` fold, so the τ comparison can't diverge
  * between engines; the emitted value is only then rounded for output.
  *
  * Reference: the reference corpus has no embedding operators at all
  * (Kafka/Storm wordcount wiring — see SURVEY.md §2.7); this family is
  * the training-data-pipeline extension the brief mandates.
  */
object SemDedup {

  /** Cosine threshold for "semantic duplicate" — aligned with the LSH
    * near-dup verification bar (`sim_embedding_neardup` uses > 0.45) so
    * the two paths find the same planted duplicate structure.
    */
  val Tau = 0.45

  def semDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = KMeans.trainedCentroids(s, dir)
    val assigned = KMeans.assign(
      Tables.embeddings(s, dir).select($"vec_id", $"embedding"), cents)
    val v = assigned.select($"vec_id", $"k", $"embedding",
      sqrt(DotF64.dot_f64($"embedding", $"embedding")).as("nrm"))
      .localCheckpoint()
    val a = v.selectExpr("k", "vec_id AS vec_a", "embedding AS ea", "nrm AS na")
    val b = v.selectExpr("k", "vec_id AS vec_b", "embedding AS eb", "nrm AS nb")
    val dropped = a.join(b, "k")
      .where($"vec_a" < $"vec_b")
      .where(DotF64.dot_f64($"ea", $"eb") / ($"na" * $"nb") > Tau)
      .select($"vec_b".as("vec_id")).distinct()
      .withColumn("hit", lit(1))
    v.join(dropped, Seq("vec_id"), "left")
      .select($"vec_id", $"k".as("cluster"), $"hit".isNull.as("is_kept"))
  }

  /** DuckDB restatement: the unrolled fit + final assignment CTEs from
    * [[KMeans.fitAssignCtes]] (ending at `a_final`), then the identical
    * within-cluster pairwise cosine and keep-first drop rule.
    */
  def semDedupSql: String = {
    val dotAB = Similarity.duckDotExpr("a.embedding", "b.embedding")
    val dotSelf = Similarity.duckDotExpr("embedding", "embedding")
    s"""${KMeans.fitAssignCtes},
       |v AS (
       |  SELECT vec_id, k, embedding, sqrt($dotSelf) AS nrm
       |  FROM a_final),
       |dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM v a JOIN v b ON a.k = b.k AND a.vec_id < b.vec_id
       |  WHERE $dotAB / (a.nrm * b.nrm) > $Tau)
       |SELECT v.vec_id, CAST(v.k AS INT) AS cluster,
       |  (d.vec_id IS NULL) AS is_kept
       |FROM v LEFT JOIN dropped d ON d.vec_id = v.vec_id""".stripMargin
  }

  /** Neighbors kept per node in [[knnGraph]]. */
  val KnnK = 5

  /** Cell-scoped k-NN graph over the embedding collection — the
    * neighborhood index SemDeDup-style pipelines, label propagation
    * over embeddings, and NN-descent seeding all start from: for EVERY
    * vector, its [[KnnK]] most cosine-similar neighbors WITHIN its
    * k-means cell (same memoized [[KMeans.trainedCentroids]] model as
    * [[semDedup]] — model reuse, not a refit). Exact within the cell,
    * approximate globally — the standard IVF trade: recall is bounded
    * by cell purity, and the production knob is K ∝ n (identical story
    * to [[semDedup]]'s pair stage, which this generalizes from "any
    * neighbor above τ" to "the ranked top-k").
    *
    * Plan shape: self-join ON THE CLUSTER KEY (Σ |cell|² pair work,
    * never global all-pairs), cosine as the sequential-fold dot
    * ([[graft.functions.DotF64]] — bit-identical to DuckDB's
    * list_reduce fold, so ranks can't diverge), then a per-node
    * row_number window that the rn ≤ k filter lets Spark push as a
    * WindowGroupLimit (partial top-k BEFORE the window shuffle — the
    * property that keeps per-node state at k rows at 100 TB).
    */
  def knnGraph(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cents = KMeans.trainedCentroids(s, dir)
    val assigned = KMeans.assign(
      Tables.embeddings(s, dir).select($"vec_id", $"embedding"), cents)
    val v = assigned.select($"vec_id", $"k", $"embedding",
      sqrt(DotF64.dot_f64($"embedding", $"embedding")).as("nrm"))
      .localCheckpoint()
    val a = v.selectExpr("k", "vec_id", "embedding AS ea", "nrm AS na")
    val b = v.selectExpr("k", "vec_id AS nbr_id", "embedding AS eb", "nrm AS nb")
    val w = Window.partitionBy($"vec_id").orderBy($"cosine".desc, $"nbr_id")
    a.join(b, "k")
      .where($"vec_id" =!= $"nbr_id")
      .select($"vec_id", $"nbr_id",
        (DotF64.dot_f64($"ea", $"eb") / ($"na" * $"nb")).as("cosine"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= KnnK)
  }

  /** DuckDB restatement: the unrolled fit + assignment CTEs, the same
    * within-cell pair join, and the identical (cosine DESC, nbr_id)
    * rank — the fold cosine is bit-equal on both engines, so the raw
    * double is emitted unrounded (the `sim_ivf_topk` contract).
    */
  def knnGraphSql: String = {
    val dotAB = Similarity.duckDotExpr("a.embedding", "b.embedding")
    val dotSelf = Similarity.duckDotExpr("embedding", "embedding")
    s"""${KMeans.fitAssignCtes},
       |v AS (
       |  SELECT vec_id, k, embedding, sqrt($dotSelf) AS nrm
       |  FROM a_final),
       |scored AS (
       |  SELECT a.vec_id, b.vec_id AS nbr_id,
       |    $dotAB / (a.nrm * b.nrm) AS cosine
       |  FROM v a JOIN v b ON a.k = b.k AND a.vec_id <> b.vec_id)
       |SELECT vec_id, nbr_id, cosine, rn FROM (
       |  SELECT vec_id, nbr_id, cosine,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cosine DESC, nbr_id) AS rn
       |  FROM scored)
       |WHERE rn <= $KnnK""".stripMargin
  }

  /** Outliers reported by [[oodKnn]]. */
  val OodTopN = 20

  /** k-NN-distance OOD scoring over the [[knnGraph]] neighborhood —
    * the standard deep-OOD/outlier screen (Sun et al., ICML'22: the
    * distance to the k-th / mean-of-k nearest neighbors separates
    * out-of-distribution points better than density fits): a vector
    * whose own cell holds no close neighbors is an outlier candidate
    * for pruning or audit. Score = 1 − mean(top-k cosine), with each
    * cosine floor-rounded to 9 dp and decimal-summed so the mean is
    * partition-order-proof; emits the [[OodTopN]] most isolated
    * vectors (score DESC, id). Pure composition over the k-NN graph —
    * no new pair work at all.
    */
  def oodKnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy($"ood_score".desc, $"vec_id")
    knnGraph(s, dir)
      .select($"vec_id",
        expr("CAST(floor(cosine * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9))")
          .as("c9"))
      .groupBy($"vec_id")
      .agg(count(lit(1)).as("n_nbrs"), sum($"c9").as("csum"))
      .selectExpr("vec_id", "n_nbrs",
        "floor((1 - CAST(csum AS DOUBLE) / n_nbrs) * 1e6 + 0.5) / 1e6" +
          " AS ood_score")
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= OodTopN)
  }

  /** Oracle: the full k-NN-graph statement as a nested-WITH CTE, the
    * identical 9-dp rounds, decimal mean, and (score DESC, id) rank.
    */
  def oodKnnSql: String =
    s"""WITH knn AS ($knnGraphSql),
       |sc AS (
       |  SELECT vec_id, CAST(count(*) AS BIGINT) AS n_nbrs,
       |    sum(CAST(floor(cosine * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9)))
       |      AS csum
       |  FROM knn GROUP BY vec_id),
       |scored AS (
       |  SELECT vec_id, n_nbrs,
       |    floor((1 - CAST(csum AS DOUBLE) / n_nbrs) * 1e6 + 0.5) / 1e6
       |      AS ood_score
       |  FROM sc)
       |SELECT vec_id, n_nbrs, ood_score, rn FROM (
       |  SELECT vec_id, n_nbrs, ood_score,
       |    row_number() OVER (ORDER BY ood_score DESC, vec_id) AS rn
       |  FROM scored)
       |WHERE rn <= $OodTopN""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_semdedup" -> (semDedup _),
    "sim_knn_graph" -> (knnGraph _),
    "sim_ood_knn" -> (oodKnn _))

  def oracles: Map[String, String] = Map(
    "sim_semdedup" -> semDedupSql,
    "sim_knn_graph" -> knnGraphSql,
    "sim_ood_knn" -> oodKnnSql)
}
