package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Principal component analysis at cluster scale — the standard
  * decomposition: ONE distributed pass reduces the data to its exact
  * second-moment matrix (a map-side-combinable aggregate producing a
  * single 1-row frame; the only thing that crosses the wire is
  * D·(D+3)/2 sums), then the eigensolve runs on that tiny matrix with
  * the data never touched again — the same shape MLlib's
  * RowMatrix.computePrincipalComponents ships, restated engine-neutrally.
  * The eigensolve here is [[Iters]] unrolled power-iteration steps
  * (multiply, norm, normalize) over the 1-row covariance frame.
  *
  * Cross-engine exactness: element products ride the 6-dp-round →
  * DECIMAL(18,9) sum convention (partition-order-proof), and every
  * post-aggregate expression — covariance entries, the 64 multiply
  * terms per step, the norm — is GENERATED ONCE from the same
  * templates for both engines, so Spark and DuckDB execute textually
  * identical IEEE arithmetic (left-folded parenthesization pins the
  * operation order). The sign is normalized so the first component is
  * non-negative (eigenvectors are sign-ambiguous); outputs floor-pin
  * 6 dp. The eigenvalue is the final step's pre-normalization norm
  * ‖C·v‖ — the power-iteration estimate of λ₁.
  *
  * [[D]] = 8 leading dimensions (the matryoshka prefix convention);
  * the plan is unchanged at any D — only the 1-row matrix widens.
  */
object Pca {

  val D = 8
  val Iters = 8

  // ---- expression templates shared verbatim by both engines ----
  private def fold(terms: Seq[String]): String =
    terms.reduce((a, b) => s"($a + $b)")

  private def wExpr(j: Int): String =
    fold((0 until D).map(k => s"c${j}_$k * v$k"))

  private val normExpr: String =
    "sqrt(" + fold((0 until D).map(k => s"w$k * w$k")) + ")"

  private def covExpr(j: Int, k: Int): String = {
    val p = if (j <= k) s"p${j}_$k" else s"p${k}_$j"
    s"($p - CAST(n AS DOUBLE) * m$j * m$k) / CAST(n - 1 AS DOUBLE)"
  }

  private val covCols: Seq[String] =
    for { j <- 0 until D; k <- 0 until D } yield s"c${j}_$k"

  def pca(s: SparkSession, dir: String): DataFrame =
    pcaOf(Tables.embeddings(s, dir))

  /** PCA over any frame with an `embedding` array column — factored
    * for planted-fixture specs.
    */
  def pcaOf(vecs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val e = vecs.selectExpr(
      (0 until D).map(j => s"CAST(embedding[$j] AS DOUBLE) AS e$j"): _*)
    val momAggs =
      Seq("count(1) AS n") ++
      (0 until D).map(j => s"sum(CAST(round(e$j, 6) AS DECIMAL(18,9))) AS s$j") ++
      (for { j <- 0 until D; k <- j until D }
        yield s"sum(CAST(round(e$j * e$k, 6) AS DECIMAL(18,9))) AS p${j}_$k")
    val mom = e.agg(expr(momAggs.head), momAggs.tail.map(expr): _*)
    val m = mom.selectExpr(
      Seq("n") ++
      (0 until D).map(j => s"CAST(s$j AS DOUBLE) / n AS m$j") ++
      (for { j <- 0 until D; k <- j until D }
        yield s"CAST(p${j}_$k AS DOUBLE) AS p${j}_$k"): _*)
    val cov = m.selectExpr(
      Seq("n") ++
      (for { j <- 0 until D; k <- 0 until D }
        yield s"${covExpr(j, k)} AS c${j}_$k"): _*)
    var it = cov.selectExpr(
      covCols ++ (0 until D).map(j => s"1.0 / sqrt(8.0) AS v$j"): _*)
    for (_ <- 1 to Iters) {
      it = it.selectExpr(
        covCols ++ (0 until D).map(j => s"${wExpr(j)} AS w$j"): _*)
      it = it.selectExpr(
        covCols ++ (0 until D).map(j => s"w$j") :+ s"$normExpr AS nw": _*)
      it = it.selectExpr(
        covCols ++ (0 until D).map(j => s"w$j / nw AS v$j") :+ "nw": _*)
    }
    it.selectExpr(
        Seq("nw", "CASE WHEN v0 < 0 THEN -1.0 ELSE 1.0 END AS sgn") ++
        (0 until D).map(j => s"v$j"): _*)
      .selectExpr(
        Seq("floor(nw * 1e6 + 0.5) / 1e6 AS eigenvalue") ++
        (0 until D).map(j => s"floor(sgn * v$j * 1e6 + 0.5) / 1e6 AS ev$j"): _*)
  }

  /** The oracle is the same pipeline as chained CTEs — built from the
    * SAME expression templates, so the arithmetic text is identical.
    * DuckDB lists are 1-indexed, hence `embedding[j+1]`.
    */
  private val outCols: String = (
    Seq("floor(nw * 1e6 + 0.5) / 1e6 AS eigenvalue") ++
    (0 until D).map(j => s"floor(sgn * v$j * 1e6 + 0.5) / 1e6 AS ev$j")
    ).mkString(", ")

  /** All CTEs through `signed` — shared by [[pcaSql]] and the
    * projection oracle.
    */
  private val pcaCtes: String = {
    val eCols = (0 until D)
      .map(j => s"CAST(embedding[${j + 1}] AS DOUBLE) AS e$j").mkString(", ")
    val momCols = (
      Seq("CAST(count(*) AS BIGINT) AS n") ++
      (0 until D).map(j => s"sum(CAST(round(e$j, 6) AS DECIMAL(18,9))) AS s$j") ++
      (for { j <- 0 until D; k <- j until D }
        yield s"sum(CAST(round(e$j * e$k, 6) AS DECIMAL(18,9))) AS p${j}_$k")
      ).mkString(", ")
    val mCols = (
      Seq("n") ++
      (0 until D).map(j => s"CAST(s$j AS DOUBLE) / n AS m$j") ++
      (for { j <- 0 until D; k <- j until D }
        yield s"CAST(p${j}_$k AS DOUBLE) AS p${j}_$k")
      ).mkString(", ")
    val cCols = (Seq("n") ++
      (for { j <- 0 until D; k <- 0 until D }
        yield s"${covExpr(j, k)} AS c${j}_$k")).mkString(", ")
    val v0Cols = (covCols ++
      (0 until D).map(j => s"1.0 / sqrt(8.0) AS v$j")).mkString(", ")
    val iters = (1 to Iters).map { i =>
      val prev = if (i == 1) "it0" else s"it${i - 1}_v"
      val wSel = (covCols ++
        (0 until D).map(j => s"${wExpr(j)} AS w$j")).mkString(", ")
      val nSel = (covCols ++ (0 until D).map(j => s"w$j") :+
        s"$normExpr AS nw").mkString(", ")
      val vSel = (covCols ++
        (0 until D).map(j => s"w$j / nw AS v$j") :+ "nw").mkString(", ")
      s"""it${i}_w AS (SELECT $wSel FROM $prev),
         |it${i}_n AS (SELECT $nSel FROM it${i}_w),
         |it${i}_v AS (SELECT $vSel FROM it${i}_n)""".stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT $eCols FROM embeddings),
       |mom AS (SELECT $momCols FROM e),
       |m AS (SELECT $mCols FROM mom),
       |cov AS (SELECT $cCols FROM m),
       |it0 AS (SELECT $v0Cols FROM cov),
       |$iters,
       |signed AS (
       |  SELECT nw, CASE WHEN v0 < 0 THEN -1.0 ELSE 1.0 END AS sgn,
       |    ${(0 until D).map(j => s"v$j").mkString(", ")}
       |  FROM it${Iters}_v)""".stripMargin
  }

  val pcaSql: String =
    s"WITH $pcaCtes\nSELECT $outCols FROM signed"

  /** Fit-then-transform — the second pass every PCA deployment runs:
    * project each vector onto the fitted component and report, per
    * class label, the mean score and the mean squared residual
    * (‖e‖² − proj², the energy the top component fails to explain —
    * between-class separation of mean scores is the 1-D LDA-style
    * readout). The component arrives as the 1-row [[pca]] result
    * CROSS-JOINED (broadcast) onto the data — the fitted model is
    * floor-pinned at 6 dp FIRST, so both engines project with
    * bit-identical coefficients and the dot products are the same
    * left-folded IEEE sequence. One narrow map over the collection,
    * one label-keyed aggregate under the decimal-sum convention.
    */
  def pcaProject(s: SparkSession, dir: String): DataFrame =
    pcaProjectOf(Tables.embeddings(s, dir))

  def pcaProjectOf(vecs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val comp = pcaOf(vecs)
    val projExpr = fold((0 until D).map(j => s"e$j * ev$j"))
    val norm2Expr = fold((0 until D).map(j => s"e$j * e$j"))
    vecs.selectExpr(Seq("label") ++
        (0 until D).map(j => s"CAST(embedding[$j] AS DOUBLE) AS e$j"): _*)
      .crossJoin(broadcast(comp))
      .selectExpr("label", s"$projExpr AS proj", s"$norm2Expr AS norm2")
      .selectExpr("label",
        "CAST(round(proj, 6) AS DECIMAL(18,9)) AS pterm",
        "CAST(round(norm2 - proj * proj, 6) AS DECIMAL(18,9)) AS rterm")
      .groupBy("label")
      .agg(
        org.apache.spark.sql.functions.expr("count(1) AS n"),
        org.apache.spark.sql.functions.expr(
          "floor(CAST(sum(pterm) AS DOUBLE) / count(1) * 1e6 + 0.5) / 1e6 AS mean_proj"),
        org.apache.spark.sql.functions.expr(
          "floor(CAST(sum(rterm) AS DOUBLE) / count(1) * 1e6 + 0.5) / 1e6 AS mean_residual2"))
  }

  val pcaProjectSql: String = {
    val projExpr = fold((0 until D).map(j => s"e$j * ev$j"))
    val norm2Expr = fold((0 until D).map(j => s"e$j * e$j"))
    val eCols = (0 until D)
      .map(j => s"CAST(embedding[${j + 1}] AS DOUBLE) AS e$j").mkString(", ")
    s"""WITH $pcaCtes,
       |pc AS (SELECT $outCols FROM signed),
       |ex AS (SELECT label, $eCols FROM embeddings),
       |proj AS (
       |  SELECT label, $projExpr AS proj, $norm2Expr AS norm2
       |  FROM ex CROSS JOIN pc),
       |terms AS (
       |  SELECT label,
       |    CAST(round(proj, 6) AS DECIMAL(18,9)) AS pterm,
       |    CAST(round(norm2 - proj * proj, 6) AS DECIMAL(18,9)) AS rterm
       |  FROM proj)
       |SELECT label, CAST(count(*) AS BIGINT) AS n,
       |  floor(CAST(sum(pterm) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
       |    AS mean_proj,
       |  floor(CAST(sum(rterm) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
       |    AS mean_residual2
       |FROM terms GROUP BY label""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_pca_power" -> (pca _),
    "sim_pca_project" -> (pcaProject _))

  def oracles: Map[String, String] = Map(
    "sim_pca_power" -> pcaSql,
    "sim_pca_project" -> pcaProjectSql)
}
