package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Document clustering over hashed token-count features — the domain-
  * discovery stage a pretraining mixture pipeline runs before setting
  * mixture weights (cluster the corpus, inspect/weight the clusters;
  * cf. `curate_mix_weights` which consumes per-group masses).
  *
  * Design for exactness and scale, in that order:
  *
  *   - Features are FEATURE-HASHED token counts: dim = md5-60(token)
  *     mod 16, value = occurrences. Integer counts, built in one
  *     narrow explode + one (doc_id)-keyed aggregate — the hashing
  *     trick bounds the feature width regardless of vocabulary, which
  *     is what makes the centroid update a fixed-width partial
  *     aggregate at any corpus size.
  *   - Lloyd's iterations run in pure INTEGER arithmetic: centroids
  *     live in micro-units (`(1e6·Σx) div n` — integer floor division),
  *     distances are Σ(1e6·x − c)² in longs (bounded: counts ≤ ~10³,
  *     so each term ≤ (1e9)² and the 16-term sum < 2^62), ties broken
  *     by smaller cluster id. Both engines run the identical integer
  *     expressions — no floating point anywhere in the fit, so the
  *     oracle match is exact by construction, not by rounding
  *     discipline.
  *   - K=4 centroids × 16 dims is the only driver round-trip per
  *     iteration (the [[KMeans]] contract: model moves, data does
  *     not); assignment embeds the centroids as LITERALS — a pure
  *     narrow map, no join, no broadcast, whole-stage-codegen'd.
  *   - Empty clusters retain their previous centroid (the [[KMeans]]
  *     rule, restated in the oracle's coalesce).
  *
  * At 100 TB: per iteration one scan-side 16-column partial aggregate
  * (map-side combine does almost all the work), K×16 longs to the
  * driver, and a literal-expression re-assignment — the same cost
  * shape as `sim_kmeans`, with the feature build replacing the
  * embedding read.
  */
object DocCluster {

  val DocK = 4
  val DocDims = 16
  val DocIters = 3

  /** md5-60 of the token string, mod DocDims — identical bytes hashed
    * on both engines (`CAST('0x' || substr(md5(tok), 1, 15) AS
    * BIGINT) % 16` in DuckDB).
    */
  private def dimOf(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long") %
      DocDims

  /** Per-doc hashed count vector as 16 integer columns c0..c15 (docs
    * with ≥1 token only).
    */
  private[operators] def docFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .selectExpr("doc_id",
        "filter(split(lower(text), '\\\\s+'), t -> t <> '') AS t")
      .where("size(t) > 0")
      .select($"doc_id", explode($"t").as("tok"))
    val dims = toks.select($"doc_id", dimOf($"tok").as("dim"))
    val aggs = (0 until DocDims).map(j =>
      sum(when($"dim" === j, 1L).otherwise(0L)).as(s"c$j"))
    dims.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Squared distance (micro-units²) from a doc's count columns to a
    * literal centroid — 16 long terms, no join.
    */
  private def distExpr(cent: Seq[Long]): Column =
    (0 until DocDims).map { j =>
      val d = lit(1000000L) * col(s"c$j") - lit(cent(j))
      d * d
    }.reduce(_ + _)

  /** Nearest-centroid id with ties to the smaller k: min over
    * (distance, k) structs — lexicographic struct ordering is the
    * `ORDER BY dist, k` rule as one codegen expression.
    */
  private def assignExpr(cents: Seq[(Int, Seq[Long])]): Column =
    array_min(array(cents.map { case (k, cv) =>
      struct(distExpr(cv).as("d"), lit(k).as("k"))
    }: _*)).getField("k")

  /** Fixed-iteration Lloyd fit; returns the final centroids
    * (micro-units). Seeds are the 4 smallest doc_ids' raw vectors.
    */
  private[operators] def fitCentroids(s: SparkSession, dir: String)
      : Seq[(Int, Seq[Long])] = {
    import s.implicits._
    val f = docFeatures(s, dir).cache()
    val seed = f.orderBy($"doc_id").limit(DocK).collect()
      .sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, k) =>
        (k, (0 until DocDims).map(j => 1000000L * r.getLong(j + 1)))
      }.toSeq
    (1 to DocIters).foldLeft(seed) { (cents, _) =>
      val assigned = f.withColumn("cluster", assignExpr(cents))
      val sums = (0 until DocDims).map(j => sum(col(s"c$j")).as(s"s$j"))
      val upd = assigned.groupBy($"cluster")
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
        .map { r =>
          val k = r.getInt(0)
          val n = r.getLong(1)
          k -> (0 until DocDims).map(j =>
            Math.floorDiv(1000000L * r.getLong(j + 2), n))
        }.toMap
      cents.map { case (k, prev) => (k, upd.getOrElse(k, prev)) }
    }
  }

  /** Registered query: every tokenized document with its final cluster
    * id after [[DocIters]] iterations.
    */
  def clusterKmeans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = fitCentroids(s, dir)
    docFeatures(s, dir)
      .select($"doc_id", assignExpr(cents).as("cluster"))
  }

  // --------------------------------------------------------- oracle SQL

  private val featCols: String = (0 until DocDims).map(j =>
    s"sum(CASE WHEN dim = $j THEN 1 ELSE 0 END) AS c$j").mkString(",\n    ")

  private def sqlDist(f: String, c: String): String =
    (0 until DocDims).map(j =>
      s"(1000000*$f.c$j - $c.m$j)*(1000000*$f.c$j - $c.m$j)")
      .mkString(" + ")

  private def sqlAssign(centCte: String, out: String): String =
    s"""$out AS (
       |  SELECT doc_id, k FROM (
       |    SELECT f.doc_id, c.k,
       |      row_number() OVER (PARTITION BY f.doc_id ORDER BY
       |        ${sqlDist("f", "c")}, c.k) AS rn
       |    FROM f CROSS JOIN $centCte c)
       |  WHERE rn = 1)""".stripMargin

  private def sqlIter(i: Int): String = {
    val p = i - 1
    val sums = (0 until DocDims).map(j => s"sum(f.c$j) AS s$j")
      .mkString(", ")
    val means = (0 until DocDims).map(j =>
      s"coalesce((1000000*u.s$j) // u.n, p.m$j) AS m$j").mkString(",\n    ")
    s"""${sqlAssign(s"cent$p", s"a$i")},
       |u$i AS (
       |  SELECT a.k, count(*) AS n, $sums
       |  FROM a$i a JOIN f ON f.doc_id = a.doc_id GROUP BY a.k),
       |cent$i AS (
       |  SELECT p.k, $means
       |  FROM cent$p p LEFT JOIN u$i u ON u.k = p.k)""".stripMargin
  }

  val clusterKmeansSql: String = {
    val seedCols = (0 until DocDims).map(j => s"1000000*c$j AS m$j")
      .mkString(", ")
    val iters = (1 to DocIters).map(sqlIter).mkString(",\n")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      t -> t <> '')) AS tok
       |  FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    $featCols
       |  FROM (SELECT doc_id,
       |          CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % $DocDims AS dim
       |        FROM toks)
       |  GROUP BY doc_id),
       |cent0 AS (
       |  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS k, $seedCols
       |  FROM (SELECT * FROM f ORDER BY doc_id LIMIT $DocK)),
       |$iters,
       |${sqlAssign(s"cent$DocIters", "a_final")}
       |SELECT doc_id, CAST(k AS INT) AS cluster FROM a_final""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_cluster_kmeans" -> (clusterKmeans _))

  def oracles: Map[String, String] = Map(
    "doc_cluster_kmeans" -> clusterKmeansSql)
}
