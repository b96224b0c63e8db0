package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.functions.Hashing

/** Recall gate for the ANN family on CLUSTERED data. The driver fixtures
  * are isotropic random vectors, where angular LSH provably cannot beat
  * the scan fraction — so the oracle gate proves the bucketing contract
  * but says nothing about retrieval quality. This spec builds a
  * clustered synthetic collection (the shape real embeddings have) and
  * asserts recall@5 ≥ 0.9 for both approximate indexes against the
  * exact brute-force ranking — quality asserted, not just discussed.
  */
class SimilarityRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** 500 vectors in 20 tight angular clusters (center ± 10% noise),
    * deterministic via seeded splitmix. Queries (vec_id < 10) land in 10
    * distinct clusters.
    */
  private lazy val clusteredDir: String = {
    import spark.implicits._
    val dir = graft.TempDirs.scoped("recall_fixture")
    val nClusters = 20
    val centers = Array.tabulate(nClusters) { c =>
      Array.tabulate(64) { d =>
        Hashing.splitmix64(0xc105e2L + c * 64 + d).toDouble / Long.MaxValue
      }
    }
    (0 until 500).map { id =>
      val c = id % nClusters // queries 0..9 hit 10 different clusters
      val emb = Array.tabulate(64) { d =>
        val noise = Hashing.splitmix64(0x9015e7L + id.toLong * 64 + d)
          .toDouble / Long.MaxValue
        (centers(c)(d) + 0.1 * noise).toFloat
      }
      (id.toLong, emb)
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recallAt5(approx: Map[Long, Set[Long]],
      exact: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  test("LSH ANN recall@5 >= 0.9 on clustered embeddings") {
    val exact = topSets(Similarity.bruteForceTopK(spark, clusteredDir))
    val ann = topSets(Similarity.annTopK(spark, clusteredDir))
    val r = recallAt5(ann, exact)
    assert(exact.size == 10)
    assert(r >= 0.9, s"LSH ANN recall@5 = $r")
  }

  test("IVF ANN recall@5 >= 0.9 on clustered embeddings") {
    val exact = topSets(Similarity.bruteForceTopK(spark, clusteredDir))
    val ivf = topSets(Similarity.ivfTopK(spark, clusteredDir))
    val r = recallAt5(ivf, exact)
    assert(r >= 0.9, s"IVF recall@5 = $r")
  }

  test("PQ shortlist + re-rank recall@5 >= 0.9 on clustered embeddings") {
    // pure ADC ranking collapses inside a quantization cell (all members
    // share the same codes — measured recall ~0.2 on this fixture); the
    // registered two-stage form (ADC top-50 shortlist, exact re-rank)
    // must recover the true neighborhood
    val exact = topSets(Similarity.bruteForceTopK(spark, clusteredDir))
    val pq = topSets(Similarity.pqTopK(spark, clusteredDir))
    val r = recallAt5(pq, exact)
    assert(r >= 0.9, s"PQ recall@5 = $r")
  }

  test("IVF-PQ composed index recall@5 >= 0.85 on clustered embeddings") {
    // the composed index multiplies BOTH loss sources: a true neighbor
    // survives only if its coarse cell is probed AND it makes the ADC
    // shortlist AND the re-rank ranks it — so the gate is slightly
    // looser than the single-loss indexes, and the delta vs plain PQ
    // is exactly the probe miss rate the recall audit query measures
    val exact = topSets(Similarity.bruteForceTopK(spark, clusteredDir))
    val ip = topSets(Similarity.ivfPqTopK(spark, clusteredDir))
    val r = recallAt5(ip, exact)
    assert(r >= 0.85, s"IVF-PQ recall@5 = $r")
  }

  test("probe curve: monotone, exhaustive at rank K, and explains the production nProbe") {
    val rows = Similarity.ivfPqProbeCurve(spark, clusteredDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.length == Similarity.IvfK)
    // cumulative counts never fall; every truth pair's cell is ranked
    // somewhere, so the curve must reach exactly 1.0 at rank K
    rows.sliding(2).foreach {
      case Array((_, _, c1, r1), (_, _, c2, r2)) =>
        assert(c2 >= c1 && r2 >= r1)
      case _ =>
    }
    assert(rows.last._4 == 1.0)
    assert(rows.map(_._2).sum == rows.last._3)
    // on clustered data the production probe depth must already sit on
    // the flat part of the curve — the same ≥ 0.85 the end-to-end
    // IVF-PQ recall gate asserts, read here from candidate generation
    // alone (everything past it is ADC/re-rank loss, not probe loss)
    val atNProbe = rows(Similarity.IvfNProbe - 1)._4
    assert(atNProbe >= 0.85, s"cand recall at nProbe = $atNProbe")
  }

  test("IVF-PQ candidates are a subset of the probed coarse cells' members") {
    // structural containment: every returned neighbor must live in one
    // of its query's nProbe probed cells — the invariant that lets the
    // 100 TB plan skip (K - nProbe)/K of the collection entirely
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val cents = Similarity.ivfCentroids(spark, clusteredDir)
    val bc = spark.sparkContext.broadcast(cents)
    val v = graft.Tables.embeddings(spark, clusteredDir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val cell = v.map { case (id, emb) =>
      id -> Similarity.nearestCentroidOf(emb, bc.value)
    }.toMap
    val probed = v.filter(_._1 < 10).map { case (id, emb) =>
      id -> Similarity.centroidsByDistanceOf(emb, bc.value, Similarity.IvfNProbe).toSet
    }.toMap
    Similarity.ivfPqTopK(spark, clusteredDir)
      .select("q_id", "n_id").collect().foreach { r =>
        val (q, n) = (r.getLong(0), r.getLong(1))
        assert(probed(q).contains(cell(n)),
          s"neighbor $n of query $q returned from unprobed cell ${cell(n)}")
      }
  }
}
