package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.Hashing

/** The unbounded AllPairs prefix-filter join, proven on a fixture where
  * prefix filtering has something to prune: a Zipfian vocabulary (rank
  * frequency ∝ 1/r, the shape of every real corpus — and precisely what
  * the driver's synthetic flat-vocabulary `documents` table lacks, see
  * the [[TextOps.tfidfCosineTopk]] crossover note). Pins BOTH halves of
  * the honesty claim: candidate count ≪ n²/2, and the surviving pairs
  * are exactly the brute-force truth (sound AND complete).
  */
class AllPairsCosineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val NDocs = 200
  val Vocab = 2000
  val DocLen = 30
  val Planted = 8
  val Threshold = 0.8

  /** Deterministic Zipfian corpus: token rank = floor(V^u) with u
    * uniform from splitmix64 — log-uniform ranks give P(rank=r) ∝ 1/r.
    * The last `Planted` docs repeat the first docs' tokens (one token
    * changed), planting near-dup pairs the join must find.
    */
  private def zipfVectors() = {
    import spark.implicits._
    def tokensOf(doc: Int): Seq[String] = (0 until DocLen).map { k =>
      val u = (Hashing.splitmix64(0x5eedL + doc.toLong * DocLen + k) >>> 11)
        .toDouble / (1L << 53).toDouble
      val rank = math.min(Vocab - 1, math.pow(Vocab.toDouble, u).toInt)
      "t" + rank
    }
    val rows = (0 until NDocs).flatMap { d =>
      val toks =
        if (d >= NDocs - Planted) {
          val base = tokensOf(d - (NDocs - Planted))
          base.updated(0, "t" + (Vocab + d)) // one-token edit
        } else tokensOf(d)
      toks.groupBy(identity).map { case (t, g) =>
        (d.toLong, t, g.size.toDouble)
      }
    }
    val tf = rows.toDF("doc_id", "term", "tf")
    // tf-idf weights: common (low-rank) terms get tiny idf, so the
    // maxweight suffix bound decays fast — what makes prefixes short
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("dfq"))
    tf.join(dfreq, "term")
      .select($"doc_id", $"term",
        ($"tf" * log(lit(NDocs.toDouble) / $"dfq")).as("w"))
      .where($"w" > 0) // corpus-universal terms carry zero signal
  }

  test("prefix filter prunes: candidates are a small fraction of n^2 on Zipf data") {
    val vectors = zipfVectors().localCheckpoint()
    val nPairs = NDocs.toLong * (NDocs - 1) / 2
    val cands = TextOps.allPairsCandidates(vectors, Threshold).count()
    assert(cands < nPairs / 10,
      s"prefix filter generated $cands of $nPairs possible pairs — not pruning")
    assert(cands >= Planted, s"only $cands candidates — planted pairs missed?")
  }

  test("prefix-filtered result equals the brute-force truth (sound and complete)") {
    import spark.implicits._
    val vectors = zipfVectors().localCheckpoint()
    val fast = TextOps.allPairsCosine(vectors, Threshold)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => ((a, b), c) }.toMap
    // brute force: every pair through the same map-dot verification
    val norms = vectors.groupBy($"doc_id")
      .agg(sqrt(sum($"w" * $"w")).as("nrm"))
    val unit = vectors.join(norms, "doc_id")
      .select($"doc_id", $"term", ($"w" / $"nrm").as("w"))
    val maps = unit.groupBy($"doc_id")
      .agg(map_from_entries(collect_list(struct($"term", $"w"))).as("vec"))
    val brute = maps.select($"doc_id".as("doc_a"), $"vec".as("va"))
      .crossJoin(maps.select($"doc_id".as("doc_b"), $"vec".as("vb")))
      .where($"doc_a" < $"doc_b")
      .withColumn("cosine", expr(
        """aggregate(map_entries(va), CAST(0 AS DOUBLE),
          |  (acc, e) -> acc + e.value * coalesce(vb[e.key], CAST(0 AS DOUBLE)))""".stripMargin))
      .where($"cosine" >= Threshold)
      .select($"doc_a", $"doc_b", $"cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => ((a, b), c) }.toMap
    assert(fast.keySet == brute.keySet,
      s"missed=${(brute.keySet -- fast.keySet).take(5)} " +
        s"extra=${(fast.keySet -- brute.keySet).take(5)}")
    assert(brute.nonEmpty && brute.size >= Planted,
      s"fixture planted $Planted near-dup pairs, brute force found ${brute.size}")
    fast.foreach { case (k, c) =>
      assert(math.abs(c - brute(k)) < 1e-9, s"cosine mismatch at $k")
    }
  }
}
