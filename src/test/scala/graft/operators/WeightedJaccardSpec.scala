package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Weighted (multiset) Jaccard: the overlap measure that sees in-doc
  * repetition. Pins (1) the divergence from set Jaccard on a planted
  * banner-spam pair, (2) exact values on hand-computable fixtures, and
  * (3) equality with a brute-force multiset-Jaccard computed in plain
  * Scala over randomized corpora — thresholding included, so both the
  * kept values and the kept SET must match.
  */
class WeightedJaccardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(docs: Seq[(Long, String)]): Map[(Long, Long), (Long, Double)] = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("wjacc").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    Dedup.weightedJaccard(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
  }

  /** Brute force: multiset trigram counts per doc, J_w = Σmin/Σmax. */
  private def bruteForce(docs: Seq[(Long, String)]): Map[(Long, Long), (Long, Double)] = {
    def grams(t: String): Map[String, Long] = {
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.length < 3) Map.empty
      else toks.sliding(3).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, occ) => g -> occ.length.toLong }
    }
    val byDoc = docs.map { case (id, t) => id -> grams(t) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, ga) <- byDoc; (ib, gb) <- byDoc if ia < ib
      sharedMin = (ga.keySet & gb.keySet).toSeq
        .map(g => math.min(ga(g), gb(g))).sum
      if sharedMin > 0
      na = ga.values.sum; nb = gb.values.sum
      wj = math.floor(sharedMin.toDouble / (na + nb - sharedMin) * 1e6 + 0.5) / 1e6
      if wj >= Dedup.WeightedJaccThresh
    } yield (ia, ib) -> (sharedMin, wj)).toMap
  }

  test("banner spam: set Jaccard is blind to repetition, weighted is not") {
    val banner = "click here now"
    val spam = Seq.fill(10)(banner).mkString(" ") // 10 pasted copies
    val docs = Seq(1L -> banner, 2L -> spam, 3L -> spam)
    // set Jaccard calls (1,2) a near-dup at threshold 0.2: identical
    // distinct-gram SETS... (both contain "click here now" and the
    // wrap-around grams). The weighted measure scores the pair by mass:
    // banner has 1 trigram, spam has 28 (30 tokens), Σmin = 1,
    // J_w = 1/(1+28-1) = 1/28 ≈ 0.036 — under the 0.2 bar, so the
    // weighted pipeline keeps only the genuinely duplicated (2,3).
    val got = run(docs)
    assert(!got.contains((1L, 2L)) && !got.contains((1L, 3L)),
      s"repetition-inflated pair leaked through: $got")
    assert(got((2L, 3L)) == (28L, 1.0), s"true dup pair: ${got.get((2L, 3L))}")
    // the set measure DOES keep (1,2) on the same corpus — the planted
    // divergence this operator exists for
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("wjacc_set").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val setPairs = Dedup.ngramJaccard(spark, tmp)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(setPairs.contains((1L, 2L)),
      s"fixture no longer diverges — set pipeline dropped (1,2): $setPairs")
  }

  test("hand-computed partial overlap") {
    // d1: a b c d  → grams {abc:1, bcd:1}, n=2
    // d2: a b c e  → grams {abc:1, bce:1}, n=2
    // Σmin = 1, J_w = 1/(2+2-1) = 1/3 → micro-rounded 0.333333
    val got = run(Seq(1L -> "a b c d", 2L -> "a b c e"))
    assert(got((1L, 2L)) == (1L, 0.333333), s"$got")
  }

  test("in-doc repetition on BOTH sides counts min mass, not presence") {
    // d1 repeats gram (a a a) 3 times: tokens a*5 → grams {aaa:3}, n=3
    // d2: a*4 → {aaa:2}, n=2. Σmin=2, J_w = 2/(3+2-2) = 2/3 → 0.666667
    val got = run(Seq(1L -> "a a a a a", 2L -> "a a a a"))
    assert(got((1L, 2L)) == (2L, 0.666667), s"$got")
  }

  test("expansion minhash: exact on identical multisets, in-band on partial overlap") {
    import spark.implicits._
    // d1 == d2 (weighted J = 1.0, bucket 9): identical expansions give
    // IDENTICAL signatures, so the estimator must be exactly 1.0 there.
    // d3 shares the first 30 tokens with d1: Σmin = 28 shared grams,
    // n = 58 each → wj = 28/88 ≈ 0.318 (bucket 3); a 64-component
    // estimator has σ ≈ 0.058 at that J, so 0.25 is a >4σ band.
    val a = (0 until 60).map(i => s"w$i").mkString(" ")
    val b = ((0 until 30).map(i => s"w$i") ++
      (0 until 30).map(i => s"v$i")).mkString(" ")
    val docs = Seq(1L -> a, 2L -> a, 3L -> b)
    val tmp = java.nio.file.Files.createTempDirectory("wmh").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.wminhashCalibration(spark, tmp).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out.keySet == Set(3, 9), s"buckets: $out")
    assert(out(9) == (1L, 0.0, 0.0), s"identical pair: ${out(9)}")
    val (n3, _, maxErr3) = out(3)
    assert(n3 == 2L)
    assert(maxErr3 <= 0.25, s"bucket-3 max err $maxErr3")
  }

  test("property: operator equals brute-force multiset Jaccard on random corpora") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 6) {
      val vocab = (0 until 4 + rnd.nextInt(5)).map(i => s"t$i")
      val docs = (0L until (6L + rnd.nextInt(5))).map { id =>
        val n = rnd.nextInt(30) // includes <3-token degenerates
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val got = run(docs)
      val want = bruteForce(docs)
      assert(got == want,
        s"trial $trial: got ${got.toSeq.sorted.take(8)}... want ${want.toSeq.sorted.take(8)}...")
    }
  }
}
