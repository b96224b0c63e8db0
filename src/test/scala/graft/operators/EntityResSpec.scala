package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** er_sorted_neighborhood — sorted-neighborhood blocking. Pins (1) the
  * window semantics (candidates are rank-adjacency pairs, so the 6th
  * copy of an identical text falls outside the W=5 window of the 1st),
  * (2) exact verifier values, and (3) equality with a brute-force
  * Scala restatement (sort, window, trigram Jaccard) on random corpora
  * including ties and short docs.
  */
class EntityResSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(docs: Seq[(Long, String)]): Map[(Long, Long), Double] = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("er").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    EntityRes.erSortedNeighborhood(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  private def bruteForce(docs: Seq[(Long, String)]): Map[(Long, Long), Double] = {
    def norm(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def grams(tk: Seq[String]) = tk.sliding(3).map(_.mkString(" ")).toSet
    val ranked = docs
      .map { case (id, t) => (id, norm(t)) }
      .filter(_._2.length >= 3)
      .map { case (id, tk) => (id, tk.mkString(" ").take(24), grams(tk)) }
      .sortBy { case (id, k, _) => (k, id) }
    (for {
      i <- ranked.indices; k <- 1 until EntityRes.ErWindow
      if i + k < ranked.length
      (ia, _, ga) = ranked(i); (ib, _, gb) = ranked(i + k)
      inter = (ga & gb).size
      j = math.floor(inter.toDouble / (ga.size + gb.size - inter) * 1e6 + 0.5) / 1e6
      if j >= EntityRes.ErJaccThresh
    } yield (math.min(ia, ib), math.max(ia, ib)) -> j).toMap
  }

  test("window truncation: the 6th identical copy is outside copy 1's window") {
    val t = "alpha beta gamma delta epsilon"
    val docs = (0L to 5L).map(i => i -> t)
    val got = run(docs)
    // ranks are (bkey, doc_id) → doc order; W=5 pairs gaps 1..4
    assert(!got.contains((0L, 5L)), s"gap-5 pair leaked: $got")
    assert(got((0L, 4L)) == 1.0 && got((0L, 1L)) == 1.0)
    assert(got.size == 14, s"${got.size} pairs (want 5+4+3+2): $got")
  }

  test("adjacent-sorting near-match verifies with exact jaccard") {
    // same 24-char prefix → adjacent ranks; one word differs at the tail
    val a = "customer john smith main street springfield unit seven"
    val b = "customer john smith main street springfield unit eight"
    // far doc sorts away and shares nothing
    val docs = Seq(1L -> a, 2L -> b, 3L -> "zzz yyy xxx www vvv uuu")
    val got = run(docs)
    assert(got.keySet == Set((1L, 2L)), s"$got")
    assert(got((1L, 2L)) == bruteForce(docs)((1L, 2L)))
  }

  test("property: equals the brute-force sorted-neighborhood on random corpora") {
    val rnd = new scala.util.Random(816L)
    for (trial <- 0 until 5) {
      val vocab = (0 until 6).map(i => s"w$i")
      val docs = (0L until (10L + rnd.nextInt(8))).map { id =>
        val n = rnd.nextInt(12)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      assert(run(docs) == bruteForce(docs), s"trial $trial")
    }
  }
}
