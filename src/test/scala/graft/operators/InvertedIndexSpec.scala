package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class InvertedIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("invidx").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** The registered query's set elements: distinct word trigrams. */
  private def shingleSet(t: String): Set[String] = {
    val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  /** Brute-force exact Jaccard ≥ 3/5 pairs over arbitrary sets — the
    * reference the prefix-filtered join must equal.
    */
  private def naiveFromSets(
      sets: Seq[(Long, Set[String])]): Set[(Long, Long, Long)] = {
    val ne = sets.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- ne; (ib, sb) <- ne if ia < ib
      inter = (sa & sb).size
      if 8L * inter >= 3L * (sa.size + sb.size)
    } yield (ia, ib, inter.toLong)).toSet
  }

  private def naivePairs(rows: Seq[(Long, String)]): Set[(Long, Long, Long)] =
    naiveFromSets(rows.map { case (id, t) => id -> shingleSet(t) })

  private def tokFrame(sets: Seq[(Long, Set[String])]) = {
    import spark.implicits._
    sets.flatMap { case (id, s) => s.map(id -> _) }.toDF("doc_id", "token")
  }

  test("ppjoin finds the planted near-dup pair at the exact jaccard, and only it") {
    // A: w0..w19 (18 trigrams); B: w0..w17 x y (18 trigrams, 16 shared
    // -> J = 16/20 = 0.8); C: half-overlapping run (8/28 < 0.6); D: disjoint
    val a = (0 until 20).map(i => s"w$i").mkString(" ")
    val b = ((0 until 18).map(i => s"w$i") ++ Seq("x", "y")).mkString(" ")
    val c = ((0 until 10).map(i => s"w$i") ++ (0 until 10).map(i => s"z$i")).mkString(" ")
    val d = (0 until 20).map(i => s"v$i").mkString(" ")
    val dir = writeDocs(Seq(1L -> a, 2L -> b, 3L -> c, 4L -> d))
    val out = InvertedIndex.ppjoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(out.length == 1)
    val (da, db, shared, j) = out.head
    assert((da, db, shared) == (1L, 2L, 16L))
    assert(math.abs(j - 16.0 / 20.0) < 1e-12)
  }

  test("ppjoin equals the brute-force all-pairs join on random mutated corpora (filter is lossless)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 4) {
      val vocab = (0 until 20).map(i => s"t$i")
      def randDoc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
      // mutated copies of base docs force many near-threshold trigram overlaps
      val bases = Seq.fill(6)(randDoc(8 + rnd.nextInt(12)))
      val rows = (1L to 24L).map { id =>
        val base = bases(rnd.nextInt(bases.size)).toArray
        for (_ <- 0 until rnd.nextInt(4))
          base(rnd.nextInt(base.length)) = vocab(rnd.nextInt(vocab.size))
        id -> base.mkString(" ")
      }
      val got = InvertedIndex.ppjoin(spark, dir = writeDocs(rows)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == naivePairs(rows), s"trial $trial")
    }
  }

  test("prefix filter skips hot boilerplate postings: fewer candidates than the naive join") {
    // every doc shares 4 boilerplate elements; rare tails are unique per
    // doc -> no real near-dups, but the naive shared-element join pairs
    // EVERYTHING. Algebra pinned on a hand-built set frame.
    val sets = (1L to 20L).map(id =>
      id -> (Set("the", "a", "of", "and") ++
        (0 until 6).map(k => s"u${id}x$k").toSet))
    val nCand = InvertedIndex.ppjoinCandidates(spark, tokFrame(sets)).count()
    val naiveSharedTokenPairs = 20L * 19L / 2L // all pairs share boilerplate
    assert(nCand < naiveSharedTokenPairs / 4,
      s"prefix filter should prune boilerplate candidates, got $nCand")
    assert(InvertedIndex.ppjoinFromTokens(spark, tokFrame(sets)).count() == 0L)
    assert(naiveFromSets(sets).isEmpty)
  }

  test("positional filter prunes a pair that shares a prefix token but cannot reach tau") {
    // doc1 (n=16) and doc2 (n=20) share exactly one element, p1, ranked
    // 1st in doc1's prefix and 9th in doc2's (c1..c8 are df-2 names
    // sorting before p1). Both prefixes contain p1 and the size filter
    // passes (3*20 <= 5*16), so the PREFIX stage alone admits the pair;
    // the positional bound min(1,9)+min(16-1,20-9) = 12 < alpha =
    // ceil(3*36/8) = 14 must prune it. Padding docs pin every df.
    val u = (1 to 15).map(i => s"u$i").toSet
    val c = (1 to 8).map(i => s"c$i").toSet
    val d = (1 to 11).map(i => s"d$i").toSet
    val sets: Seq[(Long, Set[String])] = Seq(
      1L -> (u + "p1"),
      2L -> (c ++ d + "p1"),
      3L -> u, 4L -> u,
      13L -> d, 14L -> d) ++
      c.toSeq.sorted.zipWithIndex.map { case (t, i) => (5L + i) -> Set(t) }
    val cand = InvertedIndex.ppjoinCandidates(spark, tokFrame(sets)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cand.contains((1L, 2L)),
      "positional filter must prune the (1,2) candidate")
    val got = InvertedIndex.ppjoinFromTokens(spark, tokFrame(sets)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naiveFromSets(sets))
    assert(got.map(p => (p._1, p._2)) == Set((1L, 3L), (1L, 4L), (3L, 4L), (13L, 14L)))
  }

  test("phrase search locates every occurrence of the top trigram, overlapping included") {
    // "x y x" is the top trigram (3 occurrences, incl. overlapping in doc 1)
    val dir = writeDocs(Seq(
      1L -> "x y x y x", // matches at pos 1 and 3 (overlap)
      2L -> "p q x y x r", // match at pos 3
      3L -> "unrelated words only here"))
    val out = InvertedIndex.phraseSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1L, 1L, "x y x"), (1L, 3L, "x y x"), (2L, 3L, "x y x")))
  }

  test("phrase search tie-break is lexicographic on equal counts") {
    // "a a a" and "b b b" both occur once; lexicographic pick is "a a a"
    val dir = writeDocs(Seq(1L -> "a a a", 2L -> "b b b"))
    val out = InvertedIndex.phraseSearch(spark, dir).collect()
    assert(out.forall(_.getString(2) == "a a a"))
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 1L)))
  }
}
