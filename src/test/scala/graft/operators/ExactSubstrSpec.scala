package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The ExactSubstr contract: every MAXIMAL verbatim cross-document
  * token span of ≥ K tokens is reported at its exact 1-based start
  * positions in BOTH documents — no clipping, no extension, no
  * splitting — and nothing below K tokens ever appears.
  */
class ExactSubstrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val K = Dedup.ExactSubstrK

  /** Unique filler tokens that can never collide across docs. */
  private def filler(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"zz${tag}u$i")

  private def spans(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    Dedup.exactSubstrSpans(spark, docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
  }

  test("planted 60-token verbatim span found at exact boundaries") {
    val span = (0 until 60).map(i => s"shared$i")
    val docA = (filler("a", 10) ++ span ++ filler("b", 7)).mkString(" ")
    val docB = (filler("c", 5) ++ span ++ filler("d", 3)).mkString(" ")
    // span starts at token 11 of A (after 10 fillers) and token 6 of B
    assert(spans(Seq((1L, docA), (2L, docB))) ==
      Set((1L, 2L, 11L, 6L, 60L)))
  }

  test("two disjoint shared spans between one pair stay two maximal spans") {
    val s1 = (0 until K).map(i => s"one$i")     // exactly K tokens
    val s2 = (0 until K + 5).map(i => s"two$i") // K+5 tokens
    val docA = (s1 ++ filler("a", 4) ++ s2).mkString(" ")
    val docB = (filler("b", 3) ++ s1 ++ filler("c", 9) ++ s2).mkString(" ")
    assert(spans(Seq((1L, docA), (2L, docB))) == Set(
      (1L, 2L, 1L, 4L, K.toLong),
      (1L, 2L, (K + 5).toLong, (K + 13).toLong, (K + 5).toLong)))
  }

  test("spans shorter than K tokens are never reported") {
    val short = (0 until K - 1).map(i => s"sh$i") // K-1 shared tokens
    val docA = (short ++ filler("a", 12)).mkString(" ")
    val docB = (filler("b", 12) ++ short).mkString(" ")
    assert(spans(Seq((1L, docA), (2L, docB))).isEmpty)
  }

  test("a span repeated at two offsets yields one maximal span per diagonal") {
    val span = (0 until K + 2).map(i => s"rep$i")
    // A carries the span once; B carries it TWICE at different offsets —
    // two diagonals, two maximal spans, neither merged nor extended
    val docA = (filler("a", 2) ++ span ++ filler("b", 2)).mkString(" ")
    val docB = (span ++ filler("c", 5) ++ span).mkString(" ")
    assert(spans(Seq((1L, docA), (2L, docB))) == Set(
      (1L, 2L, 3L, 1L, (K + 2).toLong),
      (1L, 2L, 3L, (K + 2 + 5 + 1).toLong, (K + 2).toLong)))
  }

  test("property: spans match a brute-force diagonal-scan reference on tiny-vocab docs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // 2-token vocabulary forces heavy verbatim overlap (a K-token match
    // at a fixed alignment has probability 2^-K, so random docs share
    // runs organically), repeated grams within docs, and multi-diagonal
    // matches — total gram occurrences stay far below the
    // ExactSubstrOccCut so the cut never intersects the reference
    val genDocs = for {
      n <- Gen.chooseNum(2, 5)
      docs <- Gen.listOfN(n, for {
        len <- Gen.chooseNum(K, 30)
        toks <- Gen.listOfN(len, Gen.oneOf("ga", "gb"))
      } yield toks)
    } yield docs
    val params = Gen.Parameters.default
    var spansSeen = 0
    (1 to 8).foreach { it =>
      val docs = genDocs.pureApply(params, Seed(5000L + it))
        .zipWithIndex.map { case (t, i) => (i.toLong + 1, t) }
      // brute-force reference: every diagonal of every pair, maximal
      // equality runs of ≥ K tokens
      val expected = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        d <- -(tb.length - 1) to (ta.length - 1)
        // walk the diagonal: positions (p, p - d) 0-based
        run <- {
          val lo = math.max(0, d)
          val hi = math.min(ta.length - 1, tb.length - 1 + d)
          val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
          var p = lo
          while (p <= hi) {
            if (ta(p) == tb(p - d)) {
              val st = p
              while (p <= hi && ta(p) == tb(p - d)) p += 1
              if (p - st >= K) runs += ((st, p - st))
            } else p += 1
          }
          runs
        }
      } yield {
        val (st0, len) = run
        (ia, ib, st0 + 1L, st0 - d + 1L, len.toLong)
      }).toSet
      val got = spans(docs.map { case (id, t) => (id, t.mkString(" ")) })
      assert(got == expected, s"iteration $it (seed ${5000 + it})")
      spansSeen += expected.size
    }
    assert(spansSeen > 0, "generator never produced a shared span")
  }

  test("interval union: overlapping, nested, adjacent, disjoint all collapse exactly") {
    import spark.implicits._
    val iv = Seq(
      // doc 1: [1,5] ∪ [3,8] overlap → [1,8]; [10,12] disjoint → 8+3
      (1L, 1L, 5L), (1L, 3L, 8L), (1L, 10L, 12L),
      // doc 2: [2,20] nests [5,7] and touches [21,25] (adjacent) → [2,25]
      (2L, 2L, 20L), (2L, 5L, 7L), (2L, 21L, 25L),
      // doc 3: exact duplicate intervals count once
      (3L, 4L, 9L), (3L, 4L, 9L),
      // doc 4: same start, different ends → [1,3] ∪ [1,7] = [1,7]
      (4L, 1L, 3L), (4L, 1L, 7L)
    ).toDF("doc_id", "st", "en")
    val got = Dedup.intervalUnionLen(iv).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 11L, 2L -> 24L, 3L -> 6L, 4L -> 7L))
  }

  test("three-document span reports every pair; tokenization is the kit's") {
    val span = (0 until K).map(i => s"tri$i")
    // mixed case + repeated whitespace: the split-lower-filter pipeline
    // must normalize identically on every doc
    val docA = ("PAD0 pad1  " + span.mkString("  ").toUpperCase).trim
    val docB = (span ++ filler("b", 5)).mkString(" ")
    val docC = (filler("c", 1) ++ span).mkString(" ")
    assert(spans(Seq((1L, docA), (2L, docB), (3L, docC))) == Set(
      (1L, 2L, 3L, 1L, K.toLong),
      (1L, 3L, 3L, 2L, K.toLong),
      (2L, 3L, 1L, 2L, K.toLong)))
  }
}
