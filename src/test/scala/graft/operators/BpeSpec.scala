package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("bpe: K distinct merges, non-increasing counts, deterministic") {
    val rows = Bpe.bpeMerges(spark, sf)
      .orderBy("merge_rank").collect()
    assert(rows.length == Bpe.K)
    // merged symbol is the concatenation of its parts
    rows.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0)
    }
    // the max pair count can only shrink: every occurrence of a pair
    // involving the new symbol is bounded by the count just merged
    val counts = rows.map(_.getLong(4))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"counts not non-increasing: ${counts.mkString(",")}")
    // distinct merges (re-merging the same pair would mean apply failed)
    assert(rows.map(_.getString(3)).distinct.length == Bpe.K)
    // deterministic across re-runs (argmax tie-break is total)
    val again = Bpe.bpeMerges(spark, sf).orderBy("merge_rank").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("bpe: compression readout is consistent with the merge count") {
    val r = Bpe.bpeCompression(spark, sf).collect()(0)
    val (nWords, nOcc, chars, toks, tpc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(nWords > 0 && nOcc >= nWords)
    // a merge of pair (a,b) with a != b removes exactly pair_count
    // symbols (non-self pairs can't overlap); a self-pair (a,a) merges
    // floor(run/2) times per run, strictly fewer than the position count
    val mergeRows = Bpe.bpeMerges(spark, sf).collect()
    val merged = mergeRows.map(_.getLong(4)).sum
    if (mergeRows.forall(r => r.getString(1) != r.getString(2)))
      assert(toks == chars - merged,
        s"tokens_total $toks != chars_total $chars - merged occurrences $merged")
    else assert(toks >= chars - merged && toks < chars)
    assert(tpc > 0 && tpc < 1, s"tokens_per_char $tpc out of range")
  }

  test("bpe: fertility is bounded by chars-per-word and covers every token") {
    val rows = Bpe.bpeFertility(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_.getLong(1)).sum
    // every corpus token maps back through the vocab round-trip
    val comp = Bpe.bpeCompression(spark, sf).collect()(0)
    assert(totalTokens == comp.getLong(1),
      "token occurrences lost in the word round-trip join")
    rows.foreach { r =>
      val f = r.getDouble(3)
      assert(f >= 1.0, s"${r.getString(0)}: fertility $f below 1 symbol/word")
      assert(f < 60, s"${r.getString(0)}: fertility $f above any char bound")
    }
  }

  test("bpe: greedy fold matches the index-scan reference on tricky words") {
    // pair (a,a) over "aaaa" must merge greedily: aa,aa — not aa,a,a
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def applyMerge(word: String, a: String, b: String): Seq[String] = {
      val df = Seq(word).toDF("word")
        .selectExpr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1)) AS syms")
        .crossJoin(broadcast(Seq((a, b)).toDF("a", "b")))
        .selectExpr(
          """aggregate(syms, CAST(array() AS ARRAY<STRING>),
            |  (acc, x) -> CASE
            |    WHEN size(acc) > 0 AND element_at(acc, -1) = a AND x = b
            |    THEN concat(slice(acc, 1, size(acc) - 1), array(concat(a, b)))
            |    ELSE concat(acc, array(x)) END) AS syms""".stripMargin)
      df.collect()(0).getSeq[String](0)
    }
    assert(applyMerge("aaaa", "a", "a") == Seq("aa", "aa"))
    assert(applyMerge("aaa", "a", "a") == Seq("aa", "a"))
    assert(applyMerge("aab", "a", "b") == Seq("a", "ab"))
    assert(applyMerge("abb", "a", "b") == Seq("ab", "b"))
    assert(applyMerge("x", "a", "b") == Seq("x"))
  }
}
