package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Unigram-LM tokenizer: segmentations must round-trip to their words,
  * the model table must be internally consistent (lp = 6-dp-floored
  * ln(cnt/total), single chars alive, ranks a permutation), and the
  * trained model must actually compress — multi-character pieces carry
  * real usage, so tokens-per-word lands strictly below characters-per-
  * word (the property EM exists for; BPE's compression gauge).
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("segmentations round-trip and the model compresses") {
    val segs = Unigram.unigramSegment(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(segs.nonEmpty)
    for ((w, _, s, n) <- segs) {
      val pieces = s.split(' ')
      assert(pieces.mkString("") == w, s"round-trip $w from '$s'")
      assert(pieces.length.toLong == n, s"$w n_pieces")
      assert(pieces.forall(p => p.nonEmpty && p.length <= Unigram.MaxP))
    }
    val tokens = segs.map(t => t._2 * t._4).sum.toDouble
    val chars = segs.map(t => t._2 * t._1.length).sum.toDouble
    assert(tokens < chars, s"no compression: $tokens tokens vs $chars chars")
  }

  test("model table is internally consistent") {
    val rows = Unigram.unigramEm(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum.toDouble
    for ((p, c, lp, _) <- rows) {
      assert(c > 0, s"$p count")
      val expect = math.floor(math.log(c / total) * 1e6 + 0.5) / 1e6
      assert(lp == expect, s"$p lp $lp != $expect")
    }
    // ranks are 1..n under (cnt DESC, piece)
    val byRank = rows.sortBy(_._4)
    assert(byRank.map(_._4).toSeq == (1L to rows.length).toSeq)
    val keys = byRank.map(t => (-t._2, t._1)).toSeq
    assert(keys == keys.sorted)
    // character coverage: every char of every word is a live piece
    val words = Unigram.unigramSegment(spark, TestSpark.sf).collect()
      .map(_.getString(0))
    val alive = rows.map(_._1).toSet
    for (w <- words; ch <- w.distinct)
      assert(alive(ch.toString), s"char $ch of $w not alive")
  }
}
