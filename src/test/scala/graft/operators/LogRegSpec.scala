package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The trained quality classifier must actually learn (training
  * accuracy clearly above the majority-class rate — the label is a
  * linear functional of the features by construction), and the EL2N
  * selection must satisfy its contracts: score = |p − y|, ranks a
  * contiguous permutation under (el2n DESC, doc_id), keep = exactly
  * the hardest ⌈n/2⌉, and the kept half's mean error strictly above
  * the dropped half's.
  */
class LogRegSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("classifier trains above the majority-class rate") {
    import spark.implicits._
    val rows = LogReg.lrClassifier(spark, TestSpark.sf).collect()
    // bias + min(F, vocab) token features
    assert(rows.length > 1 && rows.length <= LogReg.F + 1)
    val correct = rows.head.getLong(rows.head.fieldIndex("train_correct"))
    // majority-class rate from the EL2N frame's labels (same pipeline)
    val sel = LogReg.el2nSelect(spark, TestSpark.sf)
      .select($"y").as[Double].collect()
    val n = sel.length
    val majority = math.max(sel.count(_ == 1.0), sel.count(_ == 0.0))
    // standardized-feature GD separates well clear of majority vote
    assert(correct >= majority + n / 10,
      s"trained $correct not clearly above majority $majority of $n")
  }

  test("EL2N selection keeps exactly the hardest half") {
    val rows = LogReg.el2nSelect(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getBoolean(5)))
    val n = rows.length
    assert(n > 0)
    for ((d, y, p, e, _, _) <- rows)
      assert(e == math.abs(p - y), s"doc $d el2n")
    // ranks are 1..n and ordered by (el2n DESC, doc_id)
    val byRank = rows.sortBy(_._5)
    assert(byRank.map(_._5).toSeq == (1L to n).toSeq)
    val keys = byRank.map(t => (-t._4, t._1)).toSeq
    assert(keys == keys.sorted, "rank order")
    val kept = rows.filter(_._6)
    assert(kept.length == math.ceil(n / 2.0).toLong)
    val dropped = rows.filterNot(_._6)
    assert(kept.map(_._4).min >= dropped.map(_._4).max,
      "keep boundary not a threshold")
    assert(kept.map(_._4).sum / kept.length >
      dropped.map(_._4).sum / dropped.length)
  }
}
