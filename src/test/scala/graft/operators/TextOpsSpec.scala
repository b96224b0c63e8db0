package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  /** Golden word-count fixture from the reference topology test
    * (StormSpec.scala:65-67,97-108): alice, bob, joe, alice →
    * final state alice→2, bob→1, joe→1.
    */
  test("wordcount golden fixture: alice bob joe alice") {
    import spark.implicits._
    val df = Seq((1L, "alice bob"), (2L, "joe alice")).toDF("doc_id", "text")
    val got = TextOps.tokens(df).groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("alice" -> 2L, "bob" -> 1L, "joe" -> 1L))
  }

  test("wordcount over documents: counts sum to token total") {
    val wc = TextOps.wordCount(spark, sf)
    val sumCounts = wc.agg(org.apache.spark.sql.functions.sum("cnt")).collect()(0).getLong(0)
    val tokenTotal = TextOps.tokens(graft.Tables.documents(spark, sf)).count()
    assert(sumCounts == tokenTotal && tokenTotal > 0)
  }

  test("global count equals table count") {
    val n = TextOps.globalCount(spark, sf).collect()(0).getAs[Long]("total")
    assert(n == graft.Tables.documents(spark, sf).count())
  }

  test("dup spans: one row per doc, disjoint spans bounded by doc length") {
    val rows = TextOps.dupSpans(spark, sf).collect()
    assert(rows.length == graft.Tables.documents(spark, sf).count())
    var withSpans = 0
    rows.foreach { r =>
      val (nTok, nSpans, dupTok) =
        (r.getAs[Int]("n_tokens").toLong, r.getAs[Long]("n_spans"),
          r.getAs[Long]("dup_tokens"))
      // islands are ≥ 9 apart in start position, so their 8-token
      // windows cover disjoint ranges: total dup mass can't exceed doc
      assert(dupTok <= nTok, s"doc ${r.getLong(0)}: $dupTok > $nTok")
      if (nSpans > 0) { withSpans += 1; assert(dupTok >= 8 * nSpans) }
      else assert(dupTok == 0L)
    }
    assert(withSpans > 0, "fixture must contain cross-doc duplication")
  }

  test("dup spans agree with gram mass on which docs are duplicated") {
    val spanDocs = TextOps.dupSpans(spark, sf).collect()
      .filter(_.getAs[Long]("n_spans") > 0).map(_.getLong(0)).toSet
    val massDocs = TextOps.dupNgramMass(spark, sf).collect()
      .filter(_.getAs[Long]("n_dup_grams") > 0).map(_.getLong(0)).toSet
    // same 8-gram, same ≥2-docs threshold ⇒ identical positive sets
    assert(spanDocs == massDocs)
  }
}
