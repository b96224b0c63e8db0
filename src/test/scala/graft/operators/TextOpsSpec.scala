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

  test("entropy: constant doc -> 0, uniform doc -> ln(k), real docs bounded by ln(n_distinct)") {
    import spark.implicits._
    val planted = Seq((1L, "a a a a a a"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = TextOps.entropyOf(planted).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) == 0.0)
    assert(math.abs(got(2L) - math.log(4.0)) < 1e-5)
    val real = TextOps.docEntropy(spark, sf).collect()
    assert(real.forall { r =>
      val h = r.getDouble(3)
      h >= 0.0 && h <= math.log(r.getLong(2).toDouble) + 1e-6
    })
  }

  test("zipf fit: planted exact power law recovers slope -1 and intercept ln(fmax)") {
    import spark.implicits._
    // freqs 4 and 2 at ranks 1 and 2: ln-ln line through (0, ln4),
    // (ln2, ln2) has slope -1, intercept ln4
    val planted = Seq((1L, "aa aa aa aa bb bb")).toDF("doc_id", "text")
    val row = TextOps.zipfFitOf(planted).collect().head
    assert(row.getLong(0) == 2L)
    assert(math.abs(row.getDouble(1) + 1.0) < 1e-5)
    assert(math.abs(row.getDouble(2) - math.log(4.0)) < 1e-5)
  }
}
