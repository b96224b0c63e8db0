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

  test("chi2 terms: perfect discriminator scores N, everywhere-term excluded") {
    import spark.implicits._
    // "the" in every doc (df = N = 4) must be excluded; "zebra" splits
    // exactly along source A: a=2, b=0, c=0, d=2 -> chi2 = N
    val planted = Seq(
      (1L, "A", "the zebra runs"), (2L, "A", "the zebra sleeps"),
      (3L, "B", "the cow runs"), (4L, "B", "the cow sleeps")
    ).toDF("doc_id", "source", "text")
    val rows = TextOps.chi2TermsOf(planted).collect()
    assert(!rows.exists(_.getString(1) == "the"))
    val aZebra = rows.find(r => r.getString(0) == "A" && r.getString(1) == "zebra").get
    assert(aZebra.getLong(2) == 2L && aZebra.getLong(3) == 2L)
    assert(aZebra.getDouble(4) == 4.0)
    // B's own perfect discriminator scores the same symmetric table;
    // only PRESENT (term, source) cells are reported, so (B, zebra)
    // does not appear
    assert(!rows.exists(r => r.getString(0) == "B" && r.getString(1) == "zebra"))
    val bCow = rows.find(r => r.getString(0) == "B" && r.getString(1) == "cow").get
    assert(bCow.getDouble(4) == 4.0)
    // an evenly-spread term carries zero signal
    val aRuns = rows.find(r => r.getString(0) == "A" && r.getString(1) == "runs").get
    assert(aRuns.getDouble(4) == 0.0)
  }

  test("readability: planted prose recovers hand-computed Flesch scores") {
    import spark.implicits._
    // 6 words, 2 sentences, 6 single-vowel-group syllables:
    // ease = 206.835 - 1.015*3 - 84.6*1 = 119.19
    // grade = 0.39*3 + 11.8*1 - 15.59 = -2.62
    val planted = Seq((1L, "The cat sat. The dog ran!")).toDF("doc_id", "text")
    val r = TextOps.readabilityOf(planted).collect().head
    assert(r.getLong(1) == 6L && r.getLong(2) == 2L && r.getLong(3) == 6L)
    assert(math.abs(r.getDouble(4) - 119.19) < 1e-9)
    assert(math.abs(r.getDouble(5) + 2.62) < 1e-9)
    // terminator-free text floors sentences at 1 instead of dividing by 0
    val flat = Seq((2L, "no punctuation here at all")).toDF("doc_id", "text")
    assert(TextOps.readabilityOf(flat).collect().head.getLong(2) == 1L)
  }

  test("novelty: first seer scores 1, verbatim copy scores 0, extension scores the new tail") {
    val rows = TextOps.docNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, novel, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(novel >= 0 && novel <= n)
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // the lowest doc_id in the corpus can only contain first-seen grams
    val first = rows.minBy(_.getLong(0))
    assert(first.getDouble(3) == 1.0)
  }
}
