package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("token stats: ttr in (0,1], n_distinct <= n_tokens, bpe >= whitespace tokens") {
    val df = TextOps.docTokenStats(spark, sf)
    assert(df.filter(col("ttr") <= 0 || col("ttr") > 1 ||
      col("n_distinct") > col("n_tokens") ||
      col("n_bpe") < col("n_tokens")).count() == 0)
    assert(df.count() == graft.Tables.documents(spark, sf).count())
  }

  test("quality score bounded in [0,1], ratios in [0,1]") {
    val df = TextOps.docQuality(spark, sf)
    assert(df.filter(col("quality_score") < 0 || col("quality_score") > 1 ||
      col("stop_ratio") < 0 || col("stop_ratio") > 1 ||
      col("punct_ratio") < 0 || col("punct_ratio") > 1).count() == 0)
  }

  test("langid is deterministic and total (every doc classified)") {
    val df = TextOps.docLangId(spark, sf)
    assert(df.filter(col("pred_lang").isNull).count() == 0)
    assert(df.count() == graft.Tables.documents(spark, sf).count())
  }

  test("fingerprint: stable across runs, order-sensitive") {
    import spark.implicits._
    val docs = Seq((1L, "ab"), (2L, "ba")).toDF("doc_id", "text")
    val fp = docs.selectExpr("doc_id",
      """aggregate(
        |  transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1))),
        |  CAST(0 AS BIGINT),
        |  (h, c) -> (h * 31 + c) % 1000000007) AS fingerprint""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "ab" -> (97*31)+98 = 3105 ; "ba" -> (98*31)+97 = 3135
    assert(fp(1L) == 3105L && fp(2L) == 3135L)
  }

  test("rake: top phrases reproduce from an independent full recompute") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val stops = TextOps.RakeStops.toSet
    // independent reference implementation
    val phrases = docs.flatMap { case (_, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val runs = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.newBuilder[String]; var nonEmpty = false
      toks.foreach { w =>
        if (stops(w)) {
          if (nonEmpty) runs += cur.result()
          cur = List.newBuilder[String]; nonEmpty = false
        } else { cur += w; nonEmpty = true }
      }
      if (nonEmpty) runs += cur.result()
      runs
    }
    val degree = scala.collection.mutable.Map.empty[String, Long]
    val freq = scala.collection.mutable.Map.empty[String, Long]
    phrases.foreach { p =>
      p.foreach { w =>
        degree(w) = degree.getOrElse(w, 0L) + p.length
        freq(w) = freq.getOrElse(w, 0L) + 1L
      }
    }
    def micro(w: String): Long =
      math.floor(degree(w).toDouble / freq(w) * 1e6 + 0.5).toLong
    val expected = phrases.groupBy(_.mkString(" ")).map { case (ph, occ) =>
      ph -> (occ.head.length.toLong, occ.length.toLong, occ.head.map(micro).sum)
    }
    val got = TextOps.rakePhrases(spark, sf).collect()
    assert(got.length == 20)
    got.foreach { r =>
      val (ph, nw, no, sc) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val (enw, eno, emicro) = expected(ph)
      assert(nw == enw && no == eno, s"phrase '$ph' counts")
      assert(math.abs(sc - emicro / 1e6) < 1e-9, s"phrase '$ph' score")
    }
    // the returned 20 really are the global argmax under (score, phrase)
    val top = expected.toSeq
      .map { case (ph, (_, _, m)) => (m, ph) }
      .sortBy { case (m, ph) => (-m, ph) }.take(20).map(_._2)
    assert(got.map(_.getString(0)).toSeq.sorted == top.sorted)
  }

  test("ppl buckets partition each language's scored docs; head NLL below tail") {
    import spark.implicits._
    val nll = TextOps.docLmNll(spark, sf)
      .join(graft.Tables.documents(spark, sf).select($"doc_id", $"lang"),
        "doc_id")
    val perLang = nll.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = TextOps.docPplBuckets(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(4))).toMap
    // every scored doc lands in exactly one bucket
    perLang.foreach { case (lang, n) =>
      val bucketed = Seq("head", "middle", "tail")
        .flatMap(b => got.get((lang, b)).map(_._1)).sum
      assert(bucketed == n, s"$lang: bucketed $bucketed of $n docs")
    }
    // the ordering the split exists for: head mean NLL <= tail mean NLL
    got.keys.map(_._1).toSeq.distinct.foreach { lang =>
      (got.get((lang, "head")), got.get((lang, "tail"))) match {
        case (Some((_, h)), Some((_, t))) =>
          assert(h <= t, s"$lang: head avg $h > tail avg $t")
        case _ => // a degenerate lang may lack a bucket; partition test above covers it
      }
    }
  }
}
