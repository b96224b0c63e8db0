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
}
