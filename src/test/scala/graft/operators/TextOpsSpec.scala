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
}
