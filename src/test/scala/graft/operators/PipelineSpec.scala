package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.codec.Tweet

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("round-trip identity: decode(encode(x)) == x over events-derived tweets") {
    import spark.implicits._
    val in = Pipeline.tweetsFromEvents(spark, sf)
    val out = Pipeline.decodeStage(Pipeline.encodeStage(in))
    // multiset equality via except in both directions + same count
    assert(in.count() == out.count())
    assert(out.toDF.exceptAll(in.toDF).isEmpty && in.toDF.exceptAll(out.toDF).isEmpty)
  }

  test("corrupt rows are dropped and counted, survivors match") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("corrupt")
    val good = Seq(Tweet("a", "x", 1L), Tweet("b", "y", 2L))
    val bytes = good.map(graft.codec.TweetCodec.encode) :+ Array[Byte](1, 2, 3, 4)
    val out = Pipeline.decodeStage(spark.createDataset(bytes), Some(acc)).collect()
    assert(out.toSet == good.toSet)
    assert(acc.value == 1L)
  }

  test("fail-fast decode throws on corrupt stream") {
    import spark.implicits._
    val bytes = Seq(Array[Byte](1, 2, 3, 4))
    val e = intercept[org.apache.spark.SparkException] {
      Pipeline.decodeFailFast(spark.createDataset(bytes)).collect()
    }
    assert(e.getMessage.contains("Could not decode input bytes") ||
      e.getCause != null)
  }
}
