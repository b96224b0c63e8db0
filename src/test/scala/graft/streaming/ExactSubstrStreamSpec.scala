package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The round-10 streaming arrivals must equal their batch queries
  * exactly under the multi-trigger split: ExactSubstr's cross-trigger
  * posting state, and the cross-modal image↔frame signature state.
  */
class ExactSubstrStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming ExactSubstr spans equal the batch span table") {
    val streamed = StreamQueries.streamExactSubstr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val batch = graft.operators.Dedup.exactSubstr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must contain at least one shared span")
  }

  test("streaming savings equal the batch per-source duplication report") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))
    val streamed = StreamQueries.streamSubstrSavings(spark, sf)
      .collect().map(key).toSet
    val batch = graft.operators.Dedup.substrSavings(spark, sf)
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(batch.exists(_._4 > 0L), "fixture must contain duplicate tokens")
  }

  test("streaming ppjoin equals the batch prefix-filtered exact join") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))
    val streamed = StreamQueries.streamPpjoin(spark, sf)
      .collect().map(key).toSet
    val batch = graft.operators.InvertedIndex.ppjoin(spark, sf)
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must contain at least one exact near-dup pair")
    // incremental finalize ledger: one entry per trigger, and the
    // arrivals across triggers sum to the final accumulated index —
    // i.e. each trigger processed only its own arrivals against the
    // accumulated state, never a full re-finalize of a stale union
    import scala.jdk.CollectionConverters._
    val ledger = StreamQueries.ppjoinTriggerLog.asScala.toSeq.sortBy(_._1)
    assert(ledger.size >= 2, "multi-trigger drain expected")
    val last = ledger.last
    assert(ledger.map(_._2).sum == last._2 + last._3,
      "per-trigger arrivals must sum to the accumulated token index")
    assert(ledger.map(_._4).sum == streamed.size.toLong,
      "per-trigger emitted pairs must sum to the final pair table")
  }

  test("streaming image-in-video pairs equal the batch cross-modal join") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val streamed = StreamQueries.streamImageInVideo(spark, sf)
      .collect().map(key).toSet
    val batch = graft.operators.Multimodal.imageInVideo(spark, sf)
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must contain at least one sig match")
  }
}
