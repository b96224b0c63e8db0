package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming image near-dup: the drained per-asset aHash-chunk state
  * closed through the shared multi-index hamming join must equal the
  * batch `mm_phash_pairs` answer — values included — under the
  * multi-trigger split the contract stages. Completes the streaming
  * near-dup arrival form across all three modalities.
  */
class ImageNeardupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("cross-trigger chunk state finalizes to the batch hamming pairs") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1)) -> r.getLong(2)
    val streamed = StreamQueries.streamImageNeardup(spark, sf)
      .collect().map(key).toMap
    val batch = graft.operators.Multimodal.phashPairs(spark, sf)
      .collect().map(key).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must contain at least one image near-dup")
  }

  test("cluster maintenance: state snapshot finalizes to the batch families") {
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (r.getLong(1), r.getLong(2))
    val streamed = StreamQueries.streamImageClusters(spark, sf)
      .collect().map(key).toMap
    val batch = graft.operators.Multimodal.imageClusters(spark, sf)
      .collect().map(key).toMap
    assert(streamed == batch)
    assert(batch.exists(_._2._1 > 1L), "fixture must contain a multi-member family")
  }
}
