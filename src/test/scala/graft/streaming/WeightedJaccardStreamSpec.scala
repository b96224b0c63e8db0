package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming weighted Jaccard: the drained per-(doc, shingle)
  * occurrence-count state closed through the shared multiset pair join
  * must equal the batch `dedup_weighted_jaccard` answer exactly —
  * values included — under the multi-trigger split the contract stages.
  */
class WeightedJaccardStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("cross-trigger state finalizes to the batch multiset-Jaccard pairs") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))
    val streamed = StreamQueries.streamWeightedJaccard(spark, sf)
      .collect().map(key).toMap
    val batch = graft.operators.Dedup.weightedJaccard(spark, sf)
      .collect().map(key).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must contain at least one weighted near-dup")
  }
}
