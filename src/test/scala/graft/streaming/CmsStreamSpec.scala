package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lambda reconciliation for the streaming Count-Min sketch: the
  * update-mode counter grid, drained and closed through the shared
  * probe/min stage, must equal the batch sketch exactly — cell-wise
  * addition is the CMS merge, so cross-trigger accumulation cannot
  * change any estimate.
  */
class CmsStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming CMS heavy hitters equal the batch sketch") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2))
    val stream = StreamQueries.streamCmsHeavy(spark, sf).collect().map(key).toSet
    val batch = graft.operators.Sketches.cmsHeavy(spark, sf).collect().map(key).toSet
    assert(stream == batch)
  }

  test("streaming dyadic range counters drain to the batch range answers") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    val stream = StreamQueries.streamDyadicRange(spark, sf)
      .collect().map(key).toSet
    val batch = graft.operators.Sketches.dyadicRangeCount(spark, sf)
      .collect().map(key).toSet
    assert(stream == batch)
    assert(batch.size == 15)
  }
}
