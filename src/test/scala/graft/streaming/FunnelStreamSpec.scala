package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lambda reconciliation for the streaming funnel: the multi-trigger
  * update-mode per-user stage state, reconstructed latest-wins from the
  * delta log and summarized, must equal the batch `ev_funnel` answer on
  * the same data.
  */
class FunnelStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming funnel final state equals the batch funnel") {
    val stream = StreamQueries.streamFunnel(spark, sf).collect().head
    val batch = graft.operators.EventOps.funnel(spark, sf).collect().head
    (0 until 4).foreach { i =>
      assert(stream.getLong(i) == batch.getLong(i),
        s"col $i: stream=${stream.getLong(i)} batch=${batch.getLong(i)}")
    }
  }
}
