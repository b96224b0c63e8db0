package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lambda reconciliation for the streaming CDC ingest: chunk metadata
  * accumulated per micro-batch in the append-mode delta log, closed
  * through the SHARED census finalize, must equal the batch
  * `dedup_cdc_chunks` pass exactly.
  */
class CdcStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming CDC census equals the batch census") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val stream = StreamQueries.streamCdcChunks(spark, sf)
      .collect().map(key).toSet
    val batch = graft.operators.Dedup.cdcChunks(spark, sf)
      .collect().map(key).toSet
    assert(stream == batch)
    assert(stream.nonEmpty)
  }
}
