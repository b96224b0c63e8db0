package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lambda reconciliation for incremental near-dup admission: the
  * streaming form (stream-static corpus-index join for `dup_corpus`,
  * bucket-keyed state for same-snapshot `dup_batch`) must produce the
  * identical per-doc verdict table as batch `dedup_incremental` —
  * including the arrival-order-independence claim: a doc whose
  * smaller-id witness arrives LATER must still be indicted.
  */
class IncrementalDedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming incremental admission equals the batch verdict table") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))
    val stream =
      StreamQueries.streamDedupIncremental(spark, sf).collect().map(key).toSet
    val batch =
      graft.operators.Dedup.dedupIncremental(spark, sf).collect().map(key).toSet
    assert(stream == batch)
    // the split is non-trivial on the fixture: some arriving doc is a dup
    assert(stream.exists { case (_, dc, db, _) => dc || db })
    assert(stream.exists { case (_, _, _, keep) => keep })
  }
}
