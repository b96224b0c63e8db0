package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming MinHash-LSH near-dup dedup: the cross-trigger keep set must
  * equal the batch pipeline's keep set (documents minus the larger side
  * of every verified near-dup pair), and the per-bucket state the stream
  * carries must stay far below the saturation cap — the bounded-state
  * claim the operator makes for continuous ingest.
  */
class NearDupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("streaming keep set equals the batch MinHash-LSH keep set") {
    import spark.implicits._
    val streamed = StreamQueries.streamNearDup(spark, sf)
      .as[Long].collect().toSet
    val victims = graft.operators.Dedup.minhashLsh(spark, sf)
      .select("doc_b").as[Long].collect().toSet
    val batch = graft.Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect().toSet -- victims
    assert(streamed == batch)
    assert(victims.nonEmpty, "fixture must contain at least one near-dup")
    assert(streamed.nonEmpty)
  }

  test("band buckets stay far below the state saturation cap") {
    import spark.implicits._
    val sigs = graft.operators.Dedup.minhashSignatures(spark, sf)
    val bands = graft.functions.Hashing.Bands
    val rpb = graft.functions.Hashing.RowsPerBand
    import org.apache.spark.sql.functions._
    val bandKeys = array((0 until bands).map { b =>
      concat_ws(":", lit(b.toString) +:
        (1 to rpb).map(r => element_at($"sig", b * rpb + r).cast("string")): _*)
    }: _*)
    val maxBucket = sigs.select(explode(bandKeys).as("bkey"))
      .groupBy("bkey").count().agg(max("count")).as[Long].head()
    assert(maxBucket < StreamQueries.NearDupMaxBucket / 4,
      s"bucket population $maxBucket approaches the cap — band width " +
        "needs rescaling before the cap distorts results")
  }
}
