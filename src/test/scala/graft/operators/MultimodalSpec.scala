package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("asset schema: opaque binary payload + typed columns") {
    val ds = Multimodal.assets(spark, sf)
    val schema = ds.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("media_type").dataType.typeName == "string")
    assert(ds.count() == graft.Tables.documents(spark, sf).count())
  }

  test("decode stub is deterministic and feature shape is fixed") {
    val a = Multimodal.Asset(7L, "image", "hello world".getBytes("UTF-8"))
    val d1 = Multimodal.decodeStub(a)
    val d2 = Multimodal.decodeStub(a)
    assert(d1.features.toSeq == d2.features.toSeq)
    assert(d1.features.length == 8)
    assert(d1.n_bytes == 11L)
  }

  test("batched extraction preserves every row and respects batch bound") {
    import spark.implicits._
    val n = 200
    val in = spark.createDataset((1 to n).map(i =>
      Multimodal.Asset(i.toLong, "image", s"payload$i".getBytes("UTF-8"))))
    // batch bound: a partition iterator grouped by 64 must never see a
    // larger group — verified via mapPartitions with the same grouping
    val maxBatch = in.mapPartitions(_.grouped(64).map(_.size))
      .collect().max
    assert(maxBatch <= 64)
    val out = Multimodal.extractFeatures(in, 64)
    assert(out.count() == n)
    assert(out.collect().forall(_.features.length == 8))
  }

  test("resize: aspect ratio preserved, never upscales, bounded by target box") {
    val d = Multimodal.Decoded(1L, "image", 100L, 200, 100, Array.fill(8)(0f))
    val r = Multimodal.resizeStub(d, 64, 64)
    assert(r.width == 64 && r.height == 32) // 200x100 -> 64x32 (ratio kept)
    val small = Multimodal.Decoded(2L, "image", 10L, 30, 20, Array.fill(8)(0f))
    assert(Multimodal.resizeStub(small, 64, 64) == small) // no upscale
    // batched path preserves count
    import spark.implicits._
    val ds = spark.createDataset(Seq(d, small))
    assert(Multimodal.resizeAll(ds).count() == 2)
  }

  test("frame sampling never carries the payload through the explode") {
    val df = Multimodal.sampleFrames(spark, sf)
    assert(!df.columns.contains("payload"))
    assert(df.count() > 0)
    // video assets only
    val vids = Multimodal.assets(spark, sf).filter(_.media_type == "video").count()
    assert(df.select("asset_id").distinct().count() == vids)
  }
}
