package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** mm_image_clusters — cluster resolution on the image modality.
  * Asset-table conventions (Multimodal.assets): doc_id % 3 == 0 is an
  * image; geometry w = 4 + len % 29, h = 4 + len % 13; pixel seed =
  * doc_id % 251; corrupt when doc_id % 17 == 0. Two docs with equal
  * text length and equal (doc_id % 251) encode BYTE-IDENTICAL BMPs, so
  * their aHashes collide at hamming 0 — the planted dup family.
  */
class ImageClustersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("identical images cluster, keeper is min id; corrupt excluded; singleton kept") {
    import spark.implicits._
    val base = "equal length text payload body!!" // any text; length drives geometry
    val other = "a completely different document with its own geometry and content"
    // 3, 756, 1509 ≡ 3 (mod 251) and ≡ 0 (mod 3): identical BMPs
    // 12: image, different content → singleton
    // 51 ≡ 0 (mod 17) and (mod 3): corrupt image → excluded entirely
    // 7: not an image (doc_id % 3 == 1) → must not appear
    val docs = Seq(3L -> base, 756L -> base, 1509L -> base,
      12L -> other, 51L -> base, 7L -> base)
    val tmp = java.nio.file.Files.createTempDirectory("imgcc").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Multimodal.imageClusters(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(3L -> (3L, 3L), 12L -> (1L, 12L)),
      s"clusters: $out")
  }

  test("keep rule ranks by weight (resolution), asset-id tie-break") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("asset_a", "asset_b")
    // family {1,2,3}: 2 has the largest weight → keeper despite id 1
    // family {10,11}: equal weights → min id 10 keeps
    // 20: singleton by membership (in weights, off the pair graph)
    val weights = Seq((1L, 10L), (2L, 99L), (3L, 10L),
      (10L, 7L), (11L, 7L), (20L, 1L)).toDF("asset_id", "nw")
    val out = Multimodal.contentClusters(spark, pairs, weights).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> (3L, 2L), 10L -> (2L, 10L), 20L -> (1L, 20L)),
      s"clusters: $out")
  }
}
