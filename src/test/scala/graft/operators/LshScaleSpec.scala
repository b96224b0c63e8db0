package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.Hashing

/** Pins the round-3 scale fix: LSH bucket-key width grows with
  * log₂(collection size), so bucket population stays bounded as the data
  * scales — a fixed width (round 2: 6-bit neardup tables, 15-bit SimHash
  * chunks) meant within-bucket candidate pairs grew ~N²/buckets.
  */
class LshScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketBits keeps expected bucket population near target across 9 decades") {
    var prev = 0
    for (exp <- 3 to 12) {
      val n = math.pow(10, exp).toLong
      val bits = Hashing.bucketBits(n, 32L, 1, 62)
      assert(bits >= prev, s"width must be monotone in n (n=$n)")
      prev = bits
      // expected population n / 2^bits lands in [target/2, target] once
      // out of the clamp region — the defining property of the derivation
      val expected = n.toDouble / math.pow(2, bits)
      assert(expected <= 32.0 + 1e-9, s"n=$n bits=$bits expected=$expected")
      assert(expected >= 16.0 - 1e-9, s"n=$n bits=$bits expected=$expected")
    }
  }

  test("derived shapes: today's SFs keep the round-2 geometry, 100-TB corpora widen") {
    // at test scale the derivation reproduces the round-2 constants …
    assert(Similarity.ndPlanesPerTable(500) == 6)
    assert(Dedup.simhashChunkBits(500) == 15)
    // … and at pretraining-corpus scale the keys widen with log2(N)
    assert(Similarity.ndPlanesPerTable(1000L * 1000 * 1000) == 24) // clamp ceiling
    assert(Similarity.ndPlanesPerTable(1000L * 1000) == 15)
    assert(Dedup.simhashChunkBits(1000L * 1000 * 1000) == 25)
    assert(Dedup.simhashChunkBits(1000L * 1000 * 1000 * 1000) == 30) // clamp ceiling
    // chunk count stays >= 2 so the multiprobe Hamming guarantee holds
    assert(60 / Dedup.simhashChunkBits(Long.MaxValue) >= 2)
  }

  /** Deterministic synthetic embeddings (seeded splitmix, 64-dim). */
  private def writeEmbeddings(n: Int): String = {
    import spark.implicits._
    val dir = graft.TempDirs.scoped(s"lsh_scale_$n")
    (0 until n).map { id =>
      val emb = Array.tabulate(64) { d =>
        val bits = Hashing.splitmix64(0xabcdefL + id.toLong * 64 + d)
        (bits.toDouble / Long.MaxValue.toDouble).toFloat
      }
      (id.toLong, emb)
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def bucketStats(dir: String): (Int, Long, Double) = {
    import spark.implicits._
    val (npt, planes) = Similarity.ndParams(spark, dir)
    val sigs = graft.Tables.embeddings(spark, dir)
      .select($"vec_id", posexplode(graft.functions.HyperplaneSigs.sigs(
        $"embedding", planes, Similarity.NdTables, npt)).as(Seq("t", "sig")))
    val per = sigs.groupBy($"t", $"sig").count()
    val row = per.agg(max($"count"), avg($"count")).collect()(0)
    (npt, row.getLong(0), row.getDouble(1))
  }

  test("rewriting a dir's data invalidates the derived-parameter memo") {
    import spark.implicits._
    // same PATH, different contents: the memo key includes a data
    // fingerprint, so the second read must re-derive the width from the
    // new collection size instead of reusing the first's
    val dir = graft.TempDirs.scoped("lsh_rewrite")
    def write(n: Int): Unit =
      (0 until n).map(i => (i.toLong, Array.fill(64)(0.1f)))
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    write(500)
    val (npt1, _) = Similarity.ndParams(spark, dir)
    write(64000)
    val (npt2, _) = Similarity.ndParams(spark, dir)
    assert(npt1 == Similarity.ndPlanesPerTable(500))
    assert(npt2 == Similarity.ndPlanesPerTable(64000))
    assert(npt2 > npt1)
  }

  test("10x more embeddings: wider keys hold max bucket population roughly flat") {
    val (bits1, max1, avg1) = bucketStats(writeEmbeddings(1000))
    val (bits2, max2, avg2) = bucketStats(writeEmbeddings(10000))
    assert(bits2 > bits1, "key width must widen with the collection")
    // 10x the data, but the derived width keeps buckets near the target:
    // mean population must not scale with N …
    assert(avg2 <= 3.0 * avg1, s"avg grew $avg1 -> $avg2 under 10x data")
    // … and the heaviest bucket must grow far sublinearly (fixed-width
    // round-2 behavior would put ~10x the rows in the same 64 buckets)
    assert(max2 <= 4L * max1, s"max grew $max1 -> $max2 under 10x data")
  }
}
