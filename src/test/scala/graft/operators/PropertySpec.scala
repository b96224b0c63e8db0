package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark

/** Randomized cross-checks for the operators whose correctness argument
  * is subtlest: the as-of join against a reference in-memory
  * implementation, and the decimal-exact sum convention against
  * BigDecimal ground truth.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("property: as-of join matches an in-memory reference on random data") {
    import spark.implicits._
    val genRows = for {
      n <- Gen.chooseNum(5, 60)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(0L, 4L)
        t <- Gen.chooseNum(0L, 50L)
      } yield (k, t))
    } yield rows
    val params = org.scalacheck.Gen.Parameters.default
    (1 to 10).foreach { i =>
      val seed = Seed(1000L + i)
      val leftRows = genRows.pureApply(params, seed)
        .zipWithIndex.map { case ((k, t), j) => (k, t, s"L$j") }
      val rightRows = genRows.pureApply(params, seed.next)
        .zipWithIndex.map { case ((k, t), j) => (k, t, s"R$j") }
        // as-of semantics need a unique match per (key, t): keep one
        // right row per (k, t), deterministically the max-tagged one
        .groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toList
      val left = leftRows.toDF("key", "t", "lv")
      val right = rightRows.toDF("key", "t", "rv")
      val got = AsOfJoin.asOf(left, right)
        .select("lv", "rv")
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
      val expected = leftRows.map { case (k, t, lv) =>
        val candidates = rightRows.filter(r => r._1 == k && r._2 <= t)
        lv -> (if (candidates.isEmpty) None
               else Some(candidates.maxBy(_._2)._3))
      }.toMap
      assert(got == expected, s"iteration $i (seed ${1000 + i})")
    }
  }

  test("property: LZW round-trips arbitrary byte arrays (skewed, runs, random)") {
    // three generator regimes: low-entropy runs (deep dictionary
    // chains + KwKwK), skewed small alphabets (fast dict growth →
    // width boundaries), and full-range noise (mostly literals)
    val regimes = Seq(
      Gen.chooseNum(0, 3).map(_.toByte),                   // tiny alphabet
      Gen.oneOf(Gen.const(7.toByte), Gen.chooseNum(0, 255).map(_.toByte)), // runs + noise
      Gen.chooseNum(0, 255).map(_.toByte))                 // uniform
    for ((g, r) <- regimes.zipWithIndex; i <- 1 to 6) {
      val len = 1 + (i * i * 137) % 9000
      val px = Gen.listOfN(len, g)
        .pureApply(Gen.Parameters.default, Seed(r * 100L + i)).toArray
      val dec = Multimodal.lzwDecode(Multimodal.lzwEncode(px), px.length)
      assert(dec.isDefined, s"regime $r iter $i len $len: decode failed")
      assert(java.util.Arrays.equals(dec.get, px),
        s"regime $r iter $i len $len: bytes differ")
    }
  }

  test("property: Exact.dsum equals BigDecimal ground truth on 2-decimal doubles") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gen = Gen.listOfN(500, Gen.chooseNum(-999999L, 999999L).map(_ / 100.0))
    (1 to 5).foreach { i =>
      val xs = gen.pureApply(Gen.Parameters.default, Seed(7L + i))
      val got = xs.toDF("x").agg(Exact.dsum(col("x"))).collect()(0).getDouble(0)
      val truth = xs.map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      assert(got == truth, s"iteration $i: $got != $truth")
    }
  }

  test("property: audio near-dup pairs match an in-memory set-Jaccard reference") {
    import spark.implicits._
    // tiny value pool ⇒ heavy window repeats within an asset AND hot
    // keys across assets — exactly the shapes the distinct must absorb
    val genTable = for {
      nAssets <- Gen.chooseNum(4, 10)
      rows <- Gen.listOfN(nAssets, for {
        n <- Gen.chooseNum(1, 30)
        shingles <- Gen.listOfN(n, Gen.chooseNum(0L, 9L))
      } yield shingles)
    } yield rows
    val params = org.scalacheck.Gen.Parameters.default
    (1 to 10).foreach { i =>
      val assets = genTable.pureApply(params, Seed(2000L + i)).zipWithIndex
        .map { case (sh, id) => (id.toLong, sh) }
      val df = assets.flatMap { case (id, sh) => sh.map(s => (id, s)) }
        .toDF("asset_id", "shingle")
      val got = Multimodal.audioNeardupPairs(spark, df).collect()
        .map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getDouble(3)))).toMap
      val sets = assets.map { case (id, sh) => id -> sh.toSet }.toMap
      val expected = (for {
        a <- sets.keys.toSeq; b <- sets.keys.toSeq if a < b
        shared = (sets(a) & sets(b)).size if shared > 0
        j = math.floor(shared.toDouble /
          (sets(a).size + sets(b).size - shared) * 1e6 + 0.5) / 1e6
        if j >= Multimodal.AudioJaccThresh
      } yield ((a, b), (shared.toLong, j))).toMap
      assert(got == expected, s"iteration $i (seed ${2000 + i})")
    }
  }

  test("property: video shingles from the real AVI walk match the closed-form fill") {
    // random clip geometries including the degenerates (0/1/2 frames →
    // no trigram) and frames big enough that the per-frame pixel sum
    // EXCEEDS 16 bits (w·h·255 ≥ 65536 from ~257 px) — exercising both
    // the container walk and the 16-bit lane mask against an
    // in-memory reference computed straight from the generator fill
    val gen = for {
      nf <- Gen.chooseNum(0, 8)
      w <- Gen.chooseNum(1, 24)
      h <- Gen.chooseNum(1, 24)
      seed <- Gen.chooseNum(0, 232)
    } yield (nf, w, h, seed)
    val params = Gen.Parameters.default
    var bigFrameSeen = false
    // iteration 0 pins a geometry whose frame sums are guaranteed past
    // 16 bits (30×30 px, mean fill ≈ 127.5·900 ≈ 114 750); 1–15 roam
    val cases = (30, 30, 30, 123) +:
      (1 to 15).map(i => gen.pureApply(params, Seed(4000L + i)))
    cases.zipWithIndex.foreach { case ((nf, w, h, seed), i) =>
      val avi = Multimodal.encodeAvi(nf, w, h, seed)
      val got = Multimodal.videoShingleRows(7L, avi).toList
      val sums = (0 until nf).map { f =>
        var s = 0L
        var j = 0
        while (j < w * h) { s += (seed + 31 * j + 7 * f) % 256; j += 1 }
        if (s > 0xFFFFL) bigFrameSeen = true
        s & 0xFFFFL
      }
      val want =
        if (nf < 3) Nil
        else (0 until nf - 2).map(f =>
          (7L, (sums(f) * 65536L + sums(f + 1)) * 65536L + sums(f + 2))).toList
      assert(got == want, s"iteration $i (seed ${4000 + i}: nf=$nf w=$w h=$h)")
      // a corrupted magic must yield zero rows, never garbage trigrams
      val bad = avi.clone(); bad(0) = 'X'.toByte
      assert(Multimodal.videoShingleRows(7L, bad).isEmpty)
    }
    assert(bigFrameSeen, "generator never exercised a >16-bit frame sum")
  }

  test("property: segmented cumsum equals the sequential prefix sum under any shard width") {
    import spark.implicits._
    val genData = for {
      n <- Gen.chooseNum(3, 80)
      vals <- Gen.listOfN(n, Gen.chooseNum(-100L, 100L))
      w <- Gen.chooseNum(1L, 20L)
    } yield (vals, w)
    val params = org.scalacheck.Gen.Parameters.default
    (1 to 10).foreach { i =>
      val (vals, w) = genData.pureApply(params, Seed(3000L + i))
      val rows = vals.zipWithIndex.map { case (v, id) => (id.toLong, v) }
      val df = rows.toDF("id", "v").withColumn("__shard",
        org.apache.spark.sql.functions.expr(s"id div $w"))
      val got = Scans.segmentedCumSum(df, "__shard",
        Seq($"id"), Seq(($"v", "cum")))
        .select($"id", $"cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = rows.map(_._2).scanLeft(0L)(_ + _).tail
        .zipWithIndex.map { case (c, id) => id.toLong -> c }.toMap
      assert(got == expected, s"iteration $i (seed ${3000 + i}, width $w)")
    }
  }
}
