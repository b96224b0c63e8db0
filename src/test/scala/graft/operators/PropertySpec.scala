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
}
