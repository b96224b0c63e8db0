package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized invariants of the oracle-reproducible sketch kit — the
  * properties the generated DuckDB oracles rely on (range bounds keep
  * every intermediate inside non-overflowing BIGINT arithmetic;
  * monotonicity and determinism make the signatures joinable).
  */
class HashKitPropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default
  private def strings(seed: Long, n: Int): List[String] =
    Gen.listOfN(n, Gen.asciiPrintableStr).pureApply(params, Seed(seed))

  test("property: md5_60 is non-negative and below 2^60") {
    strings(42L, 500).foreach { s =>
      val h = Hashing.md5_60(s)
      assert(h >= 0L && h < (1L << 60), s"md5_60($s) = $h out of range")
    }
  }

  test("property: minhash60 components stay in [0, p]; perms in range") {
    assert(Hashing.minhashA60.forall(a => a >= 1 && a < Hashing.ModP))
    assert(Hashing.minhashB60.forall(b => b >= 0 && b < Hashing.ModP))
    (1 to 20).foreach { i =>
      val hs = strings(100L + i, 30).map(Hashing.md5_60)
      val sig = Hashing.minhash60(hs.iterator)
      assert(sig.length == Hashing.MinhashK)
      assert(sig.forall(m => m >= 0 && m <= Hashing.ModP))
    }
  }

  test("property: minhash60 is monotone under set growth (adding elements never raises a component)") {
    (1 to 20).foreach { i =>
      val hs = strings(200L + i, 40).map(Hashing.md5_60)
      val small = Hashing.minhash60(hs.take(20).iterator)
      val big = Hashing.minhash60(hs.iterator)
      assert(small.zip(big).forall { case (s, b) => b <= s })
    }
  }

  test("property: identical element sets give identical signatures in any order") {
    (1 to 20).foreach { i =>
      val hs = strings(300L + i, 25).map(Hashing.md5_60)
      val a = Hashing.minhash60(hs.iterator)
      val b = Hashing.minhash60(hs.reverse.iterator)
      assert(a.sameElements(b))
      val sa = Hashing.simhash60(hs.map(h => (h, 1)).iterator)
      val sb = Hashing.simhash60(hs.reverse.map(h => (h, 1)).iterator)
      assert(sa == sb)
    }
  }

  test("property: simhash60 uses only the low 60 bits") {
    (1 to 20).foreach { i =>
      val weighted = strings(400L + i, 30).map(s => (Hashing.md5_60(s), 1 + (s.length % 3)))
      val sig = Hashing.simhash60(weighted.iterator)
      assert(sig >= 0L && sig < (1L << 60))
    }
  }

  test("property: VecMeanAgg merge is commutative and order-insensitive") {
    val vecs = (1 to 12).map(i =>
      Array.tabulate(8)(j => ((i * 31 + j * 7) % 100 - 50) / 7.0f))
    def fold(vs: Seq[Array[Float]]) =
      vs.foldLeft(VecMeanAgg.zero)((b, v) => VecMeanAgg.reduce(
        VecMeanBuf(b.sums.clone(), b.n), v.clone()))
    val all = VecMeanAgg.finish(fold(vecs))
    val (l, r) = vecs.splitAt(5)
    val merged = VecMeanAgg.finish(VecMeanAgg.merge(fold(l), fold(r)))
    val mergedRev = VecMeanAgg.finish(VecMeanAgg.merge(fold(r), fold(l)))
    val shuffled = VecMeanAgg.finish(fold(new scala.util.Random(7).shuffle(vecs.toList)))
    assert(all.sameElements(merged) && all.sameElements(mergedRev)
      && all.sameElements(shuffled))
  }
}
