package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized check of the arithmetic behind [[NanosRangePushdown]]:
  * for integer micros m and nanos literal L, each rewritten bound must
  * agree with the original `m*1000 <cmp> L` on EVERY (m, L) — the
  * ceil/floor choice per operator is exactly where an off-by-one
  * would silently widen or narrow a scan range. Literals are drawn
  * both adversarially (within ±2000 of a true m·1000 product, where
  * every boundary case lives) and uniformly in the safe long range.
  */
class NanosRangeMathPropSpec extends AnyFunSuite {

  // the rule's divisions, restated (the rule keeps them private; the
  // CONTRACT under test is the math itself)
  private def fdiv(l: Long): Long = Math.floorDiv(l, 1000L)
  private def cdiv(l: Long): Long = Math.floorDiv(l + 999L, 1000L)

  private val params = Gen.Parameters.default
  private def longs(seed: Long, n: Int, g: Gen[Long]): List[Long] =
    Gen.listOfN(n, g).pureApply(params, Seed(seed))

  // the ts_ns contract domain: micros whose ×1000 stays inside signed-64
  // (the int64-nanos-representable range, 1677-09-21 .. 2262-04-11) —
  // outside it the DERIVED column itself overflows and the contract
  // does not exist (see the rule's DOMAIN note)
  // clamped by 3 so m*1000 ± the 2000-wide adversarial delta stays in
  // signed-64 too — the rule's SafeLong guard declines literals within
  // 1000 of the Long bounds for exactly this reason
  private val MaxM = Long.MaxValue / 1000L - 3L
  private val microsGen = Gen.frequency(
    (8, Gen.chooseNum(-MaxM, MaxM)),
    (1, Gen.oneOf(MaxM, -MaxM, MaxM - 1L, -MaxM + 1L, 0L)))

  test("property: every rewritten comparison equals the original on adversarial literals") {
    val ms = longs(7L, 400, microsGen)
    val deltas = longs(11L, 400, Gen.chooseNum(-2000L, 2000L))
    ms.zip(deltas).foreach { case (m, d) =>
      val l = m * 1000L + d
      assert((m * 1000L >= l) == (m >= cdiv(l)), s">= m=$m l=$l")
      assert((m * 1000L > l) == (m >= fdiv(l) + 1L), s"> m=$m l=$l")
      assert((m * 1000L <= l) == (m <= fdiv(l)), s"<= m=$m l=$l")
      assert((m * 1000L < l) == (m < cdiv(l)), s"< m=$m l=$l")
      assert((m * 1000L == l) == (l % 1000L == 0L && m == l / 1000L),
        s"= m=$m l=$l")
    }
  }

  test("property: uniform random (m, L) pairs agree on all five operators") {
    val ms = longs(13L, 400, microsGen)
    val ls = longs(17L, 400,
      Gen.chooseNum(-4_000_000_000_000_000_000L, 4_000_000_000_000_000_000L))
    ms.zip(ls).foreach { case (m, l) =>
      assert((m * 1000L >= l) == (m >= cdiv(l)))
      assert((m * 1000L > l) == (m >= fdiv(l) + 1L))
      assert((m * 1000L <= l) == (m <= fdiv(l)))
      assert((m * 1000L < l) == (m < cdiv(l)))
      assert((m * 1000L == l) == (l % 1000L == 0L && m == l / 1000L))
    }
  }
}
