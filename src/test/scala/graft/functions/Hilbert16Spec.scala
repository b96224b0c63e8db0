package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Hilbert16 kernel: verified against an INDEPENDENT inverse walk
  * (d→xy) — round-tripping proves bijectivity on the sample, and the
  * defining curve property (consecutive indices are axis-adjacent
  * cells, the locality z-order lacks) is checked directly.
  */
class Hilbert16Spec extends AnyFunSuite {

  private val N = 1L << 16

  /** Independent d→(x,y) walk (the standard inverse form). */
  private def d2xy(d: Long): (Long, Long) = {
    var (x, y) = (0L, 0L)
    var t = d
    var s = 1L
    while (s < N) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  test("forward walk inverts the independent d2xy on a dense + random sample") {
    val rnd = new scala.util.Random(7)
    val ds = (0L until 4096L) ++ Seq.fill(4096)(
      (rnd.nextLong() & 0x7fffffffffffffffL) % (N * N))
    ds.foreach { d =>
      val (x, y) = d2xy(d)
      assert(Hilbert16.index(x, y) == d, s"d=$d -> ($x,$y)")
    }
  }

  test("consecutive curve positions are Manhattan-adjacent cells") {
    val rnd = new scala.util.Random(11)
    val starts = Seq.fill(2048)(
      (rnd.nextLong() & 0x7fffffffffffffffL) % (N * N - 1))
    (starts ++ (0L until 1024L)).foreach { d =>
      val (x1, y1) = d2xy(d)
      val (x2, y2) = d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"d=$d: ($x1,$y1) -> ($x2,$y2) not adjacent")
    }
  }

  test("index range is exactly the 32-bit square") {
    assert(Hilbert16.index(0, 0) >= 0)
    val rnd = new scala.util.Random(13)
    Seq.fill(4096)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
      .foreach { case (x, y) =>
        val d = Hilbert16.index(x, y)
        assert(d >= 0 && d < N * N, s"($x,$y) -> $d")
      }
  }
}
