package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("jl: sign masks are fixed constants with balanced bits") {
    assert(Jl.masks.length == Jl.OutDims)
    assert(Jl.masks.distinct.length == Jl.OutDims, "mask collision")
    // Achlioptas signs should be roughly balanced per row; a degenerate
    // all-one mask would make the projection a plain coordinate sum
    Jl.masks.foreach { m =>
      val ones = java.lang.Long.bitCount(m)
      assert(ones >= 16 && ones <= 48, s"mask $m too skewed: $ones ones")
    }
  }

  test("jl: distortion ratios concentrate around 1 (the JL guarantee)") {
    val rows = Jl.jlDistortion(spark, sf).collect()
    assert(rows.length > 100)
    val ratios = rows.map(_.getDouble(4))
    assert(ratios.forall(r => r > 0.05 && r < 8),
      s"ratio outside any plausible JL band: ${ratios.min} .. ${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.75 && mean < 1.25,
      s"mean ratio $mean — E[sq_proj] should be k*sq_orig")
    // projection is linear: identical vectors (if any pair had sq_orig=0)
    // are excluded by construction
    rows.foreach(r => assert(r.getDouble(2) > 0))
  }
}
