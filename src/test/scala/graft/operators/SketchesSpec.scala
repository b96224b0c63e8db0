package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, sum}
import graft.TestSpark

/** Invariants of the deterministic sketch family — the oracle gate
  * proves cross-engine bit-parity of each full pipeline; these pin the
  * mathematical guarantees the sketches exist for.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("HLL estimate lands within the 3-sigma error band of the exact count") {
    val rows = Sketches.hllUsers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDouble(2)
      // p=12 ⇒ σ ≈ 1.04/64; small-range linear counting is tighter, so
      // 3σ ≈ 4.9% is a conservative gate either way
      assert(math.abs(est - exact) <= math.max(3.0, 0.049 * exact),
        s"${r.getString(0)}: exact=$exact est=$est")
      assert(r.getLong(3) <= Sketches.HllM)
    }
  }

  test("per-shard HLL registers merge to exactly the direct estimate") {
    val rows = Sketches.hllMerged(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"${r.getString(0)}: direct=${r.getDouble(1)} merged=${r.getDouble(2)}")
    }
  }

  test("two-phase exact quantiles bound the histogram estimate by one bucket") {
    val rows = Sketches.histQuantiles(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(2), r.getDouble(3))
      // est is the lower edge of the bucket holding quantile q, so the
      // exact value lives within one bucket width above it
      assert(exact >= est - 1e-9, s"q=${r.getDouble(0)}")
      assert(exact - est <= 2 * 1e5 / Sketches.HistBuckets,
        s"q=${r.getDouble(0)}: est=$est exact=$exact")
    }
  }

  test("CMS never underestimates and stays within the epsilon bound") {
    val rows = Sketches.cmsHeavy(spark, sf).collect()
    assert(rows.length == Sketches.CmsTopK)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val totalToks = graft.Tables.documents(spark, sf)
      .select(explode(split(lower($"text"), "\\s+")).as("t"))
      .where($"t" =!= "").count()
    // ε = e/w per the CMS bound; with d=4 rows the min beats it w.h.p. —
    // use the plain single-row bound as a hard gate
    val eps = math.E / Sketches.CmsW
    rows.foreach { r =>
      val exact = r.getLong(1)
      val est = r.getLong(2)
      assert(est >= exact, s"${r.getString(0)}: CMS must never underestimate")
      assert(est - exact <= (eps * totalToks).ceil.toLong,
        s"${r.getString(0)}: overestimate ${est - exact} beyond bound")
    }
  }

  test("KMV: merged shards equal direct bit-for-bit; estimate exact below k, banded above") {
    val rows = Sketches.kmvDistinct(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val nMin = r.getLong(2)
      val (est, mergedEst) = (r.getDouble(3), r.getDouble(4))
      assert(est == mergedEst,
        s"${r.getString(0)}: direct=$est merged=$mergedEst")
      if (nMin < Sketches.KmvK) assert(est == exact)
      // k=64 ⇒ σ ≈ 1/√62 ≈ 12.7%; 3σ gate
      else assert(math.abs(est - exact) <= 3.0 * exact / math.sqrt(Sketches.KmvK - 2.0),
        s"${r.getString(0)}: exact=$exact est=$est")
    }
  }

  test("KMV: the rank filter compiles to WindowGroupLimit (bounded pre-shuffle state)") {
    val p = Sketches.kmvDistinct(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("KMV overlap discriminates planted partial-overlap sets within the error band") {
    import spark.implicits._
    // A = 0..999, B = 500..1499 (J = 1/3), C = 0..99 ⊂ A (J(A,C) = 0.1)
    val ev = ((0L until 1000L).map(("A", _)) ++
      (500L until 1500L).map(("B", _)) ++
      (0L until 100L).map(("C", _))).toDF("event_type", "user_id")
    val rows = Sketches.kmvOverlapOn(spark, ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(5))).toMap
    val (abExact, abInter, abJacc) = rows(("A", "B"))
    assert(abExact == 500)
    // k=64 ⇒ σ_J ≈ √(J(1-J)/k) ≈ 0.059; 3σ band on the Jaccard estimate
    assert(math.abs(abJacc - 1.0 / 3.0) <= 0.18, s"J(A,B)=$abJacc")
    assert(math.abs(abInter - 500.0) <= 0.45 * 500.0, s"inter=$abInter")
    val (acExact, _, acJacc) = rows(("A", "C"))
    assert(acExact == 100)
    assert(acJacc < abJacc, "smaller true overlap must estimate smaller")
    // disjoint sanity: B∩C is empty — the exact-calibration inner join
    // drops the pair (no exact row), so it must be absent from the output
    assert(!rows.contains(("B", "C")), "disjoint pair must not fabricate overlap")
  }

  test("KMV theta-difference discriminates planted asymmetric sets") {
    import spark.implicits._
    // A = 0..999, B = 500..1499: |A∖B| = |B∖A| = 500; C = 0..99 ⊂ A:
    // |A∖C| = 900, |C∖A| = 0
    val ev = ((0L until 1000L).map(("A", _)) ++
      (500L until 1500L).map(("B", _)) ++
      (0L until 100L).map(("C", _))).toDF("event_type", "user_id")
    val rows = Sketches.kmvDiffOn(spark, ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
    val (abEx, abEst, baEx, baEst) = rows(("A", "B"))
    assert(abEx == 500 && baEx == 500)
    // k=64 theta sketch: relative σ ≈ 1/√k ≈ 0.125 on the subset
    // density; generous 3σ-ish band on a 500-element difference
    assert(math.abs(abEst - 500.0) <= 0.5 * 500.0, s"est_ab=$abEst")
    assert(math.abs(baEst - 500.0) <= 0.5 * 500.0, s"est_ba=$baEst")
    val (acEx, acEst, caEx, caEst) = rows(("A", "C"))
    assert(acEx == 900 && caEx == 0)
    assert(caEst == 0.0, s"subset side must estimate zero, got $caEst")
    assert(acEst > abEst, "larger true difference must estimate larger")
    // disjoint pair carries no intersection row — dropped, like overlap
    assert(!rows.contains(("B", "C")))
  }

  test("bitmap distinct is EXACT per day and OR-merges to the exact total") {
    val rows = Sketches.bitmapDau(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau_exact") == r.getAs[Long]("dau_bitmap"),
        s"day ${r.getString(0)}")
      assert(r.getAs[Long]("total_exact") == r.getAs[Long]("total_bitmap"))
    }
  }

  test("AMS F2 estimate lands in the k=16 tug-of-war error band") {
    val rows = Sketches.amsF2(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("f2_exact").toDouble
      val est = r.getAs[Double]("f2_est")
      // Var ≈ 2·F2²/k ⇒ relative σ ≈ √(2/16) ≈ 0.354; 3σ band (the
      // hard contract is the oracle — the estimator pipeline itself is
      // hash-checked — this gates that the statistic is a real estimate)
      assert(est > 0.0 && math.abs(est - exact) <= 1.1 * exact,
        s"${r.getString(0)}: exact=$exact est=$est")
    }
  }

  test("Bloom pruning has no false negatives (bloom rows cover true rows)") {
    // sf0.001 has no NATION_9 suppliers, so drive the operator at sf0.01
    // where the build side is non-empty
    val rows = Sketches.bloomPrune(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        "bloom-surviving rows must be a superset of truly-matching rows")
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
      assert(r.getLong(2) > 0, "fixture must actually exercise the join")
    }
  }

  test("grouped quantile sketch brackets the exact per-group percentile by one bucket") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Sketches.groupQuantiles(spark, sf).collect()
    val groups = rows.map(_.getString(0)).toSet
    assert(rows.length == groups.size * 3)
    // exact per-group interpolated percentiles (the builtin the sketch
    // replaces) must land within one per-group bucket width of est
    val exact = graft.Tables.orders(spark, sf)
      .groupBy($"o_orderstatus")
      .agg(expr("percentile(CAST(o_totalprice AS DOUBLE), array(0.25, 0.5, 0.9))").as("p"),
        min($"o_totalprice".cast("double")).as("lo"),
        max($"o_totalprice".cast("double")).as("hi"))
      .collect()
      .map(r => r.getString(0) -> (r.getSeq[Double](1),
        (r.getDouble(3) - r.getDouble(2)) / Sketches.GroupHistBuckets))
      .toMap
    rows.foreach { r =>
      val g = r.getString(0)
      val q = r.getDouble(2)
      val est = r.getDouble(4)
      val (ps, width) = exact(g)
      val ex = q match { case 0.25 => ps(0); case 0.5 => ps(1); case _ => ps(2) }
      assert(ex >= est - 1e-9, s"$g q=$q: est=$est exact=$ex")
      assert(ex - est <= 2 * width + 1e-9, s"$g q=$q: est=$est exact=$ex width=$width")
    }
  }

  /** The cover-correctness argument, checkable from (lo, hi) alone:
    * all 15 ranges sit inside the span, every cover cell sits fully
    * inside its range, per-level cell counts stay ≤ 2 within the level
    * budget, and cover-cell sizes sum to the exact range length —
    * fully-inside + sum-to-length together prove the cells are a
    * disjoint exact partition of the range.
    */
  private def checkDyadicCover(lo: Long, hi: Long): Unit = {
    import spark.implicits._
    // dyadicRanges only reads min/max of b, so two endpoint rows suffice
    val bcnt = Seq((lo, 1L), (hi, 1L)).toDF("b", "n")
    val ranges = Sketches.dyadicRanges(bcnt).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ranges.length == 15)
    val cover = Sketches.dyadicCover(Sketches.dyadicRanges(bcnt))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    cover.groupBy(t => (t._1, t._2)).foreach { case ((rid, l), cs) =>
      // beyond the level budget the top level legitimately holds the
      // whole remainder; within it the boundary-slice bound is ≤ 2
      if (l < Sketches.DyadicLevels - 1)
        assert(cs.size <= 2, s"span ($lo,$hi) range $rid level $l: ${cs.size} cells")
    }
    ranges.foreach { case (rid, ra, rb) =>
      assert(lo <= ra && ra <= rb && rb <= hi, s"range $rid out of span")
      val sizes = cover.filter(_._1 == rid).map { case (_, l, c) =>
        val cellLo = c << l
        val cellHi = ((c + 1L) << l) - 1
        assert(cellLo >= ra && cellHi <= rb,
          s"span ($lo,$hi) range $rid: cell $c@$l [$cellLo,$cellHi] leaks")
        cellHi - cellLo + 1
      }
      assert(sizes.sum == rb - ra + 1,
        s"span ($lo,$hi) range $rid: cover mass ${sizes.sum} != ${rb - ra + 1}")
    }
  }

  test("dyadic cover partitions every range exactly with at most 2 cells per level") {
    // adversarial spans: single bucket, span < 8 (w8 floor), odd offsets,
    // a power-of-two-straddling span, and the real fixture's epoch range
    Seq((5L, 5L), (0L, 6L), (3L, 10L), (17L, 59L),
      (1L, 2001L), (28401120L, 28444317L))
      .foreach { case (lo, hi) => checkDyadicCover(lo, hi) }
  }

  test("property: dyadic cover partition holds on random spans, incl. beyond the level budget") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      lo <- Gen.chooseNum(0L, 40000000L)
      // two regimes: short audit windows, and spans past the 2^19-minute
      // level budget that exercise the forced top-level cover
      len <- Gen.oneOf(Gen.chooseNum(1L, 300L), Gen.chooseNum(1L, 5000000L))
    } yield (lo, lo + len - 1)
    val params = Gen.Parameters.default
    (1 to 8).foreach { i =>
      val (lo, hi) = gen.pureApply(params, Seed(4200L + i))
      checkDyadicCover(lo, hi)
    }
  }

  test("dyadic finalize emits every range on a sparse corpus — empty ranges report exact_cnt 0") {
    import spark.implicits._
    // two event-minutes a thousand buckets apart: the six interior
    // eighths contain no minutes at all. Before the round-12 left-join
    // fix the inner exact join silently DROPPED those ranges; the
    // 15-row contract must hold with exact_cnt = 0 instead.
    val bcnt = Seq((0L, 3L), (1000L, 2L)).toDF("b", "n")
    val counters = Sketches.dyadicCounterRows(bcnt)
      .groupBy(col("j"), col("level"), col("slot"))
      .agg(sum(col("n")).as("cnt"))
    val rows = Sketches.dyadicFinalize(spark, sf, counters, Some(bcnt))
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 15, s"sparse corpus must still emit 15 ranges, got ${rows.length}")
    val empties = rows.filter(_.getLong(3) == 0L)
    assert(empties.nonEmpty, "fixture must contain at least one empty range")
    rows.foreach { r =>
      val (rid, exact, est, over) =
        (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(est >= exact, s"range $rid: est $est < exact $exact")
      assert(over == est - exact)
      if (rid == 14L) assert(exact == 5L, "full span must count both minutes' events")
    }
  }

  test("dyadic CMS range estimates dominate exact counts; full span is the corpus") {
    val rows = Sketches.dyadicRangeCount(spark, sf).collect()
    assert(rows.length == 15)
    val total = graft.Tables.events(spark, sf).count()
    rows.foreach { r =>
      val (rid, exact, est, over) =
        (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(est >= exact, s"range $rid: est $est < exact $exact")
      assert(over == est - exact)
      if (rid == 14L) assert(exact == total, "full-span range must count everything")
    }
  }
}
