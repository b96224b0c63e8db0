package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** sketch_hll_intersect — inclusion–exclusion audience overlap. The
  * oracle pins the arithmetic bit-for-bit; this spec pins the part an
  * oracle can't: the estimate actually lands NEAR the planted truth
  * (three compounded ±1.6% estimates at m=4096), and pair coverage
  * comes from co-occurrence (disjoint segments produce no row).
  */
class HllIntersectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("planted overlap: estimate lands in the error band, disjoint pair absent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a: users 0..999; b: 500..1499 (overlap 500, union 1500); c: 5000..5099 (disjoint)
    val rows =
      (0 until 1000).map(u => ("a", u.toLong)) ++
      (500 until 1500).map(u => ("b", u.toLong)) ++
      (5000 until 5100).map(u => ("c", u.toLong))
    val tmp = java.nio.file.Files.createTempDirectory("hllint").toString
    rows.zipWithIndex
      .map { case ((t, u), i) => (i.toLong, t, u) }
      .toDF("sec", "event_type", "user_id")
      .select(timestamp_seconds($"sec").as("ts"), $"event_type", $"user_id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Sketches.hllIntersect(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // only co-occurring pairs appear: (a,b) and (b,c)? c shares nothing
    assert(out.keySet == Set(("a", "b")), s"pairs: ${out.keySet}")
    val (exact, union, inter) = out(("a", "b"))
    assert(exact == 500L)
    assert(math.abs(union - 1500.0) <= 0.05 * 1500, s"union est $union")
    assert(math.abs(inter - 500.0) <= 100.0, s"intersection est $inter")
  }

  test("identical segments: intersection estimate equals each side's estimate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (0 until 800).flatMap(u =>
      Seq(("x", u.toLong), ("y", u.toLong)))
    val tmp = java.nio.file.Files.createTempDirectory("hllint2").toString
    rows.zipWithIndex.map { case ((t, u), i) => (i.toLong, t, u) }
      .toDF("sec", "event_type", "user_id")
      .select(timestamp_seconds($"sec").as("ts"), $"event_type", $"user_id")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = Sketches.hllIntersect(spark, tmp).collect()
    assert(r.length == 1)
    // A == B: union registers == each side's registers, so
    // inter = est_a + est_b − est_union = est_a exactly (4-dp grid)
    val (exact, union, inter) = (r(0).getLong(2), r(0).getDouble(3), r(0).getDouble(4))
    assert(exact == 800L)
    assert(math.abs(inter - union) <= 1e-9, s"inter $inter vs union $union")
    assert(math.abs(inter - 800.0) <= 0.05 * 800, s"est $inter")
  }
}
