package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("as-of join: greatest right t <= left t per key; equal t matches; no match -> null") {
    import spark.implicits._
    val left = Seq((1L, 10L, "L1"), (1L, 25L, "L2"), (2L, 5L, "L3"))
      .toDF("key", "t", "lv")
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 7L, "c"))
      .toDF("key", "t", "rv")
    val out = AsOfJoin.asOf(left, right)
      .select("lv", "rv", "r_t")
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out == Set(
      ("L1", Some("a"), 10L),   // equal timestamp matches (>= semantics)
      ("L2", Some("b"), 20L),   // greatest earlier right row
      ("L3", None, -1L)))       // right row at t=7 is after left t=5
  }

  test("as-of join keeps every left row exactly once") {
    import spark.implicits._
    val left = (1 to 50).map(i => (i.toLong % 5, i.toLong * 2, s"L$i"))
      .toDF("key", "t", "lv")
    val right = (1 to 20).map(i => (i.toLong % 5, i.toLong * 3, s"R$i"))
      .toDF("key", "t", "rv")
    val out = AsOfJoin.asOf(left, right)
    assert(out.count() == 50)
    assert(out.select("lv").distinct().count() == 50)
  }

  test("forward as-of: smallest right t >= left t; equal t matches; none after -> null") {
    import spark.implicits._
    val left = Seq((1L, 10L, "L1"), (1L, 25L, "L2"), (2L, 9L, "L3"))
      .toDF("key", "t", "lv")
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 7L, "c"))
      .toDF("key", "t", "rv")
    val out = AsOfJoin.asOfForward(left, right)
      .select("lv", "rv", "r_t")
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out == Set(
      ("L1", Some("a"), 10L),   // equal timestamp matches (inclusive)
      ("L2", None, -1L),        // no right row at or after t=25
      ("L3", None, -1L)))       // key 2's only right row is before t=9
  }

  test("forward as-of agrees with the naive min-over-future theta join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = (1 to 60).map(i => (i.toLong % 7, i.toLong * 5, s"L$i"))
      .toDF("key", "t", "lv")
    val right = (1 to 40).map(i => (i.toLong % 7, i.toLong * 7, s"R$i"))
      .toDF("key", "t", "rv")
    val fast = AsOfJoin.asOfForward(left, right)
      .select($"lv", $"r_t").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val naive = left.as("l").join(right.as("r"),
        $"l.key" === $"r.key" && $"r.t" >= $"l.t", "left_outer")
      .groupBy($"lv").agg(min($"r.t").as("mt")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(fast == naive)
  }

  test("purchase attribution: gap is non-negative when matched") {
    import org.apache.spark.sql.functions._
    val df = AsOfJoin.purchaseAttribution(spark, TestSpark.sf)
    assert(df.count() > 0)
    assert(df.filter(col("gap_us") < 0).count() == 0)
  }
}
