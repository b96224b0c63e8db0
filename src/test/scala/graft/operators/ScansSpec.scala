package graft.operators

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The segmented parallel scan must be BIT-IDENTICAL to the global
  * ordered window it replaces, while planning only defined-partition
  * windows (the shard-local scan + the ScanShards-row carry).
  */
class ScansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("segmented cumsum = global ordered window; all windows partition-defined") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, i * 37 % 11, i * 13 % 7))
      .toDF("id", "a", "b")
    val out = Scans.segmentedCumSum(Scans.shardByRange(df, $"id"),
      "__shard", Seq($"id"), Seq(($"a", "ca"), ($"b", "cb")))
    val w = Window.orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("ca", sum($"a").over(w))
      .withColumn("cb", sum($"b").over(w))
      .select($"id", $"ca", $"cb").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = out.select($"id", $"ca", $"cb").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // genuinely sharded — the scan work fans out, it doesn't funnel
    assert(out.select($"__shard").distinct().count() >= Scans.ScanShards / 2)
    // and no window in the plan is partition-undefined (the warning
    // class this module exists to retire)
    val specs = out.queryExecution.sparkPlan.collect {
      case we: WindowExec => we.partitionSpec
    }
    assert(specs.nonEmpty && specs.forall(_.nonEmpty))
  }

  test("shardByRange degenerate shapes: single row, constant key, key gaps") {
    import spark.implicits._
    // one row: width = (0 div 32) + 1 = 1, shard 0, cum = value
    val one = Scans.segmentedCumSum(
      Scans.shardByRange(Seq((0L, 5L)).toDF("id", "v"), $"id"),
      "__shard", Seq($"id"), Seq(($"v", "cum"))).collect()
    assert(one.length == 1 && one.head.getAs[Long]("cum") == 5L)
    // constant key: all rows one shard, order falls to the tiebreak col
    val const = Seq((7L, 0L, 1L), (7L, 1L, 2L), (7L, 2L, 4L))
      .toDF("k", "tie", "v")
    val c = Scans.segmentedCumSum(Scans.shardByRange(const, $"k"),
      "__shard", Seq($"tie"), Seq(($"v", "cum")))
      .orderBy($"tie").collect().map(_.getAs[Long]("cum"))
    assert(c.toSeq == Seq(1L, 3L, 7L))
    // sparse keys with empty shard ranges in between: carries still sum
    // exactly the populated shards
    val sparse = Seq(0L, 1L, 1000000L, 1000001L).map(k => (k, 1L))
      .toDF("id", "v")
    val sp = Scans.segmentedCumSum(Scans.shardByRange(sparse, $"id"),
      "__shard", Seq($"id"), Seq(($"v", "cum")))
      .orderBy($"id").collect().map(_.getAs[Long]("cum"))
    assert(sp.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("negative keys shard floor-correctly and match the global window") {
    import spark.implicits._
    // signed keys straddling zero: `div` truncation toward zero would
    // fold keys in (-width, 0) into shard 0 with the non-negatives and
    // break monotonicity; the min-offset makes bucketing a true floor
    val df = (-500L until 500L).map(i => (i, i * 37 % 11)).toDF("id", "a")
    val out = Scans.segmentedCumSum(Scans.shardByRange(df, $"id"),
      "__shard", Seq($"id"), Seq(($"a", "ca")))
    val w = Window.orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("ca", sum($"a").over(w))
      .select($"id", $"ca").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.select($"id", $"ca").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // shard ids stay monotone in the key
    val shardByKey = out.select($"id", $"__shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    assert(shardByKey.zip(shardByKey.tail).forall { case (a, b) => a <= b })
    assert(out.select($"__shard").distinct().count() >= Scans.ScanShards / 2)
  }

  test("nullable values keep SQL null-skipping semantics of the global window") {
    import spark.implicits._
    // leading all-NULL prefix (rows 0-99 NULL: global window gives NULL
    // there, NOT 0) plus interior nulls; java.lang.Long encodes nulls
    val df = (0L until 1000L).map { i =>
      val v: java.lang.Long =
        if (i < 100 || i % 7 == 3) null else java.lang.Long.valueOf(i % 13)
      (i, v)
    }.toDF("id", "a")
    val out = Scans.segmentedCumSum(Scans.shardByRange(df, $"id"),
      "__shard", Seq($"id"), Seq(($"a", "ca")))
    val w = Window.orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))
    val want = df.withColumn("ca", sum($"a").over(w))
      .select($"id", $"ca").collect().map(key).toSet
    val got = out.select($"id", $"ca").collect().map(key).toSet
    assert(got == want)
    assert(want.exists(_._2.isEmpty), "fixture must exercise NULL outputs")
  }

  test("segmented row_number = global rank, order ties never split across shards") {
    import spark.implicits._
    // scores with heavy ties (only 5 distinct values over 400 rows);
    // the shard bucket is a pure function of the score, so ties land
    // in one shard and the (score DESC, id) order stays global
    val df = (0L until 400L).map(i => (i, (i % 5) / 10.0)).toDF("id", "s")
    val sharded = df.withColumn("__shard",
      floor((lit(1.0) - $"s") * Scans.ScanShards).cast("long"))
    val got = Scans.segmentedRowNumber(sharded, "__shard",
      Seq($"s".desc, $"id"), "rnk")
      .select($"id", $"rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.orderBy($"s".desc, $"id")
    val want = df.withColumn("rnk", row_number().over(w).cast("long"))
      .select($"id", $"rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }
}
