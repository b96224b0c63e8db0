package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix scans — the segmented two-pass form of
  * `sum(...) OVER (ORDER BY ...)`.
  *
  * A global ordered window forces every row into ONE partition (the
  * WindowExec single-partition warning): fine on scan-reduced or
  * fixture-bounded frames, a scale-killer on anything that grows with
  * the data. The classic fix is the textbook parallel scan, expressed
  * here entirely in DataFrame ops so Catalyst/AQE still plan it:
  *
  *   1. bucket rows into [[ScanShards]] ranges of a column MONOTONE in
  *      the scan order (shard boundaries never split an order tie);
  *   2. per-shard totals — one map-side-combinable aggregate,
  *      [[ScanShards]] rows out;
  *   3. exclusive carry per shard — an ordered window over the TOTALS
  *      frame only (metadata-sized: [[ScanShards]] rows, partitioned
  *      by a constant so Spark plans a defined — if single — partition
  *      without the all-data warning);
  *   4. shard-partitioned ordered window + broadcast-joined carry.
  *
  * Every stage is shuffle-partitioned by the shard key except the
  * [[ScanShards]]-row carry window — the scan runs at full cluster
  * width on 100 TB. Results are bit-identical to the global window:
  * integer sums are associative, floating sums keep the exact
  * left-to-right fold order within a shard while the carry adds the
  * (exactly-summed, for integral types) prefix, and NULL values follow
  * SQL's null-skipping window semantics exactly (a row whose entire
  * global prefix is NULL gets NULL, anything else sums the non-null
  * prefix) — the four registered consumers (`curate_pps_sample`,
  * `ev_peak_concurrency`, `curate_el2n`, `q_weighted_median`) all scan
  * non-null integral values, so their DuckDB oracles are unchanged.
  */
object Scans {

  /** Shard fan-out: ≥ the local-mode lane count; at 1000 executors
    * raise it (it only changes the carry frame's row count — the knob
    * the per-query scaladocs used to describe in prose).
    */
  val ScanShards = 32

  /** Adds a `__shard` range-bucket of the given order-monotone LONG
    * key: floor((key − min) / width) with width sized off the key's
    * span so ~[[ScanShards]] buckets result. Offsetting by the min
    * (also in the 1-row bounds frame, which rides the approved
    * broadcast-cross pattern) makes the `div` a true floor division
    * for ANY signed key — a negative key (pre-1970 timestamp, signed
    * id) would otherwise truncate toward zero and break shard
    * monotonicity around zero.
    */
  def shardByRange(df: DataFrame, key: Column): DataFrame = {
    val bounds = df.agg(max(key).cast("long").as("__scan_mx"),
      min(key).cast("long").as("__scan_mn"))
    df.withColumn("__scan_k", key.cast("long"))
      .crossJoin(broadcast(bounds))
      .withColumn("__shard",
        expr(s"(__scan_k - __scan_mn) div " +
          s"(((__scan_mx - __scan_mn) div $ScanShards) + 1)"))
      .drop("__scan_k", "__scan_mx", "__scan_mn")
  }

  /** Running `sum(value) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING
    * .. CURRENT ROW)` for each (value → outName) pair, segmented by
    * `shardCol` (a column of `df`, monotone non-decreasing in the
    * order). The shard column is kept; callers drop it.
    *
    * NULL semantics match the global window exactly: the carry keeps
    * SQL's null-skipping nullness (NULL iff every earlier shard's
    * total is NULL, i.e. every earlier value is NULL), and a row whose
    * shard-local prefix is all-NULL inherits the carry rather than
    * poisoning the sum — so the output is NULL iff the row's ENTIRE
    * global prefix is NULL, exactly as `sum(...) OVER (ORDER BY ...)`
    * behaves.
    */
  def segmentedCumSum(df: DataFrame, shardCol: String, order: Seq[Column],
      values: Seq[(Column, String)]): DataFrame = {
    val sh = col(shardCol)
    val tagged = values.zipWithIndex.foldLeft(df) {
      case (d, ((v, _), i)) => d.withColumn(s"__scan_v$i", v)
    }
    val aggs = values.indices.map(i =>
      sum(col(s"__scan_v$i")).as(s"__scan_t$i"))
    val totals = tagged.groupBy(sh).agg(aggs.head, aggs.tail: _*)
    // pmod(shard, 1) is single-valued but NOT constant-foldable, so
    // the [ScanShards]-row carry window keeps a DEFINED partition spec
    // (no all-data-to-one-partition warning; PlanLint asserts it)
    val wCarry = Window.partitionBy(pmod(sh, lit(1))).orderBy(sh)
      .rowsBetween(Window.unboundedPreceding, -1)
    // carry stays NULLABLE (sum skips nulls; an empty/all-null earlier
    // prefix is NULL) — coalescing it to 0 here would turn the global
    // window's all-null-prefix NULL into 0 for nullable value columns
    val carries = totals.select(
      sh +: values.indices.map(i =>
        sum(col(s"__scan_t$i")).over(wCarry).as(s"__scan_c$i")): _*)
    val wLocal = Window.partitionBy(sh).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = tagged.join(broadcast(carries), shardCol)
    val withOuts = values.zipWithIndex.foldLeft(joined) {
      case (d, ((_, out), i)) =>
        val local = sum(col(s"__scan_v$i")).over(wLocal)
        val carry = col(s"__scan_c$i")
        d.withColumn(out,
          when(local.isNull, carry)
            .when(carry.isNull, local)
            .otherwise(local + carry))
    }
    values.indices.foldLeft(withOuts)(
      (d, i) => d.drop(s"__scan_v$i", s"__scan_c$i"))
  }

  /** Global `row_number() OVER (ORDER BY order)` segmented by
    * `shardCol` (monotone non-decreasing in the order, never splitting
    * an order tie): per-shard row_number + the carry count of all
    * earlier shards' rows.
    */
  def segmentedRowNumber(df: DataFrame, shardCol: String,
      order: Seq[Column], out: String): DataFrame = {
    val sh = col(shardCol)
    val totals = df.groupBy(sh).agg(count(lit(1)).as("__scan_n"))
    val wCarry = Window.partitionBy(pmod(sh, lit(1))).orderBy(sh)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = totals.select(sh,
      coalesce(sum(col("__scan_n")).over(wCarry), lit(0L)).as("__scan_c"))
    val wLocal = Window.partitionBy(sh).orderBy(order: _*)
    df.join(broadcast(carries), shardCol)
      .withColumn(out, row_number().over(wLocal).cast("long") + col("__scan_c"))
      .drop("__scan_c")
  }
}
