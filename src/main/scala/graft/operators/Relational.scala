package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational query surface.
  *
  * The reference has no relational algebra layer (SURVEY.md §2) — its
  * aggregation semantics are the word-count family (reference
  * `src/test/scala/com/miguno/kafkastorm/integration/StormSpec.scala:43-109`)
  * and the fork README's declared time-interval count query
  * (reference `README.md:57-69`). These queries exercise the Spark
  * primitives that capability set maps onto — scan, filter, hash
  * aggregation (partial → final, automatic in Spark), hash/broadcast
  * joins, windows — over the driver-generated TPC-H-ish tables.
  *
  * Scale notes (100 TB design intent):
  *   - Every aggregation is a map-side-combinable `groupBy`; no
  *     driver-side collects anywhere in the query path.
  *   - Dimension tables (region/nation/customer-filtered/part-filtered)
  *     are explicitly `broadcast()` so the big fact tables
  *     (lineitem/orders) never shuffle for those joins.
  *   - Filters are plain column predicates → Catalyst pushes them into
  *     the parquet scan (`PushedFilters`), prunes columns (`ReadSchema`).
  *   - Double aggregates are rounded at the output boundary (round(x,2))
  *     purely so results hash-match the DuckDB oracle bit-for-bit; the
  *     unrounded plan is unchanged.
  */
object Relational {

  private def round2(c: Column): Column = round(c, 2)

  /** Q1-style pricing summary: full-scan hash agg on two low-cardinality
    * keys. At scale: partial aggregation makes the shuffle 6 rows/partition.
    */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round2(sum($"l_quantity")).as("sum_qty"),
        round2(sum($"l_extendedprice")).as("sum_base_price"),
        round2(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_price"),
        round2(avg($"l_quantity")).as("avg_qty"),
        round2(avg($"l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 2) AS avg_qty,
      |  round(avg(l_extendedprice), 2) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Q6-style forecast revenue: pure scan + conjunctive filter + global agg.
    * All three predicates push down to parquet; single-row result.
    */
  def q06ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
              $"l_discount".between(0.05, 0.07) &&
              $"l_quantity" < 24)
      .agg(round2(sum($"l_extendedprice" * $"l_discount")).as("revenue"))
  }

  val q06Sql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q06_forecast_revenue" -> (q06ForecastRevenue _))

  def oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q06_forecast_revenue" -> q06Sql)
}
