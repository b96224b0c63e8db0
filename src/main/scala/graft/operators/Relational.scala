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
  *   - Broadcast policy: explicit `broadcast()` hints ONLY on
  *     fixed-cardinality tables (region = 5 rows, nation = 25 — they do
  *     not grow with SF). Customer/supplier/part scale with the data, so
  *     their joins carry no hint: AQE's size-based selection broadcasts
  *     them while they fit (it does at every test SF — asserted in
  *     PlanSpec) and falls back to a shuffled hash join at the scale
  *     where a forced broadcast would OOM the executors.
  *   - Filters are plain column predicates → Catalyst pushes them into
  *     the parquet scan (`PushedFilters`), prunes columns (`ReadSchema`).
  *
  * Determinism note: double sums are order-dependent, so a Spark sum and
  * a DuckDB sum can differ in the last ulp — fatal for the driver's
  * hash compare. All money aggregates therefore run in DECIMAL (exact,
  * associative) and only the final value is cast back to double. The
  * two-decimal inputs are exactly representable in DECIMAL(18,2), so
  * both engines produce bit-identical results with no rounding.
  */
object Relational {

  import Exact.{dec, dsum, revenue}

  /** Q1-style pricing summary: full-scan hash agg on two low-cardinality
    * keys. At scale: partial aggregation makes the shuffle 6 rows/partition.
    */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        revenue($"l_extendedprice", $"l_discount").as("sum_disc_price"),
        (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
        (dsum($"l_extendedprice") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Q6-style forecast revenue: pure scan + conjunctive filter + global agg.
    * All predicates push down to parquet; single-row result.
    */
  def q06ForecastRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
              $"l_discount".between(0.05, 0.07) &&
              $"l_quantity" < 24)
      .agg(sum($"l_extendedprice".cast(dec) * $"l_discount".cast(dec))
        .cast("double").as("revenue"))
  }

  val q06Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Q3-style shipping priority: broadcast the filtered customer dim into
    * the orders join (1.5k rows at sf0.01; AQE broadcasts it while the
    * segment-filtered set fits and shuffles it when it doesn't — no
    * forced hint, since customer scales with SF); orders⋈lineitem stays
    * a shuffled hash join on the fact keys. Top-10 with a unique tie-break
    * key and exact decimal revenue so the LIMIT is deterministic.
    */
  def q03ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" < lit("1996-07-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderpriority")
    val li = Tables.lineitem(s, dir)
      .filter($"l_shipdate" > lit("1996-07-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderpriority")
      .agg(revenue($"l_extendedprice", $"l_discount").as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  val q03Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND l_shipdate > TIMESTAMP '1996-07-01'
      |GROUP BY o_orderkey, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** Q4-style order priority: EXISTS rewritten as a left-semi join with a
    * non-equi residual (l_shipdate > o_orderdate). The semi join keeps the
    * probe output at one row per order — no fact-fact row explosion.
    */
  def q04OrderPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1996-07-01").cast("timestamp"))
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
    ord.join(li, $"o_orderkey" === $"l_orderkey" && $"l_shipdate" > $"o_orderdate",
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  val q04Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  /** Q5-style local supplier volume: five-way join. All dims
    * (region→nation→{customer,supplier}) collapse to broadcastable maps;
    * the only shuffles are the orders⋈lineitem fact join and the final
    * 25-row aggregation.
    */
  def q05LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nat = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(s, dir).join(broadcast(nat),
      $"c_nationkey" === $"n_nationkey").select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(supp, $"l_suppkey" === $"s_suppkey" &&
        $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(revenue($"l_extendedprice", $"l_discount").as("revenue"))
  }

  val q05Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name""".stripMargin

  /** Q10-style returned items: top-20 customers by lost revenue. Raw
    * c_acctbal passes through untouched (no arithmetic → bit-identical).
    */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1996-04-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(s, dir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val nat = Tables.nation(s, dir).select("n_nationkey", "n_name")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(revenue($"l_extendedprice", $"l_discount").as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Window function: top-3 orders per customer by total price.
    * One hash shuffle on o_custkey, then an in-partition sort — the
    * window never materializes more than a partition at a time.
    */
  def qWindowTopOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
  }

  val qWindowSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders)
      |WHERE rn <= 3""".stripMargin

  /** Exact distinct counts — the shuffle dedups per-key before the final
    * count (Spark expands distinct aggs into a two-phase plan).
    */
  def qDistinctCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir).agg(
      countDistinct($"l_partkey").as("distinct_parts"),
      countDistinct($"l_suppkey").as("distinct_supps"),
      countDistinct($"l_orderkey").as("distinct_orders"))
  }

  val qDistinctSql: String =
    """SELECT count(DISTINCT l_partkey) AS distinct_parts,
      |  count(DISTINCT l_suppkey) AS distinct_supps,
      |  count(DISTINCT l_orderkey) AS distinct_orders
      |FROM lineitem""".stripMargin

  /** Set op: customers that never placed an order (EXCEPT ≡ left-anti). */
  def qCustomersNoOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir).select($"c_custkey")
      .except(Tables.orders(s, dir).select($"o_custkey".as("c_custkey")))
  }

  val qCustomersNoOrdersSql: String =
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders""".stripMargin

  /** ROLLUP: hierarchical totals over status × priority (grouping-set
    * expansion happens before the shuffle, so it is still one pass).
    */
  def qRollupOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("sum_price"))
  }

  val qRollupSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  /** Per-nation account-balance profile with a HAVING filter. */
  def qNationAcctbal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_cust"),
        (dsum($"c_acctbal") / count(lit(1))).as("avg_bal"))
      .filter($"n_cust" >= 10)
  }

  val qNationAcctbalSql: String =
    """SELECT r_name, n_name, count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |HAVING count(*) >= 10""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q03_shipping_priority" -> (q03ShippingPriority _),
    "q04_order_priority" -> (q04OrderPriority _),
    "q05_local_supplier" -> (q05LocalSupplier _),
    "q06_forecast_revenue" -> (q06ForecastRevenue _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q_window_top_orders" -> (qWindowTopOrders _),
    "q_distinct_counts" -> (qDistinctCounts _),
    "q_customers_no_orders" -> (qCustomersNoOrders _),
    "q_rollup_orders" -> (qRollupOrders _),
    "q_nation_acctbal" -> (qNationAcctbal _))

  def oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q03_shipping_priority" -> q03Sql,
    "q04_order_priority" -> q04Sql,
    "q05_local_supplier" -> q05Sql,
    "q06_forecast_revenue" -> q06Sql,
    "q10_returned_items" -> q10Sql,
    "q_window_top_orders" -> qWindowSql,
    "q_distinct_counts" -> qDistinctSql,
    "q_customers_no_orders" -> qCustomersNoOrdersSql,
    "q_rollup_orders" -> qRollupSql,
    "q_nation_acctbal" -> qNationAcctbalSql)
}
