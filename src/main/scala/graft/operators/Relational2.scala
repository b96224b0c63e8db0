package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Second breadth tranche: outer joins, CUBE, PIVOT, percentiles,
  * string/date scalar functions, set ops, correlated aggregates —
  * rounding out the relational algebra a reference user would expect
  * from a general query surface (SURVEY.md §2 maps them all onto Spark
  * built-ins; nothing here needs custom Catalyst nodes).
  */
object Relational2 {

  import Exact.dec

  /** Q13-style customer order-count distribution: LEFT OUTER join keeps
    * zero-order customers, then a second aggregation over the counts.
    * Two shuffles total; the second input is already tiny.
    */
  def q13CustDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir).select("c_custkey")
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  val q13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |      GROUP BY c_custkey)
      |GROUP BY c_count""".stripMargin

  /** CUBE over return flag × line status (all 4 grouping sets). */
  def qCubeFlags(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast(dec)).cast("double").as("sum_qty"))
  }

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** PIVOT: daily event counts spread into one column per event type
    * (fixed value list ⇒ stable schema; missing cells filled with 0 to
    * match the oracle's FILTER counts).
    */
  def qPivotEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"),
        $"event_type")
      .groupBy($"day")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
  }

  val qPivotSql: String =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'view') AS view,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'error') AS error
      |FROM events GROUP BY 1""".stripMargin

  /** Correlated aggregate: orders strictly above their customer's own
    * average order value (decimal-exact average, both engines).
    */
  def qAboveAvgOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val avgByCust = o.groupBy($"o_custkey".as("ck"))
      .agg((sum($"o_totalprice".cast(dec)).cast("double") / count(lit(1)))
        .as("avg_price"))
    o.join(avgByCust, $"o_custkey" === $"ck")
      .where($"o_totalprice" > $"avg_price")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_above"))
  }

  val qAboveAvgSql: String =
    """SELECT o_custkey, count(*) AS n_above
      |FROM orders o
      |JOIN (SELECT o_custkey AS ck,
      |        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
      |      FROM orders GROUP BY 1) a ON o.o_custkey = a.ck
      |WHERE o.o_totalprice > a.avg_price
      |GROUP BY o_custkey""".stripMargin

  /** Scalar string-function surface: case, substring, concat, padding,
    * trim, replace, length — all codegen'd built-ins, no UDFs.
    */
  def qStringFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .where($"c_custkey" <= 100)
      .select($"c_custkey",
        upper($"c_name").as("uname"),
        substring($"c_name", 1, 8).as("prefix"),
        concat($"c_mktsegment", lit(":"), $"c_name").as("tagged"),
        lpad($"c_custkey".cast("string"), 8, "0").as("padded"),
        regexp_replace($"c_name", "[0-9]", "#").as("masked"),
        length($"c_name").as("name_len"))
  }

  val qStringFuncsSql: String =
    """SELECT c_custkey, upper(c_name) AS uname, substring(c_name, 1, 8) AS prefix,
      |  c_mktsegment || ':' || c_name AS tagged,
      |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
      |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
      |  length(c_name) AS name_len
      |FROM customer WHERE c_custkey <= 100""".stripMargin

  /** Date-part extraction + conditional aggregation per year/quarter. */
  def qDateFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(year($"o_orderdate").as("yr"), quarter($"o_orderdate").as("qtr"))
      .agg(count(lit(1)).as("n_orders"),
        count(when($"o_orderpriority" === "1-URGENT", 1)).as("n_urgent"))
  }

  val qDateFuncsSql: String =
    """SELECT CAST(extract(year FROM o_orderdate) AS INT) AS yr,
      |  CAST(extract(quarter FROM o_orderdate) AS INT) AS qtr,
      |  count(*) AS n_orders,
      |  count(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent
      |FROM orders GROUP BY 1, 2""".stripMargin

  /** UNION ALL with provenance tag (D1 union surface): urgent vs low
    * priority order volumes by status.
    */
  def qUnionAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val hi = o.where($"o_orderpriority" === "1-URGENT")
      .select($"o_orderstatus", lit("hi").as("bucket"))
    val lo = o.where($"o_orderpriority" === "5-LOW")
      .select($"o_orderstatus", lit("lo").as("bucket"))
    hi.unionAll(lo).groupBy($"o_orderstatus", $"bucket")
      .agg(count(lit(1)).as("n"))
  }

  val qUnionAllSql: String =
    """SELECT o_orderstatus, bucket, count(*) AS n FROM (
      |  SELECT o_orderstatus, 'hi' AS bucket FROM orders WHERE o_orderpriority = '1-URGENT'
      |  UNION ALL
      |  SELECT o_orderstatus, 'lo' AS bucket FROM orders WHERE o_orderpriority = '5-LOW')
      |GROUP BY 1, 2""".stripMargin

  /** INTERSECT: building-segment customers that also have ≥1 urgent order. */
  def qIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val building = Tables.customer(s, dir)
      .where($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val urgent = Tables.orders(s, dir)
      .where($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("c_custkey"))
    building.intersect(urgent)
  }

  val qIntersectSql: String =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin

  /** Statistical aggregates: stddev/variance (sample), min/max. Computed
    * from decimal-exact power sums on both sides so the doubles agree:
    * var = (Σx² − (Σx)²/n) / (n−1) evaluated in the same order.
    */
  def qStatsAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum($"l_quantity".cast(dec)).cast("double").as("sx"),
        sum(($"l_quantity".cast(dec) * $"l_quantity".cast(dec))).cast("double").as("sxx"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"))
      .select($"l_returnflag", $"n", $"min_qty", $"max_qty",
        (($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - lit(1))).as("var_qty"))
  }

  val qStatsAggSql: String =
    """SELECT l_returnflag, n, min_qty, max_qty,
      |  (sxx - sx * sx / n) / (n - 1) AS var_qty
      |FROM (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
      |    min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
      |  FROM lineitem GROUP BY l_returnflag)""".stripMargin

  /** Exact percentiles per status — Spark's `percentile` and DuckDB's
    * `quantile_cont` share the p·(n−1) linear-interpolation definition
    * and agree bit-for-bit (verified before registering).
    */
  def qPercentiles(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(expr("percentile(o_totalprice, 0.5)").as("med_price"),
        expr("percentile(o_totalprice, 0.9)").as("p90_price"),
        count(lit(1)).as("n"))
  }

  val qPercentilesSql: String =
    """SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS med_price,
      |  quantile_cont(o_totalprice, 0.9) AS p90_price, count(*) AS n
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** Pearson correlation of quantity vs extended price per return flag,
    * computed from decimal-exact power sums (both engines' native corr()
    * use different single-pass algorithms → ulp divergence; the explicit
    * formula over exact sums is bit-identical).
    */
  def qCorrelation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum($"l_quantity".cast(dec)).cast("double").as("sx"),
        sum($"l_extendedprice".cast(dec)).cast("double").as("sy"),
        sum(($"l_quantity".cast(dec) * $"l_quantity".cast(dec))).cast("double").as("sxx"),
        sum(($"l_extendedprice".cast(dec) * $"l_extendedprice".cast(dec))).cast("double").as("syy"),
        sum(($"l_quantity".cast(dec) * $"l_extendedprice".cast(dec))).cast("double").as("sxy"))
      .select($"l_returnflag", $"n",
        // rounded to 6 dp: decimals whose unscaled digits exceed 2^53
        // (syy here) double-round in DuckDB's decimal→double cast, a
        // 1-ulp divergence that the cancellation in n·sxy−sx·sy
        // amplifies; corr ∈ [-1,1] so 6 dp is far above ulp noise
        round((($"n" * $"sxy" - $"sx" * $"sy") /
          (sqrt($"n" * $"sxx" - $"sx" * $"sx") *
           sqrt($"n" * $"syy" - $"sy" * $"sy"))), 6).as("corr_qty_price"))
  }

  val qCorrelationSql: String =
    """SELECT l_returnflag, n,
      |  round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
      |    AS corr_qty_price
      |FROM (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)""".stripMargin

  /** Pure-SQL entry path: temp views + `spark.sql` text, the same
    * engine surface a BI tool or notebook user drives. The statement
    * also exercises the registered custom function.
    */
  def qSqlEntry(s: SparkSession, dir: String): DataFrame = {
    graft.functions.FnvHash64.register(s) // SQL-registered functions available
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    Tables.nation(s, dir).createOrReplaceTempView("nation_v")
    s.sql(
      """SELECT n_name,
        |  count(*) AS n_cust,
        |  count(DISTINCT pmod(c_custkey, 16)) AS key_buckets
        |FROM customer_v JOIN nation_v ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
  }

  val qSqlEntrySql: String =
    """SELECT n_name, count(*) AS n_cust,
      |  count(DISTINCT c_custkey % 16) AS key_buckets
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Full analytic ranking-function family over one window: rank,
    * dense_rank, percent_rank, cume_dist, ntile(4) per nation by
    * account balance. The order key is made total (acctbal desc,
    * custkey) so every function is deterministic; percent_rank and
    * cume_dist are exact small-integer ratios, bit-identical across
    * engines without rounding.
    */
  def qRankFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    Tables.customer(s, dir)
      .select($"c_custkey", $"c_nationkey",
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"),
        ntile(4).over(w).as("quartile"))
  }

  val qRankFuncsSql: String =
    """SELECT c_custkey, c_nationkey,
      |  CAST(rank() OVER w AS BIGINT) AS rnk,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |  percent_rank() OVER w AS prnk,
      |  cume_dist() OVER w AS cdist,
      |  CAST(ntile(4) OVER w AS INT) AS quartile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey
      |             ORDER BY c_acctbal DESC, c_custkey)""".stripMargin

  /** Null-semantics surface: three-valued logic made explicit —
    * COALESCE over an outer-join null, null-safe equality (Spark `<=>`
    * ≡ SQL IS NOT DISTINCT FROM), NULLIF. Customers who never ordered
    * produce the nulls.
    */
  def qNullSemantics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perCust = Tables.orders(s, dir)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
    Tables.customer(s, dir)
      .join(perCust, $"c_custkey" === $"o_custkey", "left_outer")
      .select($"c_custkey",
        coalesce($"n", lit(0L)).as("n_orders"),
        ($"n" <=> lit(null).cast("long")).as("never_ordered"),
        nullif($"c_mktsegment", lit("BUILDING")).as("seg_nb"))
  }

  val qNullSemanticsSql: String =
    """SELECT c_custkey,
      |  CAST(coalesce(n, 0) AS BIGINT) AS n_orders,
      |  (n IS NOT DISTINCT FROM NULL) AS never_ordered,
      |  nullif(c_mktsegment, 'BUILDING') AS seg_nb
      |FROM customer
      |LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) o
      |  ON c_custkey = o_custkey""".stripMargin

  /** Explicit GROUPING SETS with grouping() disambiguation — the
    * generalization rollup/cube specialize (both already covered); runs
    * through the SQL entry path.
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(
      """SELECT coalesce(o_orderpriority, 'ALL') AS pri,
        |  coalesce(o_orderstatus, 'ALL') AS st,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_pri,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_st,
        |  count(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT coalesce(o_orderpriority, 'ALL') AS pri,
      |  coalesce(o_orderstatus, 'ALL') AS st,
      |  CAST(grouping(o_orderpriority) AS INT) AS g_pri,
      |  CAST(grouping(o_orderstatus) AS INT) AS g_st,
      |  count(*) AS cnt
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin

  /** Multiset difference (EXCEPT ALL — duplicate-preserving, unlike the
    * set-semantics anti join): priorities of high-value orders minus one
    * occurrence per BUILDING-segment order, then counted.
    */
  def qExceptAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val high = Tables.orders(s, dir)
      .where($"o_totalprice" > 150000.0)
      .select($"o_orderpriority")
    val building = Tables.orders(s, dir)
      .join(Tables.customer(s, dir).where($"c_mktsegment" === "BUILDING")
        .select("c_custkey"), $"o_custkey" === $"c_custkey")
      .select($"o_orderpriority")
    high.exceptAll(building)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
  }

  val qExceptAllSql: String =
    """SELECT o_orderpriority, count(*) AS cnt FROM (
      |  SELECT o_orderpriority FROM orders WHERE o_totalprice > 150000.0
      |  EXCEPT ALL
      |  SELECT o_orderpriority FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment = 'BUILDING')
      |GROUP BY o_orderpriority""".stripMargin

  /** Value-position window functions (first/last/nth/lead/lag) over each
    * customer's order timeline — total-ordered by (date, key) so every
    * value is deterministic; prices pass through untouched (bit-exact).
    */
  def qValueWindowFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey",
        first($"o_totalprice").over(wf).as("first_price"),
        last($"o_totalprice").over(wf).as("last_price"),
        nth_value($"o_totalprice", 2).over(wf).as("second_price"),
        lead($"o_orderkey", 1).over(w).as("next_order"),
        lag($"o_orderkey", 1).over(w).as("prev_order"))
  }

  val qValueWindowFuncsSql: String =
    """SELECT o_orderkey, o_custkey,
      |  first_value(o_totalprice) OVER wf AS first_price,
      |  last_value(o_totalprice) OVER wf AS last_price,
      |  nth_value(o_totalprice, 2) OVER wf AS second_price,
      |  lead(o_orderkey, 1) OVER w AS next_order,
      |  lag(o_orderkey, 1) OVER w AS prev_order
      |FROM orders
      |WINDOW
      |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_except_all" -> (qExceptAll _),
    "q_value_window_funcs" -> (qValueWindowFuncs _),
    "q_null_semantics" -> (qNullSemantics _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_rank_funcs" -> (qRankFuncs _),
    "q_sql_entry" -> (qSqlEntry _),
    "q_percentiles" -> (qPercentiles _),
    "q_correlation" -> (qCorrelation _),
    "q13_custdist" -> (q13CustDist _),
    "q_cube_flags" -> (qCubeFlags _),
    "q_pivot_events" -> (qPivotEvents _),
    "q_above_avg_orders" -> (qAboveAvgOrders _),
    "q_string_funcs" -> (qStringFuncs _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_union_all" -> (qUnionAll _),
    "q_intersect" -> (qIntersect _),
    "q_stats_agg" -> (qStatsAgg _))

  def oracles: Map[String, String] = Map(
    "q_except_all" -> qExceptAllSql,
    "q_value_window_funcs" -> qValueWindowFuncsSql,
    "q_null_semantics" -> qNullSemanticsSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_rank_funcs" -> qRankFuncsSql,
    "q_sql_entry" -> qSqlEntrySql,
    "q_percentiles" -> qPercentilesSql,
    "q_correlation" -> qCorrelationSql,
    "q13_custdist" -> q13Sql,
    "q_cube_flags" -> qCubeSql,
    "q_pivot_events" -> qPivotSql,
    "q_above_avg_orders" -> qAboveAvgSql,
    "q_string_funcs" -> qStringFuncsSql,
    "q_date_funcs" -> qDateFuncsSql,
    "q_union_all" -> qUnionAllSql,
    "q_intersect" -> qIntersectSql,
    "q_stats_agg" -> qStatsAggSql)
}
