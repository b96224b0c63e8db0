package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** TPC-H tail shapes (q02/q08/q12/q15/q16/q21 families), adapted to the
  * driver schema — the synthetic tables have no partsupp, shipmode, or
  * commit/receipt dates (TESTDATA.md), so each query keeps the *shape*
  * (the join/subquery/aggregation structure that matters for the
  * engine) and swaps the missing column for an available stand-in, the
  * same convention q04 established (l_shipdate > o_orderdate replacing
  * the commitdate predicate).
  *
  * Shapes covered here and nowhere else in the registry:
  *   - conditional ratio-of-sums over a 6-way join (q08)
  *   - late/priority CASE aggregation (q12)
  *   - aggregated view + scalar-max join-back (q15)
  *   - groupwise-min join-back (q02's essence minus partsupp)
  *   - count(DISTINCT) with a NOT IN exclusion subquery (q16)
  *   - EXISTS + NOT EXISTS on the same fact table (q21)
  *
  * Scale notes: every subquery decorrelates to a semi/anti/broadcast
  * join; the only fact-fact shuffles are keyed on l_orderkey/l_partkey
  * (the natural co-partition keys); scalar aggregates (max revenue)
  * broadcast as 1-row frames. Decimal-exact money math per Exact.scala.
  */
object Relational4 {

  import Exact.revenue

  /** Q8-style national market share: within ASIA-region customers buying
    * PROMO parts, the revenue share supplied from NATION_3, per order
    * year. Numerator is a CASE-guarded sum (NULL when no match — sum
    * skips nulls identically on both engines); the ratio divides the two
    * exact decimal sums only after each is cast to double, so the IEEE
    * division is bit-identical to the oracle's.
    */
  def q08MarketShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val asiaNat = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".as("asia_nationkey"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(asiaNat), $"c_nationkey" === $"asia_nationkey")
      .select("c_custkey")
    val supp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"sn_key")
      .select("s_suppkey", "supp_nation")
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val promoParts = Tables.part(s, dir).filter($"p_type" === "PROMO")
      .select("p_partkey")
    val vol = $"l_extendedprice".cast(Exact.dec) *
      (lit(1).cast(Exact.dec) - $"l_discount".cast(Exact.dec))
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(promoParts, $"l_partkey" === $"p_partkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .groupBy(year($"o_orderdate").as("o_year"))
      .agg((sum(when($"supp_nation" === "NATION_3", vol)).cast("double") /
            sum(vol).cast("double")).as("mkt_share"))
  }

  val q08Sql: String =
    """SELECT year(o_orderdate) AS o_year,
      |  CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
      |                THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
      |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |JOIN region ON cn.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY year(o_orderdate)""".stripMargin

  /** Q12-style shipping-priority split: for lineitems shipped >60 days
    * after the order date (the "late" stand-in for receipt-vs-commit),
    * count urgent/high-priority vs other orders per linestatus (the
    * shipmode stand-in). count(CASE WHEN … THEN 1 END) on both engines —
    * bigint on both, no integer-sum type skew.
    */
  def q12LatePriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1997-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linestatus", "l_shipdate")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAY"))
      .groupBy($"l_linestatus".as("ship_class"))
      .agg(
        count(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1)).as("high_line_count"),
        count(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1)).as("low_line_count"))
  }

  val q12Sql: String =
    """SELECT l_linestatus AS ship_class,
      |  count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
      |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_linestatus""".stripMargin

  /** Q15-style top supplier: revenue-per-supplier view over one quarter,
    * then the supplier(s) achieving the global max. The max is a 1-row
    * aggregate joined back by exact equality — the doubles on both sides
    * come from the same exact decimal sums, so equality is bit-safe.
    * At scale: the view is one partial+final agg keyed on l_suppkey; the
    * scalar max broadcasts.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(revenue($"l_extendedprice", $"l_discount").as("total_revenue"))
    val maxRev = rev.agg(max($"total_revenue").as("max_rev"))
    rev.join(broadcast(maxRev), $"total_revenue" === $"max_rev")
      .join(Tables.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
  }

  val q15Sql: String =
    """WITH revenue0 AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue0 ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0)""".stripMargin

  /** Q2-style groupwise-min join-back (the partsupp-free essence of
    * "minimum-cost supplier"): for each ECONOMY part in a size band, the
    * supplier(s) whose shipment hit the minimum extended price. Min is
    * exact (no arithmetic), the join-back predicate is raw-value
    * equality, and DISTINCT collapses repeat shipments at the min price.
    * At scale: part prunes early and broadcasts; the groupwise min is a
    * partial+final agg on l_partkey; no window, no global sort.
    */
  def q02MinPriceSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, dir)
      .filter($"p_type" === "ECONOMY" && $"p_size".between(10, 15))
      .select("p_partkey", "p_name")
    val li = Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
    val minp = li.groupBy($"l_partkey".as("mp_partkey"))
      .agg(min($"l_extendedprice").as("min_price"))
    li.join(minp, $"l_partkey" === $"mp_partkey" &&
        $"l_extendedprice" === $"min_price")
      .join(Tables.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
      .select($"p_partkey", $"p_name", $"s_suppkey", $"s_name", $"s_acctbal", $"min_price")
      .distinct()
  }

  val q02Sql: String =
    """WITH mp AS (
      |  SELECT l_partkey, min(l_extendedprice) AS min_price
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'ECONOMY' AND p_size BETWEEN 10 AND 15
      |  GROUP BY l_partkey)
      |SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, s_acctbal, min_price
      |FROM lineitem
      |JOIN mp ON lineitem.l_partkey = mp.l_partkey AND l_extendedprice = min_price
      |JOIN part ON lineitem.l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey""".stripMargin

  /** Q16-style supplier diversity: distinct suppliers per part
    * (brand, type, size) bucket, excluding a "complaints" supplier set
    * via NOT IN (decorrelated to a left-anti join — s_suppkey is
    * non-null so NOT IN ≡ anti join). countDistinct expands to Spark's
    * two-phase distinct-agg; the anti join broadcasts the tiny
    * exclusion list.
    */
  def q16SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val excluded = Tables.supplier(s, dir)
      .filter($"s_name".like("%7%")).select($"s_suppkey".as("x_suppkey"))
    val p = Tables.part(s, dir)
      .filter($"p_brand" =!= "Brand#45" && $"p_type" =!= "MEDIUM" &&
        $"p_size".isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(broadcast(excluded), $"l_suppkey" === $"x_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
      |  AND p_size IN (1,4,9,14,19,23,36,45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  /** Q21-style waiting suppliers: suppliers from NATION_1 who were the
    * only late shipper (>45 days after order date, the receipt/commit
    * stand-in) on a multi-supplier finalized order. The EXISTS
    * decorrelates to a left-semi join (another supplier touched the
    * order) and the NOT EXISTS to a left-anti join (no *other* supplier
    * was late) — both keyed on l_orderkey, the fact table's natural
    * partitioning, so the three passes over lineitem co-shuffle on one
    * key. Top-20 with a name tie-break for a deterministic LIMIT.
    */
  def q21WaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ordF = Tables.orders(s, dir).filter($"o_orderstatus" === "F")
      .select("o_orderkey", "o_orderdate")
    val late = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(ordF, $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 45 DAY"))
      .select("l_orderkey", "l_suppkey")
    val allLi = Tables.lineitem(s, dir)
      .select($"l_orderkey".as("l2_orderkey"), $"l_suppkey".as("l2_suppkey"))
    val lateOther = late
      .select($"l_orderkey".as("l3_orderkey"), $"l_suppkey".as("l3_suppkey"))
    val natSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).filter($"n_name" === "NATION_1")),
        $"s_nationkey" === $"n_nationkey")
      .select("s_suppkey", "s_name")
    late
      .join(allLi, $"l_orderkey" === $"l2_orderkey" &&
        $"l_suppkey" =!= $"l2_suppkey", "left_semi")
      .join(lateOther, $"l_orderkey" === $"l3_orderkey" &&
        $"l_suppkey" =!= $"l3_suppkey", "left_anti")
      .join(natSupp, $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(20)
  }

  val q21Sql: String =
    """WITH late AS (
      |  SELECT l_orderkey, l_suppkey
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |    AND l_shipdate > o_orderdate + INTERVAL 45 DAY)
      |SELECT s_name, count(*) AS numwait
      |FROM late l1
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_1'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM late l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin

  /** Hierarchy rollup via a genuine RECURSIVE CTE (Spark 4's
    * `WITH RECURSIVE`, the org-chart / bill-of-materials shape): the
    * implicit forest parent(k) = k div 2 over customers, each chain
    * walked to the root accumulating integer-cent balances, tips
    * aggregated by chain length. Depth is log₂(max key) by
    * construction, so the recursion's per-level frontier join runs
    * O(log n) times — the engine-level contract (iterate-until-fixpoint
    * with a level barrier) that distinguishes this from the unrolled
    * iteration in [[Graph.pagerank]]. Balances ride as exact integer
    * cents (round(bal·100) at the leaf; both engines see identical
    * doubles, so the rounding input is identical) — no float drift
    * across recursion levels.
    */
  def qRecursiveChain(s: SparkSession, dir: String): DataFrame = {
    // the default 1M-row valve trips at the 10× replica (rows = roots ×
    // depth); recursion here is bounded by DEPTH (log₂ max key, level
    // limit stays at its default 100), so the row valve can safely
    // scale with input size
    s.conf.set("spark.sql.cteRecursionRowLimit", 1000000000)
    Tables.customer(s, dir).createOrReplaceTempView("customer_rc")
    s.sql(
      """WITH RECURSIVE chain(root, cur, depth, cents) AS (
        |  SELECT c_custkey, c_custkey, 0,
        |    CAST(round(c_acctbal * 100, 0) AS BIGINT)
        |  FROM customer_rc
        |  UNION ALL
        |  SELECT ch.root, c.c_custkey, ch.depth + 1,
        |    ch.cents + CAST(round(c.c_acctbal * 100, 0) AS BIGINT)
        |  FROM chain ch JOIN customer_rc c ON c.c_custkey = ch.cur div 2
        |  WHERE ch.cur > 0),
        |tips AS (
        |  SELECT root, max(depth) AS chain_len,
        |    max_by(cents, depth) AS chain_cents
        |  FROM chain GROUP BY root)
        |SELECT chain_len, count(*) AS n_chains,
        |  sum(chain_cents) AS sum_cents
        |FROM tips GROUP BY chain_len""".stripMargin)
  }

  val qRecursiveChainSql: String =
    """WITH RECURSIVE chain(root, cur, depth, cents) AS (
      |  SELECT c_custkey, c_custkey, 0,
      |    CAST(round(c_acctbal * 100, 0) AS BIGINT)
      |  FROM customer
      |  UNION ALL
      |  SELECT ch.root, c.c_custkey, ch.depth + 1,
      |    ch.cents + CAST(round(c.c_acctbal * 100, 0) AS BIGINT)
      |  FROM chain ch JOIN customer c ON c.c_custkey = ch.cur // 2
      |  WHERE ch.cur > 0),
      |tips AS (
      |  SELECT root, max(depth) AS chain_len,
      |    max_by(cents, depth) AS chain_cents
      |  FROM chain GROUP BY root)
      |SELECT CAST(chain_len AS INT) AS chain_len,
      |  count(*) AS n_chains,
      |  CAST(sum(chain_cents) AS BIGINT) AS sum_cents
      |FROM tips GROUP BY chain_len""".stripMargin

  /** Spearman rank correlation of part size vs retail price WITHIN each
    * brand — the rank-based (outlier-robust) dependence statistic, and
    * the reason it is scale-clean: ranks are computed inside the brand
    * partition (a partitioned window, one shuffle on p_brand), never a
    * global sort. Average ranks for ties are kept exact by doubling:
    * 2·avgrank = 2·rank + ties − 1 stays integer, so all six Pearson
    * sufficient statistics over the doubled ranks are exact longs; the
    * only doubles are the two sqrt's and one division at the end
    * (identical expression order on both engines, round 6; degenerate
    * constant columns → NULL via the same CASE).
    */
  def qSpearman(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val byBrand = Window.partitionBy($"p_brand")
    val ranked = Tables.part(s, dir)
      .select($"p_brand", $"p_size", $"p_retailprice")
      .withColumn("rx", rank().over(byBrand.orderBy($"p_size")))
      .withColumn("tx", count(lit(1)).over(Window.partitionBy($"p_brand", $"p_size")))
      .withColumn("ry", rank().over(byBrand.orderBy($"p_retailprice")))
      .withColumn("ty", count(lit(1)).over(Window.partitionBy($"p_brand", $"p_retailprice")))
      .select($"p_brand",
        (lit(2L) * $"rx" + $"tx" - 1L).as("x"),
        (lit(2L) * $"ry" + $"ty" - 1L).as("y"))
    ranked.groupBy($"p_brand")
      .agg(count(lit(1)).as("n_parts"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
        sum($"x" * $"y").as("sxy"))
      .selectExpr("p_brand", "n_parts",
        """round(CASE WHEN n_parts * sxx - sx * sx = 0
          |         OR n_parts * syy - sy * sy = 0 THEN NULL
          |  ELSE CAST(n_parts * sxy - sx * sy AS DOUBLE)
          |    / (sqrt(CAST(n_parts * sxx - sx * sx AS DOUBLE))
          |       * sqrt(CAST(n_parts * syy - sy * sy AS DOUBLE)))
          |  END, 6) AS rho""".stripMargin)
  }

  val qSpearmanSql: String =
    """WITH ranked AS (
      |  SELECT p_brand,
      |    2 * rank() OVER (PARTITION BY p_brand ORDER BY p_size)
      |      + count(*) OVER (PARTITION BY p_brand, p_size) - 1 AS x,
      |    2 * rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice)
      |      + count(*) OVER (PARTITION BY p_brand, p_retailprice) - 1 AS y
      |  FROM part),
      |sums AS (
      |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM ranked GROUP BY p_brand)
      |SELECT p_brand, n_parts,
      |  round(CASE WHEN n_parts * sxx - sx * sx = 0
      |           OR n_parts * syy - sy * sy = 0 THEN NULL
      |    ELSE CAST(n_parts * sxy - sx * sy AS DOUBLE)
      |      / (sqrt(CAST(n_parts * sxx - sx * sx AS DOUBLE))
      |         * sqrt(CAST(n_parts * syy - sy * sy AS DOUBLE)))
      |    END, 6) AS rho
      |FROM sums""".stripMargin

  /** Correlated LATERAL subquery — per-nation top-2 customers by
    * balance, written as the dependent-join SQL surface. The interest
    * is the DECORRELATION: Spark compiles the per-row ORDER BY/LIMIT
    * subquery into `WindowGroupLimit` (partial before the exchange,
    * final after — each map task forwards ≤2 rows per nation) + one
    * broadcast hash join, i.e. exactly the window-top-k plan a user
    * would hand-write, not a nested loop. DuckDB executes the same
    * LATERAL text natively as the oracle. Raw column values only — no
    * arithmetic to drift.
    */
  def qLateralTopk(s: SparkSession, dir: String): DataFrame = {
    Tables.nation(s, dir).createOrReplaceTempView("nation_lt")
    Tables.customer(s, dir).createOrReplaceTempView("customer_lt")
    s.sql(
      """SELECT n.n_name, t.c_name, t.c_acctbal
        |FROM nation_lt n, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer_lt c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t""".stripMargin)
  }

  val qLateralTopkSql: String =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t""".stripMargin

  /** 2-D skyline (Pareto frontier): parts not dominated on
    * (maximize p_size, minimize p_retailprice). The naive formulation
    * is an O(n²) self-anti-join; the 2-D case collapses to one sort:
    * per size group take the min price, scan size groups in descending
    * order carrying the strict running min of price — a point survives
    * iff it holds its size group's min AND beats every larger size's
    * min. One size-keyed aggregate + one |distinct sizes|-row window +
    * one join back: O(n log n), no pair enumeration. The oracle states
    * the DECLARATIVE semantics (NOT EXISTS a dominator with ≥ size,
    * ≤ price, strict in one) — two independent formulations meeting on
    * the same rows is the point of the check.
    */
  def qSkylineParts(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val parts = Tables.part(s, dir)
      .select($"p_partkey", $"p_size", $"p_retailprice")
    val bySize = parts.groupBy($"p_size")
      .agg(min($"p_retailprice").as("grp_min"))
    // strict running min over LARGER sizes only (rows preceding in the
    // size-desc order, excluding the current group)
    val desc = Window.orderBy($"p_size".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = bySize
      .withColumn("larger_min", min($"grp_min").over(desc))
      .where($"larger_min".isNull || $"grp_min" < $"larger_min")
      .select($"p_size", $"grp_min")
    parts.join(frontier, "p_size")
      .where($"p_retailprice" === $"grp_min")
      .select($"p_partkey", $"p_size", $"p_retailprice")
  }

  val qSkylinePartsSql: String =
    """SELECT p_partkey, p_size, p_retailprice
      |FROM part p1
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part p2
      |  WHERE p2.p_size >= p1.p_size
      |    AND p2.p_retailprice <= p1.p_retailprice
      |    AND (p2.p_size > p1.p_size
      |         OR p2.p_retailprice < p1.p_retailprice))""".stripMargin

  /** Exact weighted median — the weighted order statistic
    * (q_percentiles covers the unweighted family): the smallest retail
    * price whose cumulative size-weight reaches half the total. Stated
    * identically in both engines as the crossing point of an integer
    * cumulative-weight scan (cum·2 ≥ total — no division, no doubles in
    * the decision), ties broken by (price, partkey). The scan runs as
    * a [[Scans.segmentedCumSum]] over price-range shards (truncation
    * buckets are monotone in the price order and equal prices share a
    * bucket, so the segmented sum is the exact global one) — no
    * single-partition window touches the raw table; the even-cheaper
    * approximate alternative at extreme scale is the two-phase
    * histogram-locate trick of `sketch_hist_quantiles`.
    */
  def qWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.part(s, dir)
      .select($"p_partkey", $"p_retailprice", $"p_size".cast("long").as("wt"))
    val cum = Scans.segmentedCumSum(
      Scans.shardByRange(base, $"p_retailprice"),
      "__shard", Seq($"p_retailprice", $"p_partkey"), Seq(($"wt", "cum")))
      .drop("__shard")
    val tot = cum.agg(max($"cum").as("total"))
    cum.crossJoin(broadcast(tot))
      .where($"cum" * 2 >= $"total")
      .orderBy($"p_retailprice", $"p_partkey")
      .limit(1)
      .select($"total".as("total_weight"),
        $"p_retailprice".as("weighted_median_price"))
  }

  val qWeightedMedianSql: String =
    """WITH cum AS (
      |  SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS wt,
      |    CAST(sum(CAST(p_size AS BIGINT)) OVER (
      |      ORDER BY p_retailprice, p_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM part),
      |tot AS (SELECT max(cum) AS total FROM cum)
      |SELECT CAST(total AS BIGINT) AS total_weight,
      |  p_retailprice AS weighted_median_price
      |FROM cum CROSS JOIN tot
      |WHERE cum * 2 >= total
      |ORDER BY p_retailprice, p_partkey
      |LIMIT 1""".stripMargin

  /** Q11-style important stock: per-part supplied value from one
    * region's suppliers, kept when it exceeds a fixed fraction of the
    * region's total — TPC-H q11's HAVING-against-scalar-subquery shape
    * with (l_partkey, l_suppkey) lineitem aggregates standing in for
    * the absent partsupp table (module convention, header). The filter
    * is region-level, not nation-level: at sf0.001 the 10-supplier
    * table may have zero rows for any single nation, and a correctness
    * query that can go empty at a driver SF checks nothing. Value sums
    * are decimal-exact; the one double comparison multiplies the same
    * two doubles in the same order on both engines. The per-part
    * aggregate shuffles once on l_partkey; suppliers and the 1-row
    * total broadcast.
    */
  def q11ImportantStock(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val asiaNat = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey")
    val asiaSupp = Tables.supplier(s, dir)
      .join(broadcast(asiaNat), $"s_nationkey" === $"n_nationkey")
      .select("s_suppkey")
    val value = $"l_extendedprice".cast(Exact.dec) *
      (lit(1).cast(Exact.dec) - $"l_discount".cast(Exact.dec))
    val ps = Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(asiaSupp), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey".as("ps_partkey"))
      .agg(sum(value).as("value_dec"))
    val thr = ps.agg((sum($"value_dec").cast("double") * lit(0.001))
      .as("threshold"))
    ps.crossJoin(broadcast(thr))
      .where($"value_dec".cast("double") > $"threshold")
      .select($"ps_partkey", $"value_dec".cast("double").as("value"))
  }

  val q11Sql: String =
    """WITH ps AS (
      |  SELECT l_partkey AS ps_partkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS value_dec
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA'
      |  GROUP BY 1)
      |SELECT ps_partkey, CAST(value_dec AS DOUBLE) AS value
      |FROM ps
      |WHERE CAST(value_dec AS DOUBLE) >
      |  (SELECT CAST(sum(value_dec) AS DOUBLE) * 0.001 FROM ps)""".stripMargin

  /** Q20-style potential promotion: suppliers who supplied more than
    * half of some PROMO part's 1996 volume — TPC-H q20's nested
    * IN-subquery chain decorrelated to two stacked aggregates and a
    * join-back. The majority test is `sq * 2 > tq` on exact decimals
    * (no division, no doubles anywhere in the decision — the weighted-
    * median convention). Both aggregates share the l_partkey shuffle
    * key (partial agg on (part, supp) feeds the per-part total without
    * a second scan); the supplier name join broadcasts. No nation
    * filter: the qualifying-supplier set at sf0.001 is 10 rows and a
    * nation cut could legitimately empty it (q11 note).
    */
  def q20PotentialPromotion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val promo = Tables.part(s, dir).filter($"p_type" === "PROMO")
      .select("p_partkey")
    val agg = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1997-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(broadcast(promo), $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity".cast(Exact.dec)).as("sq"))
    val tot = agg.groupBy($"l_partkey").agg(sum($"sq").as("tq"))
    agg.join(tot, "l_partkey")
      .where($"sq" * 2 > $"tq")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_parts"))
      .join(broadcast(Tables.supplier(s, dir)
        .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"n_parts")
  }

  val q20Sql: String =
    """WITH agg AS (
      |  SELECT l_partkey, l_suppkey,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'PROMO'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1, 2),
      |tot AS (SELECT l_partkey, sum(sq) AS tq FROM agg GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_parts
      |FROM agg
      |JOIN tot USING (l_partkey)
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE sq * 2 > tq
      |GROUP BY 1, 2""".stripMargin

  /** Relational division (set containment): customers who placed
    * orders in EVERY order-priority class — the "for all" quantifier,
    * the one classic join geometry the breadth list still lacked.
    * Rewritten as count-distinct equality against the 1-row universe
    * count (the standard decorrelation: division = |distinct classes
    * per customer| = |classes|), so the plan is two hash aggregates and
    * a broadcast of one row — no double-anti-join nesting. Output also
    * carries each qualifying customer's order count — raw columns
    * only, nothing to drift.
    */
  def qRelationalDivision(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, dir).select($"o_custkey", $"o_orderpriority")
    val universe = ord.select($"o_orderpriority").distinct()
      .agg(count(lit(1)).as("n_classes"))
    ord.groupBy($"o_custkey")
      .agg(countDistinct($"o_orderpriority").as("n_cust_classes"),
        count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(universe))
      .where($"n_cust_classes" === $"n_classes")
      .select($"o_custkey", $"n_orders")
  }

  val qRelationalDivisionSql: String =
    """WITH u AS (
      |  SELECT count(DISTINCT o_orderpriority) AS n_classes FROM orders)
      |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      |FROM orders CROSS JOIN u
      |GROUP BY o_custkey, n_classes
      |HAVING count(DISTINCT o_orderpriority) = n_classes""".stripMargin

  /** RFM customer segmentation — recency / frequency / monetary
    * quintile scores, the classical marketing-analytics cut of an
    * orders fact. Each metric needs the customer's EXACT global rank;
    * the naive `ntile(5)` is an unpartitioned window (one sort
    * partition — a non-starter at scale), so ranks are built with the
    * two-phase histogram-shard technique promoted from
    * `sketch_hist_quantiles`: shard customers by a VALUE-bounded bucket
    * (recency in days and order count are naturally discrete; monetary
    * shards on fixed 10k-wide price bands), take per-bucket counts (a
    * tiny value-bounded frame whose prefix sum is the below-bucket
    * offset), and rank inside each bucket with a PARTITIONED
    * row_number — rank = offset + intra-bucket position, exact and
    * deterministic under the (value, custkey) total order. Quintile
    * arithmetic stays in integers ((rank−1)·5 div n); recency is
    * reverse-scored (recent = 5). Money stays decimal-exact until the
    * two output casts (Exact convention).
    */
  /** Exact global (or per-group) rank WITHOUT an unpartitioned sort —
    * the two-phase histogram-shard rank shared by [[qRfmSegments]] and
    * [[qRobustStats]]: per-(group, bucket) counts (a tiny value-bounded
    * frame), prefix-summed per group into below-bucket offsets, plus an
    * intra-bucket row_number PARTITIONED by (group, bucket). Requires a
    * VALUE-bounded bucket column; rank = offset + intra-bucket
    * position is exact under the caller's total order.
    */
  private[operators] def shardRank(df: DataFrame, groups: Seq[String],
      bucket: String, ord: Seq[org.apache.spark.sql.Column],
      out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gc = groups.map(col)
    val off = df.groupBy((gc :+ col(bucket)): _*).agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(
        sum(col("c")).over(Window.partitionBy(gc: _*).orderBy(col(bucket))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((gc :+ col(bucket) :+ col("off")): _*)
    df.join(off, groups :+ bucket)
      .withColumn(out, col("off") + row_number().over(
        Window.partitionBy((gc :+ col(bucket)): _*).orderBy(ord: _*)))
      .drop("off")
  }

  def qRfmSegments(s: SparkSession, dir: String): DataFrame =
    qRfmSegmentsOf(Tables.orders(s, dir))

  /** RFM over any orders-shaped frame — factored for planted-fixture
    * specs.
    */
  def qRfmSegmentsOf(o: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = o.sparkSession
    import s.implicits._
    val anchor = o.agg(max($"o_orderdate".cast("date")).as("anchor"))
    val cust = o.groupBy($"o_custkey")
      .agg(max($"o_orderdate".cast("date")).as("last_d"),
        count(lit(1)).as("freq"),
        sum($"o_totalprice".cast(Exact.dec)).as("mon"))
      .crossJoin(broadcast(anchor))
      .select($"o_custkey",
        datediff($"anchor", $"last_d").cast("long").as("recency"),
        $"freq", $"mon",
        expr("CAST(floor(CAST(mon AS DOUBLE) / 10000.0) AS BIGINT)").as("mb"))
      .localCheckpoint() // consumed six times below (3 histograms + 3 joins)
    val ranked = shardRank(
      shardRank(
        shardRank(cust, Nil, "recency", Seq($"o_custkey"), "r_rnk"),
        Nil, "freq", Seq($"o_custkey"), "f_rnk"),
      Nil, "mb", Seq($"mon", $"o_custkey"), "m_rnk")
    val n = cust.agg(count(lit(1)).as("n_cust"))
    ranked.crossJoin(broadcast(n))
      .selectExpr("mon",
        "5 - (r_rnk - 1) * 5 div n_cust AS r_score",
        "(f_rnk - 1) * 5 div n_cust + 1 AS f_score",
        "(m_rnk - 1) * 5 div n_cust + 1 AS m_score")
      .groupBy($"r_score", $"f_score", $"m_score")
      .agg(count(lit(1)).as("n_customers"),
        sum($"mon").cast("double").as("sum_monetary"),
        round(sum($"mon").cast("double") / count(lit(1)), 6).as("avg_monetary"))
  }

  val qRfmSegmentsSql: String =
    """WITH anchor AS (
      |  SELECT max(CAST(o_orderdate AS DATE)) AS anchor FROM orders),
      |cust AS (
      |  SELECT o_custkey,
      |    CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
      |      (SELECT anchor FROM anchor)) AS BIGINT) AS recency,
      |    CAST(count(*) AS BIGINT) AS freq,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon,
      |    CAST(floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |      / 10000.0) AS BIGINT) AS mb
      |  FROM orders GROUP BY 1),
      |roff AS (
      |  SELECT recency, CAST(coalesce(sum(c) OVER (ORDER BY recency
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      |  FROM (SELECT recency, count(*) AS c FROM cust GROUP BY 1)),
      |foff AS (
      |  SELECT freq, CAST(coalesce(sum(c) OVER (ORDER BY freq
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      |  FROM (SELECT freq, count(*) AS c FROM cust GROUP BY 1)),
      |moff AS (
      |  SELECT mb, CAST(coalesce(sum(c) OVER (ORDER BY mb
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      |  FROM (SELECT mb, count(*) AS c FROM cust GROUP BY 1)),
      |ranked AS (
      |  SELECT c.o_custkey, c.mon,
      |    r.off + row_number() OVER (PARTITION BY c.recency
      |      ORDER BY c.o_custkey) AS r_rnk,
      |    f.off + row_number() OVER (PARTITION BY c.freq
      |      ORDER BY c.o_custkey) AS f_rnk,
      |    m.off + row_number() OVER (PARTITION BY c.mb
      |      ORDER BY c.mon, c.o_custkey) AS m_rnk
      |  FROM cust c
      |  JOIN roff r ON r.recency = c.recency
      |  JOIN foff f ON f.freq = c.freq
      |  JOIN moff m ON m.mb = c.mb),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_cust FROM cust)
      |SELECT
      |  CAST(5 - (r_rnk - 1) * 5 // n_cust AS BIGINT) AS r_score,
      |  CAST((f_rnk - 1) * 5 // n_cust + 1 AS BIGINT) AS f_score,
      |  CAST((m_rnk - 1) * 5 // n_cust + 1 AS BIGINT) AS m_score,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(mon) AS DOUBLE) AS sum_monetary,
      |  round(CAST(sum(mon) AS DOUBLE) / count(*), 6) AS avg_monetary
      |FROM ranked CROSS JOIN nn
      |GROUP BY 1, 2, 3""".stripMargin

  /** Robust statistics per order priority — exact median, quartiles/
    * IQR, median absolute deviation, and a 5% trimmed mean, the
    * outlier-resistant profile of a money column ([[qWeightedMedian]]'s
    * unweighted cousins, here computed per group and WITHOUT an
    * unpartitioned sort: every rank comes from [[shardRank]] on fixed
    * 10k-wide price bands / 1k-wide deviation bands). All order
    * statistics are ACTUAL data values selected at deterministic
    * (value, orderkey) rank positions — lower-median convention,
    * q1 = rank (n+1) div 4 floored at 1, q3 = rank 3(n+1) div 4 — so
    * no interpolation arithmetic exists to reconcile across engines.
    * MAD re-ranks |v − median| (the deviation is one IEEE subtraction,
    * identical both sides); the trimmed mean drops rank ≤ n·5 div 100
    * from each tail and decimal-averages the rest (Exact convention).
    */
  def qRobustStats(s: SparkSession, dir: String): DataFrame =
    qRobustStatsOf(Tables.orders(s, dir))

  /** Robust stats over any orders-shaped frame — factored for
    * planted-fixture specs.
    */
  def qRobustStatsOf(o: DataFrame): DataFrame = {
    val s = o.sparkSession
    import s.implicits._
    val base = o
      .selectExpr("o_orderpriority AS prio", "o_orderkey",
        "o_totalprice AS v",
        "CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS vb")
    val ranked = shardRank(base, Seq("prio"), "vb",
      Seq($"v", $"o_orderkey"), "rnk")
      .localCheckpoint() // consumed by the order-stat pick AND the trimmed mean
    val counts = ranked.groupBy($"prio").agg(count(lit(1)).as("n"))
    val picks = ranked.join(counts, "prio")
      .groupBy($"prio")
      .agg(
        max(when($"rnk" === expr("(n + 1) div 2"), $"v")).as("median"),
        max(when($"rnk" === expr("greatest(1, (n + 1) div 4)"), $"v")).as("q1"),
        max(when($"rnk" === expr("(3 * (n + 1)) div 4"), $"v")).as("q3"))
    val trimmed = ranked.join(counts, "prio")
      .where($"rnk" > expr("n * 5 div 100") &&
             $"rnk" <= expr("n - n * 5 div 100"))
      .groupBy($"prio")
      .agg(round(Exact.davg($"v"), 6).as("trimmed_mean"))
    val devs = base.join(broadcast(picks.select($"prio", $"median")), "prio")
      .selectExpr("prio", "o_orderkey", "abs(v - median) AS dev",
        "CAST(floor(abs(v - median) / 1000.0) AS BIGINT) AS db")
    val mad = shardRank(devs, Seq("prio"), "db",
      Seq($"dev", $"o_orderkey"), "drnk")
      .join(counts, "prio")
      .groupBy($"prio")
      .agg(max(when($"drnk" === expr("(n + 1) div 2"), $"dev")).as("mad"))
    counts.join(picks, "prio").join(mad, "prio").join(trimmed, "prio")
      .select($"prio", $"n", $"median", $"q1", $"q3",
        ($"q3" - $"q1").as("iqr"), $"mad", $"trimmed_mean")
  }

  val qRobustStatsSql: String =
    """WITH base AS (
      |  SELECT o_orderpriority AS prio, o_orderkey, o_totalprice AS v,
      |    CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS vb
      |  FROM orders),
      |voff AS (
      |  SELECT prio, vb, CAST(coalesce(sum(c) OVER (PARTITION BY prio
      |    ORDER BY vb ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS off
      |  FROM (SELECT prio, vb, count(*) AS c FROM base GROUP BY 1, 2)),
      |ranked AS (
      |  SELECT b.prio, b.o_orderkey, b.v,
      |    o.off + row_number() OVER (PARTITION BY b.prio, b.vb
      |      ORDER BY b.v, b.o_orderkey) AS rnk
      |  FROM base b JOIN voff o ON o.prio = b.prio AND o.vb = b.vb),
      |counts AS (SELECT prio, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1),
      |picks AS (
      |  SELECT r.prio,
      |    max(CASE WHEN r.rnk = (c.n + 1) // 2 THEN r.v END) AS median,
      |    max(CASE WHEN r.rnk = greatest(1, (c.n + 1) // 4) THEN r.v END) AS q1,
      |    max(CASE WHEN r.rnk = (3 * (c.n + 1)) // 4 THEN r.v END) AS q3
      |  FROM ranked r JOIN counts c ON c.prio = r.prio GROUP BY 1),
      |trimmed AS (
      |  SELECT r.prio,
      |    round(CAST(sum(CAST(r.v AS DECIMAL(18,2))) AS DOUBLE)
      |      / count(*), 6) AS trimmed_mean
      |  FROM ranked r JOIN counts c ON c.prio = r.prio
      |  WHERE r.rnk > c.n * 5 // 100 AND r.rnk <= c.n - c.n * 5 // 100
      |  GROUP BY 1),
      |devs AS (
      |  SELECT b.prio, b.o_orderkey, abs(b.v - p.median) AS dev,
      |    CAST(floor(abs(b.v - p.median) / 1000.0) AS BIGINT) AS db
      |  FROM base b JOIN picks p ON p.prio = b.prio),
      |doff AS (
      |  SELECT prio, db, CAST(coalesce(sum(c) OVER (PARTITION BY prio
      |    ORDER BY db ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |    AS BIGINT) AS off
      |  FROM (SELECT prio, db, count(*) AS c FROM devs GROUP BY 1, 2)),
      |dranked AS (
      |  SELECT d.prio, d.dev,
      |    o.off + row_number() OVER (PARTITION BY d.prio, d.db
      |      ORDER BY d.dev, d.o_orderkey) AS drnk
      |  FROM devs d JOIN doff o ON o.prio = d.prio AND o.db = d.db),
      |mad AS (
      |  SELECT d.prio,
      |    max(CASE WHEN d.drnk = (c.n + 1) // 2 THEN d.dev END) AS mad
      |  FROM dranked d JOIN counts c ON c.prio = d.prio GROUP BY 1)
      |SELECT c.prio, c.n, p.median, p.q1, p.q3, p.q3 - p.q1 AS iqr,
      |  m.mad, t.trimmed_mean
      |FROM counts c
      |JOIN picks p ON p.prio = c.prio
      |JOIN mad m ON m.prio = c.prio
      |JOIN trimmed t ON t.prio = c.prio""".stripMargin

  /** Poisson-bootstrap confidence interval for the mean order value —
    * THE distributed bootstrap (Chamandy et al., "Estimating
    * Uncertainty for Massive Data Streams", Google 2012): classical
    * resampling needs a shared sample of size n per replicate
    * (unshardable); weighting each ROW independently with
    * Poisson(1) multiplicities is exchangeable with it at large n and
    * runs as ONE narrow ×B explode + ONE (replicate)-keyed map-side-
    * combinable aggregate. The multiplicity is the inverse-CDF walk of
    * a uniform (identical literal cut points both engines, capped at
    * 5 — P(X>5) ≈ 6e-4 at λ=1). Hashing per (row × replicate) would
    * put an md5 on every exploded row — measured 24.6 s at sf0.1,
    * 6× the next-slowest query — so each ROW draws two md5-60 seeds
    * ONCE and the per-replicate uniforms are the affine stream
    * (x1 + b·x2) mod p, p = 2³¹−1 (Lehmer-style; the bootstrap only
    * needs across-ROW independence, which the seeds provide — within-
    * row decorrelation across replicates is the affine step). After
    * the explode everything is codegen'd integer arithmetic.
    * Replicate means are exact-decimal weighted sums over exact
    * integer weight totals; the percentile CI picks ranks 3 and 98 of
    * the B=100 sorted means (deterministic (mean, replicate) order on
    * a B-row frame).
    */
  val BootB = 100

  def qBootstrapCi(s: SparkSession, dir: String): DataFrame =
    qBootstrapCiOf(Tables.orders(s, dir))

  /** Bootstrap over any orders-shaped frame — factored for
    * planted-fixture specs.
    */
  def qBootstrapCiOf(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = orders.sparkSession
    import s.implicits._
    val o = orders.select($"o_orderkey", $"o_totalprice")
    val reps = o
      .selectExpr(
        "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents",
        """CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING),
          |  '_bootA')), 1, 15), 16, 10) AS BIGINT) % 2147483647 AS x1""".stripMargin,
        """1 + CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING),
          |  '_bootB')), 1, 15), 16, 10) AS BIGINT) % 2147483646 AS x2""".stripMargin)
      .selectExpr("cents", "x1", "x2",
        s"explode(sequence(1, $BootB)) AS b")
      .selectExpr("b", "cents",
        "CAST((x1 + b * x2) % 2147483647 AS DOUBLE) / 2147483647.0 AS u")
      .selectExpr("b", "cents",
        """CASE WHEN u < 0.36787944117144233 THEN 0
          |     WHEN u < 0.73575888234288466 THEN 1
          |     WHEN u < 0.91969860292860583 THEN 2
          |     WHEN u < 0.98101184312384615 THEN 3
          |     WHEN u < 0.99634015317265628 THEN 4
          |     ELSE 5 END AS w""".stripMargin)
    // all-long hot path: 2-dp prices are exact in cents, so the
    // replicate mean is (Σ w·cents / Σ w) / 100 with zero decimal ops
    // on the B×n exploded rows (measured 9.0 → 1.6 s at sf0.1; the original per-exploded-row md5 form was 24.6 s)
    val means = reps.groupBy($"b")
      .agg((sum($"cents" * $"w").cast("double") / sum($"w") / lit(100.0)).as("m"))
    val ranked = means.withColumn("r",
      row_number().over(Window.orderBy($"m", $"b")))
    val point = o.agg(count(lit(1)).as("n"),
      expr("floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)" +
        " / count(1) * 1e6 + 0.5) / 1e6").as("point_mean"))
    point
      .crossJoin(broadcast(ranked.where($"r" === 3)
        .selectExpr("floor(m * 1e6 + 0.5) / 1e6 AS ci_lo")))
      .crossJoin(broadcast(ranked.where($"r" === BootB - 2)
        .selectExpr("floor(m * 1e6 + 0.5) / 1e6 AS ci_hi")))
      .select($"n", $"point_mean", $"ci_lo", $"ci_hi")
  }

  val qBootstrapCiSql: String =
    s"""WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
       |reps AS (
       |  SELECT b, cents,
       |    CASE WHEN u < 0.36787944117144233 THEN 0
       |         WHEN u < 0.73575888234288466 THEN 1
       |         WHEN u < 0.91969860292860583 THEN 2
       |         WHEN u < 0.98101184312384615 THEN 3
       |         WHEN u < 0.99634015317265628 THEN 4
       |         ELSE 5 END AS w
       |  FROM (
       |    SELECT cents, b,
       |      CAST((x1 + b * x2) % 2147483647 AS DOUBLE) / 2147483647.0 AS u
       |    FROM (
       |      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
       |        CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)
       |          || '_bootA'), 1, 15)) AS BIGINT) % 2147483647 AS x1,
       |        1 + CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)
       |          || '_bootB'), 1, 15)) AS BIGINT) % 2147483646 AS x2
       |      FROM o),
       |      (SELECT unnest(generate_series(1, $BootB)) AS b))),
       |means AS (
       |  SELECT b, CAST(sum(cents * w) AS DOUBLE) / sum(w) / 100.0 AS m
       |  FROM reps GROUP BY b),
       |ranked AS (
       |  SELECT m, row_number() OVER (ORDER BY m, b) AS r FROM means),
       |pt AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       |      / count(*) * 1e6 + 0.5) / 1e6 AS point_mean
       |  FROM o)
       |SELECT pt.n, pt.point_mean,
       |  lo.ci_lo, hi.ci_hi
       |FROM pt
       |CROSS JOIN (SELECT floor(m * 1e6 + 0.5) / 1e6 AS ci_lo
       |            FROM ranked WHERE r = 3) lo
       |CROSS JOIN (SELECT floor(m * 1e6 + 0.5) / 1e6 AS ci_hi
       |            FROM ranked WHERE r = ${BootB - 2}) hi""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bootstrap_ci" -> (qBootstrapCi _),
    "q_robust_stats" -> (qRobustStats _),
    "q_rfm_segments" -> (qRfmSegments _),
    "q_relational_division" -> (qRelationalDivision _),
    "q11_important_stock" -> (q11ImportantStock _),
    "q20_potential_promotion" -> (q20PotentialPromotion _),
    "q_weighted_median" -> (qWeightedMedian _),
    "q_skyline_parts" -> (qSkylineParts _),
    "q_lateral_topk" -> (qLateralTopk _),
    "q_recursive_chain" -> (qRecursiveChain _),
    "q_spearman" -> (qSpearman _),
    "q02_min_price_supplier" -> (q02MinPriceSupplier _),
    "q08_market_share" -> (q08MarketShare _),
    "q12_late_priority" -> (q12LatePriority _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q16_supplier_cnt" -> (q16SupplierCnt _),
    "q21_waiting_supplier" -> (q21WaitingSupplier _))

  def oracles: Map[String, String] = Map(
    "q_bootstrap_ci" -> qBootstrapCiSql,
    "q_robust_stats" -> qRobustStatsSql,
    "q_rfm_segments" -> qRfmSegmentsSql,
    "q_relational_division" -> qRelationalDivisionSql,
    "q11_important_stock" -> q11Sql,
    "q20_potential_promotion" -> q20Sql,
    "q_weighted_median" -> qWeightedMedianSql,
    "q_skyline_parts" -> qSkylinePartsSql,
    "q_lateral_topk" -> qLateralTopkSql,
    "q_recursive_chain" -> qRecursiveChainSql,
    "q_spearman" -> qSpearmanSql,
    "q02_min_price_supplier" -> q02Sql,
    "q08_market_share" -> q08Sql,
    "q12_late_priority" -> q12Sql,
    "q15_top_supplier" -> q15Sql,
    "q16_supplier_cnt" -> q16Sql,
    "q21_waiting_supplier" -> q21Sql)
}
