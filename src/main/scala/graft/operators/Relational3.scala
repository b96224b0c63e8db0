package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Third tranche: the remaining classic TPC-H query shapes the schema
  * supports — nation-pair volumes, product-line profit, promo share,
  * small-quantity correlated averages, large-order semi joins,
  * disjunctive pushdown, and scalar-subquery anti joins.
  */
object Relational3 {

  import Exact.{dec, revenue => rev}

  /** Q7-shape: shipping volume between two nation pairs by year —
    * supplier nation vs customer nation, both directions.
    */
  def q07NationVolume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n1 = Tables.nation(s, dir).select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(s, dir).select($"n_nationkey".as("ck"), $"n_name".as("cust_nation"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n1), $"s_nationkey" === $"sk")
      .join(broadcast(n2), $"c_nationkey" === $"ck")
      .where(($"supp_nation" === "NATION_3" && $"cust_nation" === "NATION_7") ||
             ($"supp_nation" === "NATION_7" && $"cust_nation" === "NATION_3"))
      .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
      .agg(rev($"l_extendedprice", $"l_discount").as("volume"))
  }

  val q07Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(extract(year FROM l_shipdate) AS INT) AS l_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
      |GROUP BY 1, 2, 3""".stripMargin

  /** Q9-shape: profit on red parts by supplier nation and year. */
  def q09ProductProfit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir).where($"p_name".contains("red"))
        .select("p_partkey"), $"l_partkey" === $"p_partkey")
      .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(s, dir)), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"), year($"l_shipdate").as("o_year"))
      .agg(rev($"l_extendedprice", $"l_discount").as("profit"))
  }

  val q09Sql: String =
    """SELECT n_name AS nation, CAST(extract(year FROM l_shipdate) AS INT) AS o_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2""".stripMargin

  /** Q14-shape: promo revenue share in one month — conditional
    * aggregation ratio, decimal-exact on both engines.
    */
  def q14PromoShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .where($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
             $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
      .join(Tables.part(s, dir).select("p_partkey", "p_type"),
        $"l_partkey" === $"p_partkey")
      .agg(
        (sum(when($"p_type" === "PROMO",
          $"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec)))
          .otherwise(lit(0).cast(dec))).cast("double") * 100.0 /
          sum($"l_extendedprice".cast(dec) * (lit(1).cast(dec) - $"l_discount".cast(dec)))
            .cast("double")).as("promo_pct"))
  }

  val q14Sql: String =
    """SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
      |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |  AS promo_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin

  /** Q17-shape: revenue of small-quantity line items — correlated
    * per-part average (self-agg join), the "below 20% of this part's
    * average quantity" filter.
    */
  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val avgQty = li.groupBy($"l_partkey".as("pk"))
      .agg((sum($"l_quantity".cast(dec)).cast("double") / count(lit(1)))
        .as("avg_qty"))
    li.join(avgQty, $"l_partkey" === $"pk")
      .where($"l_quantity" < $"avg_qty" * 0.5)
      .agg((sum($"l_extendedprice".cast(dec)).cast("double") / 7.0)
        .as("avg_yearly"))
  }

  val q17Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem l
      |JOIN (SELECT l_partkey AS pk,
      |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
      |      FROM lineitem GROUP BY 1) a ON l.l_partkey = a.pk
      |WHERE l.l_quantity < a.avg_qty * 0.5""".stripMargin

  /** Q18-shape: large orders — orders whose total quantity exceeds a
    * threshold (group-having derived table joined back, semi-join
    * shape).
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val big = li.groupBy($"l_orderkey".as("ok"))
      .agg(sum($"l_quantity".cast(dec)).cast("double").as("total_qty"))
      .where($"total_qty" > 180.0)
    Tables.orders(s, dir)
      .join(big, $"o_orderkey" === $"ok")
      .join(Tables.customer(s, dir).select("c_custkey", "c_name"),
        $"o_custkey" === $"c_custkey")
      .select($"c_name", $"o_orderkey", $"total_qty")
  }

  val q18Sql: String =
    """SELECT c_name, o_orderkey, total_qty
      |FROM orders
      |JOIN (SELECT l_orderkey AS ok,
      |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |      FROM lineitem GROUP BY 1
      |      HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 180.0) b
      |  ON o_orderkey = b.ok
      |JOIN customer ON o_custkey = c_custkey""".stripMargin

  /** Q19-shape: disjunction of brand/size/quantity conjunctions — the
    * OR-of-ANDs predicate that tests disjunctive pushdown.
    */
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir).select("p_partkey", "p_brand", "p_size"),
        $"l_partkey" === $"p_partkey")
      .where(($"p_brand" === "Brand#1" && $"p_size".between(1, 15) &&
              $"l_quantity".between(1, 20)) ||
             ($"p_brand" === "Brand#2" && $"p_size".between(10, 30) &&
              $"l_quantity".between(10, 30)))
      .agg(rev($"l_extendedprice", $"l_discount").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q19Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)""".stripMargin

  /** Q22-shape: rich customers with no orders — scalar subquery
    * (global average) + anti join.
    */
  def q22RichNoOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val avgBal = c.where($"c_acctbal" > 0.0)
      .agg((sum($"c_acctbal".cast(dec)).cast("double") / count(lit(1)))
        .as("avg_bal"))
    c.crossJoin(broadcast(avgBal))
      .where($"c_acctbal" > $"avg_bal")
      .join(Tables.orders(s, dir)
        .where($"o_orderpriority" === "1-URGENT").select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_cust"),
        sum($"c_acctbal".cast(dec)).cast("double").as("total_bal"))
  }

  val q22Sql: String =
    """SELECT c_nationkey, count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |                   FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey""".stripMargin

  /** CDC-style upsert merge (SCD-1): an updates batch overrides the base
    * table by key, verified by post-merge aggregates. anti-join keeps
    * base rows without updates; union-all splices the updates in — the
    * MERGE INTO shape on plain parquet. The updated price arithmetic is
    * decimal-exact so both engines agree.
    */
  def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    val updates = base.where($"o_orderkey" % 7 === 0)
      .select($"o_orderkey", $"o_orderstatus",
        ($"o_totalprice".cast(dec) * lit(1.1).cast("decimal(2,1)"))
          .cast("double").as("o_totalprice"))
    val merged = base.join(updates.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      .unionByName(updates)
    merged.groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(28,3)")).cast("double").as("sum_price"))
  }

  val qMergeUpsertSql: String =
    """WITH updates AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE) AS o_totalprice
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |merged AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
      |  UNION ALL SELECT * FROM updates)
      |SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,3))) AS DOUBLE) AS sum_price
      |FROM merged GROUP BY o_orderstatus""".stripMargin

  /** Relational unpivot (wide → long): a per-nation metrics table with
    * three measure columns melts to (nation, metric, value) rows via
    * the native `unpivot` operator — a narrow map over an
    * already-aggregated tiny frame, no extra shuffle. Measures are
    * decimal-summed then cast double, so the melted values hash-match
    * the oracle's UNION ALL restatement.
    */
  def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wide = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).cast("double").as("n_cust"),
        sum($"c_acctbal".cast("decimal(18,2)")).cast("double").as("sum_bal"),
        max($"c_acctbal".cast("decimal(18,2)")).cast("double").as("max_bal"))
    wide.unpivot(Array($"n_name"), Array($"n_cust", $"sum_bal", $"max_bal"),
      "metric", "value")
  }

  val qUnpivotSql: String =
    """WITH wide AS (
      |  SELECT n_name,
      |    CAST(count(*) AS DOUBLE) AS n_cust,
      |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
      |    CAST(max(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name)
      |SELECT n_name, 'n_cust' AS metric, n_cust AS value FROM wide
      |UNION ALL SELECT n_name, 'sum_bal', sum_bal FROM wide
      |UNION ALL SELECT n_name, 'max_bal', max_bal FROM wide""".stripMargin

  /** INTERSECT ALL — multiset intersection keeping min multiplicity:
    * customers ordering in 1995 ∩ customers ordering in 1996, one row
    * per shared (customer, min yearly order count) occurrence. Spark
    * plans this as a single aggregate + generate, no repeated scans.
    */
  def qIntersectAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def custkeysIn(yr: Int) = Tables.orders(s, dir)
      .where(year($"o_orderdate") === yr)
      .select($"o_custkey")
    custkeysIn(1995).intersectAll(custkeysIn(1996))
  }

  val qIntersectAllSql: String =
    """SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1995
      |INTERSECT ALL
      |SELECT o_custkey FROM orders WHERE extract(year FROM o_orderdate) = 1996""".stripMargin

  /** Slowly-changing-dimension type-2 build — the warehouse operator
    * that turns an event stream into versioned dimension rows: per
    * customer, collapse consecutive orders with the same priority into
    * one validity interval [valid_from, valid_to), open-ended (null
    * valid_to) for the current version. Classic gaps-and-islands:
    * change-flag via lag, version id via running sum, interval bounds
    * via min + lead. Three window passes over ONE hash partitioning on
    * custkey (Catalyst collapses same-key windows into one shuffle),
    * then a same-key aggregate — scale-safe: state per customer is its
    * order history, never global.
    */
  def qScd2Customer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byCust = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    val versioned = Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .withColumn("chg",
        when(lag($"o_orderpriority", 1).over(byCust).isNull ||
          lag($"o_orderpriority", 1).over(byCust) =!= $"o_orderpriority", 1L)
          .otherwise(0L))
      .withColumn("version", sum($"chg").over(
        byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = versioned
      .groupBy($"o_custkey", $"version", $"o_orderpriority")
      .agg(min($"o_orderdate").as("valid_from"),
        count(lit(1)).as("n_orders"))
    intervals.withColumn("valid_to",
      lead($"valid_from", 1).over(
        Window.partitionBy($"o_custkey").orderBy($"version")))
      .select($"o_custkey", $"version", $"o_orderpriority",
        $"valid_from", $"valid_to", $"n_orders")
  }

  val qScd2Sql: String =
    """WITH versioned AS (
      |  SELECT o_custkey, o_orderdate, o_orderpriority,
      |    CAST(sum(chg) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS version
      |  FROM (
      |    SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
      |      CASE WHEN lag(o_orderpriority) OVER (PARTITION BY o_custkey
      |          ORDER BY o_orderdate, o_orderkey) IS DISTINCT FROM
      |          o_orderpriority THEN 1 ELSE 0 END AS chg
      |    FROM orders)),
      |intervals AS (
      |  SELECT o_custkey, version, o_orderpriority,
      |    min(o_orderdate) AS valid_from,
      |    CAST(count(*) AS BIGINT) AS n_orders
      |  FROM versioned GROUP BY 1, 2, 3)
      |SELECT o_custkey, version, o_orderpriority, valid_from,
      |  lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version)
      |    AS valid_to,
      |  n_orders
      |FROM intervals""".stripMargin

  /** Upsert-log compaction ("latest record per key") — the CDC/changelog
    * materialization every lakehouse table maintenance job runs: keep
    * only the newest event per (user_id, event_type), newest by event
    * time at µs precision with event_id as the deterministic tie-break.
    * One hash shuffle on the key, per-key state is a single row — the
    * compaction that keeps an upsert table's read amplification flat as
    * the log grows. (Ordering compares µs, not raw nanos, because the
    * oracle engine stores µs-truncated timestamps — the tie-break makes
    * the winner identical either way.)
    */
  def qLatestPerKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy(expr("ts_ns div 1000").desc, $"event_id".desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", $"value")
  }

  val qLatestPerKeySql: String =
    """SELECT user_id, event_type, event_id, value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1""".stripMargin

  /** Market-basket co-purchase pairs (the A-priori first pass): part
    * pairs appearing together in ≥ 2 orders, with lift against the
    * independence assumption. The pair enumeration is the basket
    * self-join keyed on l_orderkey — both sides share the orderkey
    * shuffle partitioning, and work per basket is bounded by the
    * basket size squared (single-digit items per order), NOT by the
    * part catalog: this is what makes the pass linear in baskets at
    * 100 TB where a part×part frame would be 10¹² rows. The p1 < p2
    * ordering halves the pairs and makes each undirected pair unique.
    * Lift's one double expression (support · n_baskets / (pc1 · pc2))
    * is stated in the identical operation order on both engines; all
    * inputs are exact counts.
    */
  /** Item-item collaborative filtering: top-5 most-similar parts per
    * part by basket cosine (support / √(deg_a·deg_b)) over the
    * co-purchase pairs — the classic ItemCF recommender readout built
    * on [[qCopurchasePairs]]'s basket self-join (work bounded by
    * basket size, never catalog²). Similarity goes straight into
    * integer micro-units (√ is correctly-rounded IEEE on both
    * engines), and the per-part top-5 is a (micro DESC, neighbor)
    * row_number — Spark rewrites it to WindowGroupLimit, so ranking
    * state is k-bounded per part.
    */
  def qItemcfTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val items = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    val pairs = items.select($"l_orderkey", $"l_partkey".as("p1"))
      .join(items.select($"l_orderkey", $"l_partkey".as("p2")), "l_orderkey")
      .where($"p1" < $"p2")
      .groupBy($"p1", $"p2").agg(count(lit(1)).as("support"))
      .where($"support" >= 2)
    val deg = items.groupBy($"l_partkey").agg(count(lit(1)).as("deg"))
    val scored = pairs
      .join(deg.select($"l_partkey".as("p1"), $"deg".as("d1")), "p1")
      .join(deg.select($"l_partkey".as("p2"), $"deg".as("d2")), "p2")
      .selectExpr("p1", "p2", "support",
        "CAST(floor(support / sqrt(CAST(d1 AS DOUBLE) * d2) * 1e6 + 0.5) AS BIGINT) AS cos_micro")
    val sym = scored.selectExpr("p1 AS part", "p2 AS neighbor", "support", "cos_micro")
      .unionByName(scored.selectExpr("p2 AS part", "p1 AS neighbor", "support", "cos_micro"))
    val w = Window.partitionBy($"part").orderBy($"cos_micro".desc, $"neighbor")
    sym.withColumn("rn", row_number().over(w))
      .where($"rn" <= 5)
      .selectExpr("part", "neighbor", "support",
        "CAST(cos_micro AS DOUBLE) / 1e6 AS cosine", "rn")
  }

  val qItemcfTopkSql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
      |    CAST(count(*) AS BIGINT) AS support
      |  FROM items a
      |  JOIN items b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |  HAVING count(*) >= 2),
      |deg AS (
      |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS deg
      |  FROM items GROUP BY 1),
      |scored AS (
      |  SELECT p1, p2, support,
      |    CAST(floor(support / sqrt(CAST(d1.deg AS DOUBLE) * d2.deg) * 1e6 + 0.5) AS BIGINT) AS cos_micro
      |  FROM pairs
      |  JOIN deg d1 ON d1.l_partkey = p1
      |  JOIN deg d2 ON d2.l_partkey = p2),
      |sym AS (
      |  SELECT p1 AS part, p2 AS neighbor, support, cos_micro FROM scored
      |  UNION ALL
      |  SELECT p2, p1, support, cos_micro FROM scored)
      |SELECT part, neighbor, support,
      |  CAST(cos_micro AS DOUBLE) / 1e6 AS cosine, rn
      |FROM (
      |  SELECT part, neighbor, support, cos_micro,
      |    row_number() OVER (PARTITION BY part
      |      ORDER BY cos_micro DESC, neighbor) AS rn
      |  FROM sym)
      |WHERE rn <= 5""".stripMargin

  def qCopurchasePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val items = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    val pairs = items.select($"l_orderkey", $"l_partkey".as("p1"))
      .join(items.select($"l_orderkey", $"l_partkey".as("p2")), "l_orderkey")
      .where($"p1" < $"p2")
      .groupBy($"p1", $"p2").agg(count(lit(1)).as("support"))
      .where($"support" >= 2)
    val partCnt = items.groupBy($"l_partkey").agg(count(lit(1)).as("pc"))
    val nb = items.select($"l_orderkey").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(partCnt.select($"l_partkey".as("p1"), $"pc".as("pc1")), "p1")
      .join(partCnt.select($"l_partkey".as("p2"), $"pc".as("pc2")), "p2")
      .crossJoin(broadcast(nb))
      .select($"p1", $"p2", $"support",
        round($"support".cast("double") * $"n_baskets" / ($"pc1" * $"pc2"), 6)
          .as("lift"))
  }

  val qCopurchaseSql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
      |    CAST(count(*) AS BIGINT) AS support
      |  FROM items a
      |  JOIN items b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |  HAVING count(*) >= 2),
      |pc AS (
      |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS pc
      |  FROM items GROUP BY 1),
      |nb AS (
      |  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets
      |  FROM items)
      |SELECT p1, p2, support,
      |  round(CAST(support AS DOUBLE) * n_baskets / (c1.pc * c2.pc), 6)
      |    AS lift
      |FROM pairs
      |JOIN pc c1 ON c1.l_partkey = p1
      |JOIN pc c2 ON c2.l_partkey = p2
      |CROSS JOIN nb""".stripMargin

  /** Rule-list size — mirrored in the oracle. */
  val AssocTopK = 20

  /** Association rules over the co-purchase baskets — the DIRECTED form
    * of [[qCopurchasePairs]]: each frequent pair {A,B} yields rules
    * A→B and B→A with confidence = support(A,B)/support(A); lift rides
    * along (direction-free). Confidence is what a recommender acts on
    * (P(B|A) ≠ P(A|B) when the antecedent is rare), which the
    * symmetric pair table can't express. The contract is the TOP
    * [[AssocTopK]] rules by confidence — a fixed absolute floor is
    * data-fragile (this corpus's parts are frequent enough that no
    * rule clears 0.5 even at sf0.01), while the head of the
    * confidence ranking is what the dashboard shows at any SF. The
    * rank orders by the micro-rounded confidence then both keys — a
    * total order, so the cut is engine-independent; `rk` makes the
    * ordering part of the hashed contract.
    *
    * Scale shape: same basket self-join as the pair table (bounded by
    * Σ basket_size² after the distinct), then equi-joins against the
    * per-item counts and ONE 1-row broadcast for the basket total —
    * the direction fan-out doubles rows AFTER aggregation, never the
    * join input; the global top-K is a K-row ordered cut.
    */
  def qAssocRules(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val items = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    val pairs = items.select($"l_orderkey", $"l_partkey".as("p1"))
      .join(items.select($"l_orderkey", $"l_partkey".as("p2")), "l_orderkey")
      .where($"p1" < $"p2")
      .groupBy($"p1", $"p2").agg(count(lit(1)).as("support"))
      .where($"support" >= 2)
    val directed = pairs
      .select($"p1".as("antecedent"), $"p2".as("consequent"), $"support")
      .unionByName(pairs
        .select($"p2".as("antecedent"), $"p1".as("consequent"), $"support"))
    val partCnt = items.groupBy($"l_partkey").agg(count(lit(1)).as("pc"))
    val nb = items.select($"l_orderkey").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val scored = directed
      .join(partCnt.select($"l_partkey".as("antecedent"), $"pc".as("pc_a")),
        "antecedent")
      .join(partCnt.select($"l_partkey".as("consequent"), $"pc".as("pc_c")),
        "consequent")
      .crossJoin(broadcast(nb))
      .select($"antecedent", $"consequent", $"support",
        (floor($"support".cast("double") / $"pc_a" * 1e6 + 0.5) / 1e6)
          .as("confidence"),
        round($"support".cast("double") * $"n_baskets" / ($"pc_a" * $"pc_c"), 6)
          .as("lift"))
      .orderBy($"confidence".desc, $"antecedent", $"consequent")
      .limit(AssocTopK)
    import org.apache.spark.sql.expressions.Window
    // K-row frame: the unpartitioned rank window is value-bounded
    scored.withColumn("rk", row_number().over(
        Window.orderBy($"confidence".desc, $"antecedent", $"consequent"))
      .cast("long"))
  }

  val qAssocRulesSql: String =
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pairs AS (
       |  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       |    CAST(count(*) AS BIGINT) AS support
       |  FROM items a
       |  JOIN items b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |  HAVING count(*) >= 2),
       |directed AS (
       |  SELECT p1 AS antecedent, p2 AS consequent, support FROM pairs
       |  UNION ALL
       |  SELECT p2, p1, support FROM pairs),
       |pc AS (
       |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS pc
       |  FROM items GROUP BY 1),
       |nb AS (
       |  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets
       |  FROM items),
       |scored AS (
       |  SELECT antecedent, consequent, support,
       |    floor(CAST(support AS DOUBLE) / ca.pc * 1e6 + 0.5) / 1e6
       |      AS confidence,
       |    round(CAST(support AS DOUBLE) * n_baskets / (ca.pc * cc.pc), 6)
       |      AS lift
       |  FROM directed
       |  JOIN pc ca ON ca.l_partkey = antecedent
       |  JOIN pc cc ON cc.l_partkey = consequent
       |  CROSS JOIN nb)
       |SELECT antecedent, consequent, support, confidence, lift,
       |  CAST(row_number() OVER (ORDER BY confidence DESC,
       |    antecedent, consequent) AS BIGINT) AS rk
       |FROM scored
       |QUALIFY rk <= $AssocTopK""".stripMargin

  /** Frequent triples — Apriori level 3 over the co-purchase baskets:
    * candidate (p1 < p2 < p3) itemsets counted only where the (p1, p2)
    * SUB-PAIR is already frequent (the Apriori prune: any triple at
    * support ≥ 2 has every sub-pair at support ≥ 2, so the left-anchor
    * semi-join drops no answers while cutting the 3-way join's input
    * to baskets that can still produce one — at 100 TB the level-2
    * result gates level-3's shuffle exactly like a production FP-mining
    * pass). The oracle is the UNpruned 3-way self-join, so the prune's
    * losslessness is hash-checked, not assumed.
    *
    * Data note: sf0.01 yields 12 frequent triples; sf0.1's larger
    * part space dilutes co-occurrence below support 2 (measured: max
    * PAIR support there is 3, triples 0) — the empty result at the
    * bench SF is the true mining answer, and the prune makes it cheap
    * (the level-3 join input is gated to near-nothing).
    */
  def qFrequentTriples(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val items = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    val freqPairs = items.select($"l_orderkey", $"l_partkey".as("p1"))
      .join(items.select($"l_orderkey", $"l_partkey".as("p2")), "l_orderkey")
      .where($"p1" < $"p2")
      .groupBy($"p1", $"p2").agg(count(lit(1)).as("sup2"))
      .where($"sup2" >= 2)
      .select($"p1", $"p2")
    val pairBaskets = items.select($"l_orderkey", $"l_partkey".as("p1"))
      .join(items.select($"l_orderkey", $"l_partkey".as("p2")), "l_orderkey")
      .where($"p1" < $"p2")
      .join(freqPairs, Seq("p1", "p2"), "left_semi")
    pairBaskets
      .join(items.select($"l_orderkey", $"l_partkey".as("p3")), "l_orderkey")
      .where($"p3" > $"p2")
      .groupBy($"p1", $"p2", $"p3").agg(count(lit(1)).as("support"))
      .where($"support" >= 2)
  }

  val qFrequentTriplesSql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      |SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
      |  CAST(count(*) AS BIGINT) AS support
      |FROM items a
      |JOIN items b ON b.l_orderkey = a.l_orderkey
      |  AND a.l_partkey < b.l_partkey
      |JOIN items c ON c.l_orderkey = a.l_orderkey
      |  AND c.l_partkey > b.l_partkey
      |GROUP BY 1, 2, 3
      |HAVING count(*) >= 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_frequent_triples" -> (qFrequentTriples _),
    "q_itemcf_topk" -> (qItemcfTopk _),
    "q_copurchase_pairs" -> (qCopurchasePairs _),
    "q_assoc_rules" -> (qAssocRules _),
    "q_latest_per_key" -> (qLatestPerKey _),
    "q_scd2_customer" -> (qScd2Customer _),
    "q_unpivot" -> (qUnpivot _),
    "q_intersect_all" -> (qIntersectAll _),
    "q_merge_upsert" -> (qMergeUpsert _),
    "q07_nation_volume" -> (q07NationVolume _),
    "q09_product_profit" -> (q09ProductProfit _),
    "q14_promo_share" -> (q14PromoShare _),
    "q17_small_quantity" -> (q17SmallQuantity _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q22_rich_no_orders" -> (q22RichNoOrders _))

  def oracles: Map[String, String] = Map(
    "q_itemcf_topk" -> qItemcfTopkSql,
    "q_copurchase_pairs" -> qCopurchaseSql,
    "q_assoc_rules" -> qAssocRulesSql,
    "q_frequent_triples" -> qFrequentTriplesSql,
    "q_latest_per_key" -> qLatestPerKeySql,
    "q_scd2_customer" -> qScd2Sql,
    "q_unpivot" -> qUnpivotSql,
    "q_intersect_all" -> qIntersectAllSql,
    "q_merge_upsert" -> qMergeUpsertSql,
    "q07_nation_volume" -> q07Sql,
    "q09_product_profit" -> q09Sql,
    "q14_promo_share" -> q14Sql,
    "q17_small_quantity" -> q17Sql,
    "q18_large_orders" -> q18Sql,
    "q19_disjunctive" -> q19Sql,
    "q22_rich_no_orders" -> q22Sql)
}
