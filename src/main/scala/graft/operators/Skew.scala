package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-handling join helpers — the hot-key survival kit for 100 TB
  * joins (AQE's skew-join splitting covers sort-merge joins at runtime;
  * salting is the plan-level tool when a key's rows must be split
  * before a hash shuffle, e.g. a power-law user_id).
  */
object Skew {

  /** Salted equi-join: the (big, skewed) left side gets a deterministic
    * salt in [0, n) derived from its full row content; the right side is
    * replicated n times, once per salt. The join key becomes (key, salt),
    * splitting each hot key's rows across n reducers.
    *
    * Cost model: right side inflates ×n through the shuffle — choose n
    * ≈ (hot-key rows / target partition rows), keep n small. Result is
    * row-for-row identical to the unsalted join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      nSalts: Int): DataFrame = {
    // round-robin salt: ANY salt value joins correctly (the right side
    // is replicated for every salt), so the salt's only job is to
    // spread rows — a content hash would send identical duplicate rows
    // of a hot key to one reducer, exactly the case salting exists to
    // fix. monotonically_increasing_id is distinct per row regardless
    // of content; correctness under task retry is preserved because the
    // join matches every salt value.
    val salted = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    salted.join(replicated,
      salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
      .drop(replicated(key)).drop("_salt")
  }

  /** Contract query: orders⋈customer through the salted join, then a
    * segment rollup. The oracle is the PLAIN join — salting must be
    * result-invariant (row-for-row identical to the unsalted join), and
    * this query pins that equivalence to the DuckDB gate, not just a
    * spec.
    */
  def qSkewSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey".as("ck"),
        $"o_totalprice")
    val cust = Tables.customer(s, dir)
      .select($"c_custkey".as("ck"), $"c_mktsegment")
    saltedJoin(ord, cust, "ck", nSalts = 4)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
  }

  val qSkewSaltedJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** Contract query through BUCKETED catalog tables: both join sides are
    * written `bucketBy(8, key).sortBy(key)` (external tables at scoped
    * paths) and joined back from the catalog — the ingest-time
    * co-location layout that makes repeated fact joins shuffle-free at
    * scale (exchange-freeness itself is asserted in SkewAndBucketSpec;
    * here the layout's RESULT is pinned to the plain-join oracle).
    */
  def qBucketedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .write.mode("overwrite")
      .option("path", graft.TempDirs.scoped("graft_bkt_ord"))
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_bkt_orders")
    Tables.customer(s, dir)
      .select($"c_custkey", $"c_mktsegment")
      .write.mode("overwrite")
      .option("path", graft.TempDirs.scoped("graft_bkt_cust"))
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_bkt_customer")
    s.table("graft_bkt_orders")
      .join(s.table("graft_bkt_customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct($"o_custkey").as("n_custs"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
  }

  val qBucketedJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  count(DISTINCT o_custkey) AS n_custs,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_salted_join" -> (qSkewSaltedJoin _),
    "q_bucketed_join" -> (qBucketedJoin _))

  def oracles: Map[String, String] = Map(
    "q_skew_salted_join" -> qSkewSaltedJoinSql,
    "q_bucketed_join" -> qBucketedJoinSql)
}
