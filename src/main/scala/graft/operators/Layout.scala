package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-layout / data-skipping operators — at 100 TB the scan you SKIP
  * is the cheapest scan, and multi-dimensional clustering is how a table
  * queried on two independent keys keeps per-file min/max pruning
  * effective on BOTH.
  *
  * The operator: scale each key to a 16-bit grid, interleave the bits
  * (Morton / z-order curve), and bucket rows by the top 6 interleaved
  * bits — exactly the file assignment a z-ordered writer produces with a
  * 64-file budget. The query then measures what a min/max-pruning reader
  * (parquet row-group stats, Delta/Iceberg file stats) would scan for a
  * 2-D range predicate under (a) single-key "linear" clustering = top 6
  * bits of one key's grid position vs (b) z-order clustering. Linear
  * clustering leaves the second key unsorted in every file, so its
  * min/max spans the full range and no file prunes on it; z-order
  * splits the selectivity across both dimensions.
  *
  * Everything is integer arithmetic (grid scaling by `div`, bit
  * interleave by shift/mask) — bit-identical in DuckDB, so the pruning
  * counts themselves are the oracle-checked contract. Plan shape: one
  * 1-row max() broadcast (the approved corpus-total cross join), one
  * narrow map computing grid/z values, one aggregate on (layout, fid) —
  * no global sort: file assignment is a pure function of the row, which
  * is what makes z-order WRITES embarrassingly parallel too.
  */
object Layout {

  private val GridBits = 16
  private val FileBits = 6 // 64 files

  /** Bit-interleave for the DuckDB oracle: the expanded 32-term
    * shift/mask expression — an independent formulation of the native
    * `morton16` codegen expression the Spark side runs
    * ([[graft.functions.Morton16]], magic-number bit spreading).
    */
  private def zDuck(a: String, b: String): String =
    (0 until GridBits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  def layoutZorder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_partkey", $"l_suppkey")
    val mx = li.agg(max($"l_partkey").as("pmax"), max($"l_suppkey").as("smax"))
    val grid = li.crossJoin(broadcast(mx))
      .selectExpr("l_partkey", "l_suppkey", "pmax", "smax",
        s"CAST(((l_partkey - 1) * ${1 << GridBits}) div pmax AS BIGINT) AS px",
        s"CAST(((l_suppkey - 1) * ${1 << GridBits}) div smax AS BIGINT) AS sx")
      .select(col("l_partkey"), col("l_suppkey"), col("pmax"), col("smax"),
        expr(s"px div ${1 << (GridBits - FileBits)}").as("fid_lin"),
        shiftright(graft.functions.Morton16.morton16(col("px"), col("sx")),
          2 * GridBits - FileBits).as("fid_z"))
    val long = grid.selectExpr("'linear' AS layout", "fid_lin AS fid",
        "l_partkey", "l_suppkey", "pmax", "smax")
      .union(grid.selectExpr("'zorder'", "fid_z",
        "l_partkey", "l_suppkey", "pmax", "smax"))
    // the 2-D range predicate a pruning reader evaluates against each
    // file's min/max stats: partkey ∈ [2/5·pmax, 1/2·pmax], suppkey
    // likewise (integer `div` so both engines derive identical bounds)
    val hit = """max_p >= (pmax * 2) div 5 AND min_p <= pmax div 2
                | AND max_s >= (smax * 2) div 5 AND min_s <= smax div 2"""
      .stripMargin.replace("\n", "")
    long.groupBy($"layout", $"fid")
      .agg(min($"l_partkey").as("min_p"), max($"l_partkey").as("max_p"),
        min($"l_suppkey").as("min_s"), max($"l_suppkey").as("max_s"),
        count(lit(1)).as("cnt"),
        min($"pmax").as("pmax"), min($"smax").as("smax"))
      .groupBy($"layout")
      .agg(count(lit(1)).as("n_files"),
        sum(expr(s"CASE WHEN $hit THEN 1 ELSE 0 END")).as("files_hit"),
        sum(expr(s"CASE WHEN $hit THEN cnt ELSE 0 END")).as("rows_scanned"))
  }

  val layoutZorderSql: String = {
    val gridDiv = 1 << (GridBits - FileBits)
    s"""WITH mx AS (
       |  SELECT max(l_partkey) AS pmax, max(l_suppkey) AS smax FROM lineitem),
       |grid AS (
       |  SELECT l_partkey, l_suppkey, pmax, smax,
       |    ((l_partkey - 1) * ${1 << GridBits}) // pmax AS px,
       |    ((l_suppkey - 1) * ${1 << GridBits}) // smax AS sx
       |  FROM lineitem CROSS JOIN mx),
       |assigned AS (
       |  SELECT l_partkey, l_suppkey, pmax, smax,
       |    px // $gridDiv AS fid_lin,
       |    ${zDuck("px", "sx")} >> ${2 * GridBits - FileBits} AS fid_z
       |  FROM grid),
       |long AS (
       |  SELECT 'linear' AS layout, fid_lin AS fid, l_partkey, l_suppkey,
       |    pmax, smax FROM assigned
       |  UNION ALL
       |  SELECT 'zorder', fid_z, l_partkey, l_suppkey, pmax, smax
       |  FROM assigned),
       |stats AS (
       |  SELECT layout, fid,
       |    min(l_partkey) AS min_p, max(l_partkey) AS max_p,
       |    min(l_suppkey) AS min_s, max(l_suppkey) AS max_s,
       |    count(*) AS cnt, min(pmax) AS pmax, min(smax) AS smax
       |  FROM long GROUP BY layout, fid)
       |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
       |  CAST(sum(CASE WHEN max_p >= (pmax * 2) // 5 AND min_p <= pmax // 2
       |    AND max_s >= (smax * 2) // 5 AND min_s <= smax // 2
       |    THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
       |  CAST(sum(CASE WHEN max_p >= (pmax * 2) // 5 AND min_p <= pmax // 2
       |    AND max_s >= (smax * 2) // 5 AND min_s <= smax // 2
       |    THEN cnt ELSE 0 END) AS BIGINT) AS rows_scanned
       |FROM stats GROUP BY layout""".stripMargin
  }

  /** Hilbert vs z-order vs linear file clustering, measured on the
    * SAME 2-D pruning predicate as [[layoutZorder]] — the layout
    * decision the curve choice actually changes: Hilbert's every step
    * is axis-adjacent, so a 2-D range decomposes into fewer, longer
    * runs of the 1-D key, and the file-level min/max stats a pruning
    * reader consults cover tighter rectangles (modern OPTIMIZE
    * implementations moved from Morton to Hilbert for exactly this).
    * Spark computes the curve with the native codegen'd
    * [[graft.functions.Hilbert16]]; the oracle REWALKS the same
    * quadrant recursion as a generated 16-step CTE chain carrying
    * (x, y, d) — two independent formulations of the curve, one
    * contract. Output: per-layout file count, files hit, and rows
    * scanned under the fixed predicate.
    */
  def layoutHilbert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_partkey", $"l_suppkey")
    val mx = li.agg(max($"l_partkey").as("pmax"), max($"l_suppkey").as("smax"))
    val grid = li.crossJoin(broadcast(mx))
      .selectExpr("l_partkey", "l_suppkey", "pmax", "smax",
        s"CAST(((l_partkey - 1) * ${1 << GridBits}) div pmax AS BIGINT) AS px",
        s"CAST(((l_suppkey - 1) * ${1 << GridBits}) div smax AS BIGINT) AS sx")
      .select(col("l_partkey"), col("l_suppkey"), col("pmax"), col("smax"),
        expr(s"px div ${1 << (GridBits - FileBits)}").as("fid_lin"),
        shiftright(graft.functions.Morton16.morton16(col("px"), col("sx")),
          2 * GridBits - FileBits).as("fid_z"),
        shiftright(graft.functions.Hilbert16.hilbert16(col("px"), col("sx")),
          2 * GridBits - FileBits).as("fid_h"))
    val long = grid.selectExpr("'linear' AS layout", "fid_lin AS fid",
        "l_partkey", "l_suppkey", "pmax", "smax")
      .union(grid.selectExpr("'zorder'", "fid_z",
        "l_partkey", "l_suppkey", "pmax", "smax"))
      .union(grid.selectExpr("'hilbert'", "fid_h",
        "l_partkey", "l_suppkey", "pmax", "smax"))
    val hit = """max_p >= (pmax * 2) div 5 AND min_p <= pmax div 2
                | AND max_s >= (smax * 2) div 5 AND min_s <= smax div 2"""
      .stripMargin.replace("\n", "")
    long.groupBy($"layout", $"fid")
      .agg(min($"l_partkey").as("min_p"), max($"l_partkey").as("max_p"),
        min($"l_suppkey").as("min_s"), max($"l_suppkey").as("max_s"),
        count(lit(1)).as("cnt"),
        min($"pmax").as("pmax"), min($"smax").as("smax"))
      .groupBy($"layout")
      .agg(count(lit(1)).as("n_files"),
        sum(expr(s"CASE WHEN $hit THEN 1 ELSE 0 END")).as("files_hit"),
        sum(expr(s"CASE WHEN $hit THEN cnt ELSE 0 END")).as("rows_scanned"))
  }

  /** The generated per-level Hilbert walk: two CTEs per quadrant level
    * (rx/ry extraction, then the d-accumulate + rotate/swap), s from
    * 2¹⁵ down to 1 — MATERIALIZED so DuckDB's projection inlining
    * cannot re-substitute the walk into itself (the unrolled-recursion
    * gotcha).
    */
  private def hilbertWalkCtes: String = {
    val levels = (15 to 0 by -1).zipWithIndex.map { case (bit, i) =>
      val sVal = 1L << bit
      val prev = if (i == 0) "h0" else s"hb$i"
      s"""ha${i + 1} AS MATERIALIZED (
         |  SELECT *,
         |    CASE WHEN (x & $sVal) > 0 THEN 1 ELSE 0 END AS rx,
         |    CASE WHEN (y & $sVal) > 0 THEN 1 ELSE 0 END AS ry
         |  FROM $prev),
         |hb${i + 1} AS MATERIALIZED (
         |  SELECT l_partkey, l_suppkey, pmax, smax, fid_lin, fid_z,
         |    d + CAST($sVal AS BIGINT) * $sVal * xor(3 * rx, ry) AS d,
         |    CASE WHEN ry = 0 THEN
         |      CASE WHEN rx = 1 THEN ($sVal - 1) - y ELSE y END
         |    ELSE x END AS x,
         |    CASE WHEN ry = 0 THEN
         |      CASE WHEN rx = 1 THEN ($sVal - 1) - x ELSE x END
         |    ELSE y END AS y
         |  FROM ha${i + 1})""".stripMargin
    }
    levels.mkString(",\n")
  }

  val layoutHilbertSql: String = {
    val gridDiv = 1 << (GridBits - FileBits)
    s"""WITH mx AS (
       |  SELECT max(l_partkey) AS pmax, max(l_suppkey) AS smax FROM lineitem),
       |grid AS (
       |  SELECT l_partkey, l_suppkey, pmax, smax,
       |    ((l_partkey - 1) * ${1 << GridBits}) // pmax AS px,
       |    ((l_suppkey - 1) * ${1 << GridBits}) // smax AS sx
       |  FROM lineitem CROSS JOIN mx),
       |h0 AS MATERIALIZED (
       |  SELECT l_partkey, l_suppkey, pmax, smax,
       |    px // $gridDiv AS fid_lin,
       |    ${zDuck("px", "sx")} >> ${2 * GridBits - FileBits} AS fid_z,
       |    CAST(0 AS BIGINT) AS d, px AS x, sx AS y
       |  FROM grid),
       |$hilbertWalkCtes,
       |assigned AS (
       |  SELECT l_partkey, l_suppkey, pmax, smax, fid_lin, fid_z,
       |    d >> ${2 * GridBits - FileBits} AS fid_h
       |  FROM hb16),
       |long AS (
       |  SELECT 'linear' AS layout, fid_lin AS fid, l_partkey, l_suppkey,
       |    pmax, smax FROM assigned
       |  UNION ALL
       |  SELECT 'zorder', fid_z, l_partkey, l_suppkey, pmax, smax
       |  FROM assigned
       |  UNION ALL
       |  SELECT 'hilbert', fid_h, l_partkey, l_suppkey, pmax, smax
       |  FROM assigned),
       |stats AS (
       |  SELECT layout, fid,
       |    min(l_partkey) AS min_p, max(l_partkey) AS max_p,
       |    min(l_suppkey) AS min_s, max(l_suppkey) AS max_s,
       |    count(*) AS cnt, min(pmax) AS pmax, min(smax) AS smax
       |  FROM long GROUP BY layout, fid)
       |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
       |  CAST(sum(CASE WHEN max_p >= (pmax * 2) // 5 AND min_p <= pmax // 2
       |    AND max_s >= (smax * 2) // 5 AND min_s <= smax // 2
       |    THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
       |  CAST(sum(CASE WHEN max_p >= (pmax * 2) // 5 AND min_p <= pmax // 2
       |    AND max_s >= (smax * 2) // 5 AND min_s <= smax // 2
       |    THEN cnt ELSE 0 END) AS BIGINT) AS rows_scanned
       |FROM stats GROUP BY layout""".stripMargin
  }

  // ---------------------------------------------------------- compaction

  /** Target compacted-file size and the small-file threshold (same
    * value — files at or above target pass through untouched, the
    * OPTIMIZE convention).
    */
  private val CompactTarget = 2048L

  /** Small-file compaction planner — the other chronic layout problem
    * at 100 TB: a streaming or highly-parallel writer leaves thousands
    * of under-sized files per partition, and every later scan pays per-
    * file open/footer cost. The planner takes a file inventory
    * (partition key, file id, bytes), passes large files through, and
    * packs small files into target-size bins with a NEXT-FIT sweep: bin
    * id = (running byte total before this file) div target. The running
    * sum is a per-partition window — planning is one shuffle on the
    * partition key, never a driver-side loop, so the planner itself
    * scales with the table. Output per partition: file counts before /
    * after, bytes to rewrite (the I/O bill of executing the plan —
    * large files cost nothing), and the bin count.
    *
    * The inventory here is derived deterministically from `documents`
    * (file = 3-doc block, bytes = n_chars scaled by a doc-dependent
    * factor so both the small and large branches populate); in
    * production the same plan runs over the table's real file manifest.
    * All integer arithmetic — the whole plan is the oracle contract.
    */
  def layoutCompaction(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val f = Tables.documents(s, dir)
      .select($"source", expr("doc_id div 3").as("file_id"),
        expr("CAST(n_chars AS BIGINT) * (1 + doc_id % 9)").as("doc_bytes"))
      .groupBy($"source", $"file_id")
      .agg(sum($"doc_bytes").as("bytes"))
    val w = Window.partitionBy($"source").orderBy($"file_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = f.filter($"bytes" < CompactTarget)
      .withColumn("cum", sum($"bytes").over(w))
      .withColumn("bin", expr(s"(cum - bytes) div $CompactTarget"))
    val sm = binned.groupBy($"source").agg(
      count(lit(1)).as("small_files"),
      countDistinct($"bin").as("bins"),
      sum($"bytes").as("bytes_rewritten"))
    val lg = f.filter($"bytes" >= CompactTarget).groupBy($"source")
      .agg(count(lit(1)).as("large_files"))
    f.groupBy($"source")
      .agg(count(lit(1)).as("files_before"), sum($"bytes").as("bytes_total"))
      .join(sm, Seq("source"), "left")
      .join(lg, Seq("source"), "left")
      .select($"source", $"files_before", $"bytes_total",
        coalesce($"small_files", lit(0L)).as("small_files"),
        (coalesce($"bins", lit(0L)) + coalesce($"large_files", lit(0L)))
          .as("files_after"),
        coalesce($"bytes_rewritten", lit(0L)).as("bytes_rewritten"))
  }

  val layoutCompactionSql: String =
    s"""WITH f AS (
       |  SELECT source, doc_id // 3 AS file_id,
       |    CAST(sum(CAST(n_chars AS BIGINT) * (1 + doc_id % 9)) AS BIGINT) AS bytes
       |  FROM documents GROUP BY 1, 2),
       |binned AS (
       |  SELECT source, bytes,
       |    (CAST(sum(bytes) OVER (PARTITION BY source ORDER BY file_id
       |       ROWS UNBOUNDED PRECEDING) AS BIGINT) - bytes) // $CompactTarget AS bin
       |  FROM f WHERE bytes < $CompactTarget),
       |sm AS (
       |  SELECT source, count(*) AS small_files, count(DISTINCT bin) AS bins,
       |    CAST(sum(bytes) AS BIGINT) AS bytes_rewritten
       |  FROM binned GROUP BY 1),
       |lg AS (
       |  SELECT source, count(*) AS large_files
       |  FROM f WHERE bytes >= $CompactTarget GROUP BY 1),
       |tot AS (
       |  SELECT source, count(*) AS files_before,
       |    CAST(sum(bytes) AS BIGINT) AS bytes_total
       |  FROM f GROUP BY 1)
       |SELECT tot.source, files_before, bytes_total,
       |  COALESCE(small_files, 0) AS small_files,
       |  COALESCE(bins, 0) + COALESCE(large_files, 0) AS files_after,
       |  COALESCE(bytes_rewritten, 0) AS bytes_rewritten
       |FROM tot
       |LEFT JOIN sm ON tot.source = sm.source
       |LEFT JOIN lg ON tot.source = lg.source""".stripMargin

  // ------------------------------------------------------- range layout

  private val RangeFiles = 64

  /** 1-D range-clustered layout vs the two layouts a table usually has
    * instead — the time-scan counterpart of [[layoutZorder]]'s 2-D
    * story. Three 64-file assignments of `events`, each a PURE row
    * function (so, like the z-order writer, all three write
    * embarrassingly parallel — range clustering at production scale is
    * `repartitionByRange(ts)` + `sortWithinPartitions`, and this is its
    * stats model):
    *
    *   - `range`:   file = value-proportional slot of `ts_ns` — what a
    *                time-clustered (retention / time-travel friendly)
    *                writer produces;
    *   - `arrival`: file = id-proportional slot of `event_id` — the
    *                ingestion order a plain append writer produces;
    *   - `hash`:    file = `user_id mod 64` — the layout a user-keyed
    *                (join-optimized) writer produces.
    *
    * Per file the min/max/count of `ts_ns` are exactly the footer stats
    * a pruning reader consults; the measured contract is files hit and
    * rows scanned for the middle-fifth time-range predicate under each
    * layout. At 100 TB this is the difference between a retention scan
    * reading 1/64th of the table (range), whatever time-locality
    * ingestion happened to have (arrival), or ALL of it (hash) — the
    * number that justifies re-clustering a table for its dominant
    * predicate. Integer arithmetic end-to-end; the one 1-row bounds
    * frame is the approved broadcast cross join.
    */
  def layoutRangeSort(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"event_id", $"ts_ns", $"user_id")
    val mx = ev.agg(min($"ts_ns").as("tmin"), max($"ts_ns").as("tmax"),
      max($"event_id").as("emax"))
    val assigned = ev.crossJoin(broadcast(mx)).selectExpr(
      "ts_ns", "tmin", "tmax",
      s"least(((ts_ns - tmin) * $RangeFiles) div (tmax - tmin + 1), ${RangeFiles - 1}) AS fid_range",
      s"least((event_id * $RangeFiles) div (emax + 1), ${RangeFiles - 1}) AS fid_arrival",
      s"user_id % $RangeFiles AS fid_hash")
    val long = assigned.selectExpr("'range' AS layout", "fid_range AS fid",
        "ts_ns", "tmin", "tmax")
      .union(assigned.selectExpr("'arrival'", "fid_arrival",
        "ts_ns", "tmin", "tmax"))
      .union(assigned.selectExpr("'hash'", "fid_hash",
        "ts_ns", "tmin", "tmax"))
    // the probe: ts in the middle fifth [tmin + 2·span div 5,
    // tmin + span div 2] — integer `div` so both engines derive the
    // identical bounds a pruning reader would evaluate per file
    val hit =
      """max_t >= tmin + ((tmax - tmin) * 2) div 5
        | AND min_t <= tmin + (tmax - tmin) div 2""".stripMargin
        .replace("\n", "")
    long.groupBy($"layout", $"fid")
      .agg(min($"ts_ns").as("min_t"), max($"ts_ns").as("max_t"),
        count(lit(1)).as("cnt"),
        min($"tmin").as("tmin"), min($"tmax").as("tmax"))
      .groupBy($"layout")
      .agg(count(lit(1)).as("n_files"),
        sum(expr(s"CASE WHEN $hit THEN 1 ELSE 0 END")).as("files_hit"),
        sum(expr(s"CASE WHEN $hit THEN cnt ELSE 0 END")).as("rows_scanned"))
  }

  val layoutRangeSortSql: String =
    s"""WITH mx AS (
       |  SELECT min(epoch_ns(ts)) AS tmin, max(epoch_ns(ts)) AS tmax,
       |    max(event_id) AS emax
       |  FROM events),
       |assigned AS (
       |  SELECT epoch_ns(ts) AS ts_ns, tmin, tmax,
       |    least(((epoch_ns(ts) - tmin) * $RangeFiles) // (tmax - tmin + 1),
       |      ${RangeFiles - 1}) AS fid_range,
       |    least((event_id * $RangeFiles) // (emax + 1),
       |      ${RangeFiles - 1}) AS fid_arrival,
       |    user_id % $RangeFiles AS fid_hash
       |  FROM events CROSS JOIN mx),
       |long AS (
       |  SELECT 'range' AS layout, fid_range AS fid, ts_ns, tmin, tmax
       |  FROM assigned
       |  UNION ALL
       |  SELECT 'arrival', fid_arrival, ts_ns, tmin, tmax FROM assigned
       |  UNION ALL
       |  SELECT 'hash', fid_hash, ts_ns, tmin, tmax FROM assigned),
       |stats AS (
       |  SELECT layout, fid, min(ts_ns) AS min_t, max(ts_ns) AS max_t,
       |    count(*) AS cnt, min(tmin) AS tmin, min(tmax) AS tmax
       |  FROM long GROUP BY layout, fid)
       |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
       |  CAST(sum(CASE WHEN max_t >= tmin + ((tmax - tmin) * 2) // 5
       |    AND min_t <= tmin + (tmax - tmin) // 2
       |    THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
       |  CAST(sum(CASE WHEN max_t >= tmin + ((tmax - tmin) * 2) // 5
       |    AND min_t <= tmin + (tmax - tmin) // 2
       |    THEN cnt ELSE 0 END) AS BIGINT) AS rows_scanned
       |FROM stats GROUP BY layout""".stripMargin

  /** Shard count before the re-shard step; the query evaluates the
    * N → N+1 transition.
    */
  val HrwShards = 16

  /** Per-row highest-random-weight (rendezvous) shard pick over `n`
    * candidates — argmax of the salted md5-60 weight, computed as a
    * NARROW higher-order expression (no row blow-up: the candidate
    * array lives inside one codegen'd projection). Ties (≈2⁻⁶⁰) break
    * toward the larger shard id via the struct max.
    */
  private def hrwPick(n: Int): String =
    s"""array_max(transform(sequence(0, ${n - 1}), s -> struct(
       |  CAST(conv(substring(md5(concat('hrw:', CAST(doc_id AS STRING),
       |    ':', CAST(s AS STRING))), 1, 15), 16, 10) AS BIGINT) AS h,
       |  CAST(s AS BIGINT) AS s))).s""".stripMargin

  /** Rendezvous (HRW) sharding stability under a shard-count change —
    * the re-sharding contract a 100 TB corpus store needs: assign every
    * document a shard by highest-random-weight hashing (shard =
    * argmax_s md5(key, s); Thaler & Ravishankar 1996) under N and N+1
    * shards, next to the naive mod-hash assignment, and report per
    * (old-)shard how much data each scheme moves. HRW's guarantee —
    * surfaced as columns, not just a doc note — is that a key moves
    * ONLY when the NEW shard wins its argmax, so `hrw_moved_elsewhere`
    * is identically 0 and the moved fraction concentrates at 1/(N+1)
    * ≈ 5.9 %, while mod-hash reassigns ≈ 15/16 of every shard (a full
    * corpus rewrite). Same decision logic rebalances consumers,
    * bucketed layouts, and cache rings.
    *
    * Plan: one narrow projection computing both argmaxes and the mod
    * pair per row (the candidate loop is inside ONE codegen expression
    * — no explode, no row blow-up), then a single 16-key aggregate.
    * At 100 TB this is a map-only pass + a 16-row result.
    */
  def layoutRendezvous(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        expr(hrwPick(HrwShards)).as("s16"),
        expr(hrwPick(HrwShards + 1)).as("s17"),
        expr("CAST(conv(substring(md5(concat('mod:', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
          .as("m"))
      .select($"s16", $"s17",
        ($"m" % HrwShards).as("m16"), ($"m" % (HrwShards + 1)).as("m17"))
      .groupBy($"s16".as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"s17" =!= $"s16", 1L).otherwise(0L)).as("hrw_moved"),
        sum(when($"s17" =!= $"s16" && $"s17" =!= HrwShards, 1L)
          .otherwise(0L)).as("hrw_moved_elsewhere"),
        sum(when($"m17" =!= $"m16", 1L).otherwise(0L)).as("mod_moved"))
  }

  val layoutRendezvousSql: String =
    s"""WITH cand AS (
       |  SELECT doc_id, CAST(sh.s AS BIGINT) AS s,
       |    CAST(('0x' || substring(md5('hrw:' || CAST(doc_id AS VARCHAR)
       |      || ':' || CAST(sh.s AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |  FROM documents
       |  CROSS JOIN (SELECT unnest(range(${HrwShards + 1})) AS s) sh),
       |a16 AS (SELECT doc_id, arg_max(s, h) AS s16 FROM cand
       |  WHERE s < $HrwShards GROUP BY doc_id),
       |a17 AS (SELECT doc_id, arg_max(s, h) AS s17 FROM cand GROUP BY doc_id),
       |modm AS (
       |  SELECT doc_id,
       |    CAST(('0x' || substring(md5('mod:' || CAST(doc_id AS VARCHAR)), 1, 15))
       |      AS BIGINT) AS m
       |  FROM documents)
       |SELECT a16.s16 AS shard, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN a17.s17 <> a16.s16 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS hrw_moved,
       |  CAST(sum(CASE WHEN a17.s17 <> a16.s16 AND a17.s17 <> $HrwShards
       |    THEN 1 ELSE 0 END) AS BIGINT) AS hrw_moved_elsewhere,
       |  CAST(sum(CASE WHEN m % ${HrwShards + 1} <> m % $HrwShards
       |    THEN 1 ELSE 0 END) AS BIGINT) AS mod_moved
       |FROM a16 JOIN a17 USING (doc_id) JOIN modm USING (doc_id)
       |GROUP BY a16.s16""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> (layoutZorder _),
    "layout_range_sort" -> (layoutRangeSort _),
    "layout_rendezvous" -> (layoutRendezvous _),
    "layout_hilbert" -> (layoutHilbert _),
    "layout_compaction" -> (layoutCompaction _))

  def oracles: Map[String, String] = Map(
    "layout_zorder" -> layoutZorderSql,
    "layout_range_sort" -> layoutRangeSortSql,
    "layout_rendezvous" -> layoutRendezvousSql,
    "layout_hilbert" -> layoutHilbertSql,
    "layout_compaction" -> layoutCompactionSql)
}
