package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Driver-contract entries that exercise the streaming engine end-to-end:
  * a file-source stream is run to completion with `Trigger.AvailableNow`
  * and the FINAL state is returned — which is exactly batch-SQL
  * expressible, so these streaming queries are DuckDB-oracle-checked
  * like everything else (SURVEY.md §5: "streaming queries are verified
  * on final state").
  *
  * This is the lambda-architecture reconciliation claim made concrete:
  * the speed layer (incremental, stateful, micro-batched) must converge
  * to the batch layer's answer on the same data.
  */
object StreamQueries {

  private def uniq(prefix: String): String =
    prefix + "_" + java.util.UUID.randomUUID().toString.replace("-", "")

  private def ckpt(): String = graft.TempDirs.scoped("graft_ckpt")

  /** Spark's file stream source lists a DIRECTORY; the testdata tables
    * are single parquet files, so stage the file into a temp dir (this
    * mirrors how a production stream would watch a landing directory).
    */
  private def stageAsDir(file: String): String = {
    import java.nio.file._
    val d = Paths.get(graft.TempDirs.scoped("graft_stream_src"))
    val src = Paths.get(file)
    Files.copy(src, d.resolve(src.getFileName), StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  /** Run a streaming aggregation over all available input and return its
    * final state from the memory sink.
    */
  private def runToFinal(df: DataFrame, mode: String): DataFrame = {
    val name = uniq("sq")
    val q = df.writeStream
      .outputMode(mode)
      .format("memory").queryName(name)
      .option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  /** Streaming word count over `documents` (complete mode ⇒ final
    * per-word totals — the batch word count's answer, via the
    * incremental engine + state store).
    */
  def streamWordCount(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    val schema = s.read.parquet(path).schema
    val lines = s.readStream.schema(schema).parquet(stageAsDir(path))
      .select(col("text").as("value"))
    runToFinal(Streams.wordCount(lines), "complete")
      .withColumnRenamed("count", "cnt")
  }

  /** Streaming interval count over `events` — the A5 query shape on the
    * incremental engine, final state compared against the batch oracle.
    */
  def streamIntervalCount(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = s.read.parquet(path).schema
    val lo = 1704844800000000000L // 2024-01-10T00:00:00Z in epoch nanos
    val hi = 1705708800000000000L // 2024-01-20T00:00:00Z
    val ev = s.readStream.schema(schema).parquet(stageAsDir(path))
      .filter(col("ts") >= lo && col("ts") < hi)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    runToFinal(ev, "complete")
  }

  /** Streaming sessionization through `flatMapGroupsWithState`: per-user
    * (lastSeen, sessionCount) state, a new session when the gap exceeds
    * 30 minutes. Events inside a trigger are sorted per group before
    * folding (micro-batch iterators carry no time order); state carries
    * across triggers. Final state is oracle-checked against the batch
    * lag-gap sessionization (`EventOps.sessionStatsSql`) — the arbitrary
    * -stateful-operator version of the lambda convergence claim.
    */
  def streamSessionStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = s.read.parquet(path).schema
    val ev = s.readStream.schema(schema).parquet(stageAsDir(path))
      .select($"user_id", $"ts".as("ts_ns")) // raw nanos long (schema col name is ts)
      .as[(Long, Long)]
    val gapNs = 1800L * 1000000000L
    // state: (lastSeenNs, sessions, events)
    val out = ev.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long, Long)]) =>
          // SINGLE-BATCH ASSUMPTION: timestamps are sorted only within
          // this micro-batch. The staged input is one file processed in
          // one AvailableNow trigger, so the whole history is sorted
          // here; with a multi-file source or maxFilesPerTrigger, events
          // arriving out of order ACROSS batches would miscount sessions
          // versus the batch oracle (the gap fold is order-sensitive).
          // Reusing this with rate-limited sources needs watermark-style
          // buffering in the state before folding.
          val sorted = rows.map(_._2).toArray.sorted
          var (lastSeen, sessions, events) =
            state.getOption.getOrElse((Long.MinValue, 0L, 0L))
          sorted.foreach { t =>
            if (lastSeen == Long.MinValue || t - lastSeen > gapNs) sessions += 1
            lastSeen = t
            events += 1
          }
          state.update((lastSeen, sessions, events))
          Iterator((user, sessions, events))
      }
      .toDF("user_id", "n_sessions", "n_events")
    val name = uniq("sq")
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName(name)
      .option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // final state per user = last update emitted (update mode may emit
    // a row per trigger; keep the one with the max event count)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("n_events").desc)
    s.table(name)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("rn") === 1)
      .select("user_id", "n_sessions", "n_events")
  }

  /** Stream-stream interval join as a driver-contract query: purchases
    * join every click by the same user within the preceding hour, both
    * sides arriving as independent file streams with watermarks (the
    * state-cleanup contract), append mode. With AvailableNow over the
    * staged input the emitted set is exactly the batch interval join —
    * the DuckDB oracle. Timestamps are truncated to µs on BOTH sides
    * (DuckDB reads the nanos parquet column truncated to µs), so the
    * interval comparisons are exact integer µs comparisons.
    */
  def streamClickAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = s.read.parquet(path).schema
    val staged = stageAsDir(path)
    // a stream-stream join materializes FOUR state stores per shuffle
    // partition per trigger; size the partition count to the stream's
    // state volume, not the batch default (at this volume the store
    // setup dominates — at production volume this knob goes UP with
    // keyspace, it is per-query state sizing either way)
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try streamClickAttributionInner(s, staged, schema)
    finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def streamClickAttributionInner(s: SparkSession, staged: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import s.implicits._
    def src(): DataFrame = s.readStream.schema(schema).parquet(staged)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("timestamp_micros(ts div 1000)").as("tsu"))
    val p = src().where($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
        $"tsu".as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val c = src().where($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"),
        $"tsu".as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val joined = p.join(c,
      expr("""p_user = c_user AND
             |c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 1 HOUR""".stripMargin))
      .select($"purchase_id", $"click_id")
    runToFinal(joined, "append")
  }

  val streamClickAttributionSql: String =
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id
      |FROM events p JOIN events c ON p.user_id = c.user_id
      |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR""".stripMargin

  /** Streaming exact dedup over `documents`: the batch dedup's
    * (hash, norm) keep-min aggregation on the incremental engine,
    * complete mode — per-key aggregation is arrival-order-insensitive
    * (unlike streaming dropDuplicates, which keeps the first arrival),
    * so the final state equals the batch `dedup_exact` oracle under any
    * trigger split. Extends the lambda-convergence claim to the dedup
    * family.
    */
  def streamDedupExact(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    val schema = s.read.parquet(path).schema
    val docs = s.readStream.schema(schema).parquet(stageAsDir(path))
      .select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"))
      .groupBy(graft.functions.FnvHash64.fnv_hash64(col("norm")).as("text_hash"),
        col("norm"))
      .agg(min(col("doc_id")).as("kept_doc_id"),
        count(lit(1)).as("n_copies"))
    runToFinal(docs, "complete")
      .select("kept_doc_id", "n_copies")
  }

  /** Streaming hourly windowed counts — the time-window aggregation on
    * the incremental engine (tumbling `window()` + watermark), final
    * complete-mode state equal to the batch `ev_hourly_counts` oracle.
    * Complete mode (not append) because the trailing window never closes
    * under a bounded replay: the watermark stops at max-event-time −
    * delay, so append would hold back the final hour forever.
    */
  def streamHourlyCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = s.read.parquet(path).schema
    val lo = 1704412800000000000L // 2024-01-05T00:00:00Z epoch nanos
    val hi = 1704499200000000000L // 2024-01-06T00:00:00Z
    val ev = s.readStream.schema(schema).parquet(stageAsDir(path))
      .filter(col("ts") >= lo && col("ts") < hi)
      .select(col("event_type"),
        expr("timestamp_micros(ts div 1000)").as("ts_t"))
      .withWatermark("ts_t", "1 hour")
      .groupBy(window($"ts_t", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm").as("hour"),
        $"event_type", $"cnt")
    runToFinal(ev, "complete")
  }

  /** Incremental materialized-view maintenance — the lambda serving
    * layer as a contract query. The events stream is staged as FOUR
    * files and drained with `maxFilesPerTrigger = 1`, so the update-mode
    * aggregation genuinely runs across multiple triggers; each trigger's
    * changed keys (with their cumulative counts from the state store)
    * are APPENDED to a parquet delta log stamped with the batch id — an
    * idempotent, replay-safe sink write (re-running a batch rewrites the
    * same rows). The view is reconstructed as latest-batch-wins per key
    * and must equal the batch aggregate — the oracle.
    */
  def streamMvCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = graft.TempDirs.scoped("graft_mv_src")
    s.read.parquet(s"$dir/events.parquet")
      .repartition(4).write.mode("overwrite").parquet(src)
    val schema = s.read.parquet(src).schema
    val mvLog = graft.TempDirs.scoped("graft_mv_log")
    val agg = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(mvLog)
      }
      .option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"event_type").orderBy($"batch_id".desc)
    s.read.parquet(mvLog)
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"event_type", $"cnt")
  }

  val streamMvCountsSql: String =
    """SELECT event_type, count(*) AS cnt
      |FROM events GROUP BY event_type""".stripMargin

  /** Start-position / rate control for the file source — the analogs of
    * the reference spout's earliest/latest start offset and bounded
    * max-pending knobs
    * (/root/reference/src/main/scala/com/miguno/kafkastorm/storm/topologies/KafkaStormDemo.scala:31-57):
    *
    *   - `maxFilesPerTrigger` bounds every micro-batch; AvailableNow
    *     still drains all input, but across MULTIPLE triggers — bounded
    *     in-flight state instead of one unbounded replay batch.
    *   - `latestFirst = true` starts consumption from the NEWEST files
    *     (the "latest offset" start position).
    *
    * Returns the final word-count state plus the number of non-empty
    * triggers and their per-trigger input sizes, so specs can assert
    * genuinely incremental progress and latest-first ordering.
    */
  def rateLimitedWordCount(s: SparkSession, srcDir: String,
      maxFilesPerTrigger: Int,
      latestFirst: Boolean = false): (DataFrame, Array[Long]) = {
    val schema = s.read.parquet(srcDir).schema
    val lines = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("latestFirst", latestFirst)
      .parquet(srcDir)
      .select(col("text").as("value"))
    val name = uniq("sq")
    val q = Streams.wordCount(lines).writeStream
      .outputMode("complete")
      .format("memory").queryName(name)
      .option("checkpointLocation", ckpt())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val perTrigger = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    (s.table(name), perTrigger)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_wordcount" -> (streamWordCount _),
    "stream_interval_count" -> (streamIntervalCount _),
    "stream_session_stats" -> (streamSessionStats _),
    "stream_dedup_exact" -> (streamDedupExact _),
    "stream_click_attribution" -> (streamClickAttribution _),
    "stream_mv_counts" -> (streamMvCounts _),
    "stream_hourly_counts" -> (streamHourlyCounts _))

  def oracles: Map[String, String] = Map(
    // final streaming state must equal the batch answers
    "stream_wordcount" -> graft.operators.TextOps.wordCountSql,
    "stream_interval_count" -> graft.operators.EventOps.intervalCountSql,
    "stream_session_stats" -> graft.operators.EventOps.sessionStatsSql,
    "stream_dedup_exact" -> graft.operators.Dedup.exactDedupSql,
    "stream_click_attribution" -> streamClickAttributionSql,
    "stream_mv_counts" -> streamMvCountsSql,
    "stream_hourly_counts" -> graft.operators.EventOps.hourlyCountsSql)
}
