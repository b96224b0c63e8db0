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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_wordcount" -> (streamWordCount _),
    "stream_interval_count" -> (streamIntervalCount _))

  def oracles: Map[String, String] = Map(
    // final streaming state must equal the batch answers
    "stream_wordcount" -> graft.operators.TextOps.wordCountSql,
    "stream_interval_count" -> graft.operators.EventOps.intervalCountSql)
}
