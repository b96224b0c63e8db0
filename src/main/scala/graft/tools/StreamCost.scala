package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-trigger cost probe for the incremental streaming finalize:
  * runs `stream_ppjoin` at the given SF and prints one line per
  * micro-batch — (batch id, new token rows, accumulated token rows,
  * seconds) — the evidence that per-trigger work tracks ARRIVALS, not
  * accumulated state size (SCALING.md's incremental-finalize section).
  *
  *   sbt "runMain graft.tools.StreamCost /root/testdata/sf0.1"
  */
object StreamCost {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    graft.streaming.StreamQueries.streamPpjoin(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    val rows = graft.streaming.StreamQueries.ppjoinTriggerLog
      .asScala.toSeq.sortBy(_._1)
    println(f"stream_ppjoin @ $dir%s total=${total}%.1fs")
    rows.foreach { case (id, nNew, nAcc, nPairs, secs) =>
      println(f"trigger=$id%d new_tokens=$nNew%d acc_tokens=$nAcc%d" +
        f" pairs_emitted=$nPairs%d secs=$secs%.2f")
    }
    spark.stop()
  }
}
