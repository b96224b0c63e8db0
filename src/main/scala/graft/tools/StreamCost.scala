package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-trigger cost probe for the incremental streaming finalizes:
  * runs `stream_ppjoin` or `stream_exact_substr` at the given SF and
  * prints one line per micro-batch — arrivals, accumulated state size,
  * emitted delta, seconds — the evidence that per-trigger work tracks
  * ARRIVALS (plus ExactSubstr's bounded one-shot crossing repair), not
  * accumulated state size (SCALING.md's incremental-finalize section).
  *
  *   sbt "runMain graft.tools.StreamCost /root/testdata/sf0.1 [query]"
  */
object StreamCost {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val query = args.drop(1).headOption.getOrElse("stream_ppjoin")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    graft.streaming.StreamQueries.queries(query)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    println(f"$query%s @ $dir%s total=${total}%.1fs")
    query match {
      case "stream_exact_substr" | "stream_substr_savings" =>
        graft.streaming.StreamQueries.substrTriggerLog
          .asScala.toSeq.sortBy(_._1)
          .foreach { case (id, nNew, nAcc, nTouch, nSpans, secs) =>
            println(f"trigger=$id%d new_postings=$nNew%d" +
              f" acc_postings=$nAcc%d pairs_touched=$nTouch%d" +
              f" spans_written=$nSpans%d secs=$secs%.2f")
          }
      case _ =>
        graft.streaming.StreamQueries.ppjoinTriggerLog
          .asScala.toSeq.sortBy(_._1)
          .foreach { case (id, nNew, nAcc, nPairs, secs) =>
            println(f"trigger=$id%d new_tokens=$nNew%d acc_tokens=$nAcc%d" +
              f" pairs_emitted=$nPairs%d secs=$secs%.2f")
          }
    }
    spark.stop()
  }
}
