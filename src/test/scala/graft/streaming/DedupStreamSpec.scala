package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.TestSpark

class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming dedup drops duplicates across triggers within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val df = in.toDF().toDF("ts", "event_id")
    val q = Streams.dedupStream(df, "ts", "10 minutes", "event_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt").toString)
      .start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 01:$m%02d:00")
    in.addData((ts(1), 100L), (ts(2), 101L), (ts(1), 100L)) // dup in-batch
    q.processAllAvailable()
    in.addData((ts(1), 100L), (ts(3), 102L))                // dup cross-batch
    q.processAllAvailable()
    val ids = spark.table("dedup_out").collect().map(_.getLong(1)).sorted.toList
    q.stop()
    assert(ids == List(100L, 101L, 102L))
  }
}
