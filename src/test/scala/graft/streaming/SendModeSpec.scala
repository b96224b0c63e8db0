package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.TestSpark

/** Sync vs async producer-mode semantics, mirroring the reference's
  * `KafkaSpec.scala:51-140` sync/async producer assertions: identical
  * delivery, different flush cadence.
  */
class SendModeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rows(n: Int): Iterator[Row] =
    (0 until n).iterator.map(i => Row(i))

  test("sync mode flushes once per record") {
    val conn = new Sinks.RecordingConnection
    Sinks.sendPartition(rows(37), conn, Sinks.Sync)
    assert(conn.sent.get() == 37)
    assert(conn.flushes.get() == 37)
  }

  test("async mode delivers every record with ceil(n/batch) flushes") {
    val conn = new Sinks.RecordingConnection
    Sinks.sendPartition(rows(37), conn, Sinks.Async(16))
    assert(conn.sent.get() == 37)
    assert(conn.flushes.get() == 3) // 16 + 16 + 5
  }

  test("async with exact-multiple input has no trailing empty flush") {
    val conn = new Sinks.RecordingConnection
    Sinks.sendPartition(rows(32), conn, Sinks.Async(16))
    assert(conn.sent.get() == 32)
    assert(conn.flushes.get() == 2)
  }

  test("empty partition sends and flushes nothing in both modes") {
    for (mode <- Seq(Sinks.Sync, Sinks.Async(8))) {
      val conn = new Sinks.RecordingConnection
      Sinks.sendPartition(rows(0), conn, mode)
      assert(conn.sent.get() == 0 && conn.flushes.get() == 0)
    }
  }

  test("foreachBatch end-to-end: both modes deliver the same record count") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sqlCtx = spark.sqlContext
    for (mode <- Seq[Sinks.SendMode](Sinks.Sync, Sinks.Async(8))) {
      val before = Sinks.ConnectionPool.connection.sent.get()
      val in = MemoryStream[Int]
      val q = in.toDF().writeStream
        .outputMode(OutputMode.Append())
        .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
          Sinks.sendBatch(df, id, mode))
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt").toString)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      in.addData(1 to 100: _*)
      q.processAllAvailable()
      q.stop()
      assert(Sinks.ConnectionPool.connection.sent.get() - before == 100L)
    }
  }
}
