package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{ForeachWriter, Row}
import graft.TestSpark

/** The per-row sink API with an explicit open/process/close lifecycle —
  * the closest Structured Streaming analog of the reference's
  * `AvroKafkaSinkBolt` (connection prepared per task, rows sent one by
  * one, terminal operator; reference `storm/bolts/AvroKafkaSinkBolt
  * .scala:32-73`).
  */
object CountingWriterState {
  val opened = new AtomicLong(0)
  val processed = new AtomicLong(0)
  val closed = new AtomicLong(0)
}

class ForeachWriterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ForeachWriter: open per partition-epoch, every row processed, close always called") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val writer = new ForeachWriter[Row] {
      def open(partitionId: Long, epochId: Long): Boolean = {
        CountingWriterState.opened.incrementAndGet(); true
      }
      def process(value: Row): Unit =
        CountingWriterState.processed.incrementAndGet()
      def close(errorOrNull: Throwable): Unit = {
        CountingWriterState.closed.incrementAndGet(); ()
      }
    }
    val q = in.toDF().repartition(4)
      .writeStream.foreach(writer)
      .option("checkpointLocation",
        graft.TempDirs.scoped("fw_ckpt"))
      .start()
    in.addData((1 to 40).map(i => s"m$i"): _*)
    q.processAllAvailable()
    q.stop()
    assert(CountingWriterState.processed.get() == 40L)
    // one open+close per partition per epoch; 4 partitions, 1 epoch
    assert(CountingWriterState.opened.get() == CountingWriterState.closed.get())
    assert(CountingWriterState.opened.get() >= 4L)
  }
}
