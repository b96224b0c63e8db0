package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, Row}

/** Sink-side resource lifecycle — the D4 pattern from the reference
  * (`KafkaSparkStreamingSpec.scala:198-233`: per-partition borrow of a
  * pooled producer inside `foreachRDD → foreachPartition`, factory
  * per-JVM rationale at `kafka/KafkaProducerApp.scala:74-97`).
  *
  * In Structured Streaming the same shape is `foreachBatch` +
  * `foreachPartition`, with the expensive connection held in a per-JVM
  * lazy singleton (one per executor, shared across its partitions) —
  * the modern equivalent of broadcasting an object pool.
  */
object Sinks {

  /** A stand-in "connection" whose open/close/send counts are observable
    * — what a Kafka producer or JDBC connection would be in production.
    */
  final class RecordingConnection {
    val sent = new AtomicLong(0)
    def send(r: Row): Unit = sent.incrementAndGet()
    def flush(): Unit = ()
  }

  /** Per-JVM connection singleton (per-executor in cluster mode). */
  object ConnectionPool {
    val opened = new AtomicLong(0)
    lazy val connection: RecordingConnection = {
      opened.incrementAndGet()
      new RecordingConnection
    }
  }

  /** foreachBatch body: per-partition iteration borrowing the pooled
    * connection — records sent exactly once per row, connection opened
    * at most once per JVM regardless of partition count.
    */
  def sendBatch(df: DataFrame, batchId: Long): Unit =
    df.foreachPartition { (rows: Iterator[Row]) =>
      val conn = ConnectionPool.connection
      rows.foreach(conn.send)
      conn.flush()
    }
}
