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

  /** A stand-in "connection" whose open/send/flush counts are observable
    * — what a Kafka producer or JDBC connection would be in production.
    */
  final class RecordingConnection {
    val sent = new AtomicLong(0)
    val flushes = new AtomicLong(0)
    def send(r: Row): Unit = sent.incrementAndGet()
    def flush(): Unit = flushes.incrementAndGet()
  }

  /** Producer send modes — the reference's sync vs async producer types
    * (`/root/reference/src/main/scala/com/miguno/kafkastorm/kafka/KafkaProducerApp.scala:40-72`,
    * exercised in `KafkaSpec.scala:51-140`):
    *
    *   - [[Sync]]: send + flush per record — every record is durable
    *     before the next is produced (the `producer.type=sync` analog;
    *     lowest loss window, one round trip per record).
    *   - [[Async]]: buffer up to `batchSize` records per flush (the
    *     `batch.num.messages` analog; highest throughput, records in
    *     the current buffer ride on task retry semantics).
    *
    * Both deliver every record exactly once per attempt; only the flush
    * cadence differs — asserted in SendModeSpec.
    */
  sealed trait SendMode
  case object Sync extends SendMode
  final case class Async(batchSize: Int) extends SendMode {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
  }

  /** Drain one partition into `conn` under the given send mode. */
  def sendPartition(rows: Iterator[Row], conn: RecordingConnection,
      mode: SendMode): Unit = mode match {
    case Sync =>
      rows.foreach { r => conn.send(r); conn.flush() }
    case Async(n) =>
      // Long: with Async(Int.MaxValue) an Int counter overflows negative
      // past 2^31 rows — the threshold never fires and the trailing
      // flush is skipped, leaving sent records unflushed
      var buffered = 0L
      rows.foreach { r =>
        conn.send(r)
        buffered += 1
        if (buffered >= n.toLong) { conn.flush(); buffered = 0 }
      }
      if (buffered > 0) conn.flush()
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
    * at most once per JVM regardless of partition count. Default mode
    * batches the whole partition per flush (async with an unbounded
    * buffer was round 1's behavior; a bounded Async(n) caps the loss
    * window like the reference's queue.buffering knobs).
    */
  def sendBatch(df: DataFrame, batchId: Long,
      mode: SendMode = Async(Int.MaxValue)): Unit =
    df.foreachPartition { (rows: Iterator[Row]) =>
      sendPartition(rows, ConnectionPool.connection, mode)
    }
}
