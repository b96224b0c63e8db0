package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.TestSpark
import graft.codec.{Tweet, TweetCodec}

/** Streaming golden tests mirroring the reference's topology tests:
  * word-count multiset (`StormSpec.scala:63-108`), global running count
  * emissions 1..4 (`StormSpec.scala:104-105`), and the identity
  * round-trip (`KafkaSparkStreamingSpec.scala:239-247`) — with
  * `MemoryStream` standing in for the embedded Kafka cluster.
  */
class StreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpCkpt(): String =
    java.nio.file.Files.createTempDirectory("ckpt").toString

  test("streaming word count, update mode: per-trigger running counts match golden multiset") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = Streams.wordCount(in.toDF())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("wc_running")
      .option("checkpointLocation", tmpCkpt())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    // trigger 1: alice, bob ; trigger 2: joe, alice  (StormSpec fixture)
    in.addData("alice bob")
    q.processAllAvailable()
    in.addData("joe alice")
    q.processAllAvailable()
    val emissions = spark.table("wc_running").collect()
      .map(r => (r.getString(0), r.getLong(1))).toList
    q.stop()
    // update-mode emissions ≈ Storm per-tuple running counts:
    // (alice,1),(bob,1) then (joe,1),(alice,2)
    assert(emissions.groupBy(identity).view.mapValues(_.size).toMap ==
      Map(("alice", 1L) -> 1, ("bob", 1L) -> 1, ("joe", 1L) -> 1, ("alice", 2L) -> 1))
  }

  test("running global count emits 1,2,3,4 for four inputs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = Streams.runningGlobalCount(in.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("global_running")
      .option("checkpointLocation", tmpCkpt())
      .start()
    in.addData("alice", "bob")
    q.processAllAvailable()
    in.addData("joe", "alice")
    q.processAllAvailable()
    val out = spark.table("global_running").collect().map(_.getLong(0)).sorted.toList
    q.stop()
    assert(out == List(1L, 2L, 3L, 4L))
  }

  test("streaming decode round-trip preserves content (identity oracle)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tweets = Seq(
      Tweet("ANY_USER_1", "ANY_TEXT_1", System.currentTimeMillis() / 1000),
      Tweet("ANY_USER_2", "ANY_TEXT_2", 0L),
      Tweet("ANY_USER_3", "ANY_TEXT_3", 1234L))
    val in = MemoryStream[Array[Byte]]
    val q = Streams.decodeStream(in.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("decoded")
      .option("checkpointLocation", tmpCkpt())
      .start()
    in.addData(tweets.map(TweetCodec.encode) :+ Array[Byte](1, 2, 3, 4))
    q.processAllAvailable()
    val out = spark.table("decoded").as[Tweet].collect().toSeq
    q.stop()
    // corrupt record dropped; order preserved within the single partition
    assert(out == tweets)
  }

  test("watermarked windowed counts emit closed windows in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val events = in.toDF().toDF("ts", "event_type")
    val q = Streams.windowedCounts(events, "1 hour", "10 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("windowed")
      .option("checkpointLocation", tmpCkpt())
      .start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    in.addData((ts(1, 5), "click"), (ts(1, 30), "click"), (ts(1, 45), "view"))
    q.processAllAvailable()
    // advance watermark past hour 1 (event at 3:00 => watermark 2:50)
    in.addData((ts(3, 0), "click"))
    q.processAllAvailable()
    val out = spark.table("windowed").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").toString,
        r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(out == Set(
      ("2024-01-01 01:00:00.0", "click", 2L),
      ("2024-01-01 01:00:00.0", "view", 1L)))
  }

  test("observe counter reports rows per trigger (A4 accumulators)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    @volatile var observed = 0L
    val in = MemoryStream[String]
    val counted = Streams.withRecordCounter(in.toDF())
    val q = counted.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("counted")
      .option("checkpointLocation", tmpCkpt())
      .start()
    in.addData("a", "b", "c")
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      val m = p.observedMetrics.get("stats")
      if (m != null) observed += m.getLong(0)
    }
    q.stop()
    assert(observed == 3L)
  }

  test("foreachBatch sink: pooled connection opens once, sends every row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the pool is a JVM-wide singleton shared with other suites (that is
    // the point of it) — assert on deltas, not absolute counts
    val sentBefore = Sinks.ConnectionPool.connection.sent.get()
    val in = MemoryStream[String]
    val q = in.toDF().repartition(4)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        Sinks.sendBatch(df, id))
      .option("checkpointLocation", tmpCkpt())
      .start()
    in.addData((1 to 100).map(i => s"msg$i"): _*)
    q.processAllAvailable()
    q.stop()
    // local mode = one JVM: exactly one connection, all rows sent
    assert(Sinks.ConnectionPool.opened.get() == 1L)
    assert(Sinks.ConnectionPool.connection.sent.get() - sentBefore == 100L)
  }

  test("streaming HLL register table finalizes bit-identically to the batch sketch") {
    val sf = graft.TestSpark.sf
    val stream = StreamQueries.streamHllUsers(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val batch = graft.operators.Sketches.hllUsers(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(stream == batch, "max-merge across micro-batches must equal the one-shot sketch")
  }

  test("streaming IVF-PQ ingest drains to the batch cell histogram and code checksums") {
    import org.apache.spark.sql.functions.col
    val sf = graft.TestSpark.sf
    val Sim = graft.operators.Similarity
    val streamed = StreamQueries.streamIvfPqIngest(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // batch truth from the SAME memoized artifacts: coarse cell via the
    // driver-side kernel, codes via the native encoder expression
    import spark.implicits._
    val cents = Sim.ivfCentroids(spark, sf)
    val cbs = Sim.pqCodebooks(spark, sf)
    val bc = spark.sparkContext.broadcast(cents)
    val batch = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        graft.functions.PqEncode.pq_encode(col("embedding"), cbs).as("codes"))
      .as[(Long, Array[Float], Array[Int])].collect()
      .map { case (_, emb, codes) =>
        val cell = Sim.nearestCentroidOf(emb, bc.value)
        val csum = codes.zip(Sim.PqChecksumMults).map {
          case (c, m) => c.toLong * m
        }.sum
        (cell, csum)
      }
      .groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    assert(streamed == batch,
      "drained ingest state must equal one batch pass over the collection")
    assert(streamed.values.map(_._1).sum ==
      graft.Tables.embeddings(spark, sf).count())
  }
}
