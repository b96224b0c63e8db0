package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** S1 option-surface coverage: bounded micro-batches via
  * `maxFilesPerTrigger` (the spout max-pending analog) and latest-first
  * start position (the "latest offset" analog). The reference exercises
  * these knobs on its Kafka spout
  * (`KafkaStormDemo.scala:31-57`); here they are asserted on the file
  * source through per-trigger progress.
  */
class RateControlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  /** Stage the documents table as `n` separate parquet files in a fresh
    * dir, oldest-to-newest in `order` (mtimes spaced so latestFirst has
    * an unambiguous order), returning (dir, per-file row counts in
    * write order).
    */
  private def stageSplit(n: Int): (String, Array[Long]) = {
    import java.nio.file._
    val src = spark.read.parquet(s"$sf/documents.parquet")
    val out = Files.createTempDirectory("graft_rate_src")
    val counts = new Array[Long](n)
    for (i <- 0 until n) {
      // uneven split so per-trigger row counts identify the file
      val part = src.where(s"doc_id % $n = $i").limit(20 + 10 * i)
      counts(i) = part.count()
      val tmp = Files.createTempDirectory("graft_rate_part").toString
      part.coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = Files.list(Paths.get(tmp)).toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = out.resolve(f"part_$i%02d.parquet")
      Files.copy(f, dst)
      // strictly increasing mtimes: file i is older than file i+1
      Files.setLastModifiedTime(dst,
        attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    (out.toString, counts)
  }

  test("maxFilesPerTrigger=1 drains in multiple bounded triggers, same final state") {
    val (dir, counts) = stageSplit(4)
    val (finalDf, perTrigger) =
      StreamQueries.rateLimitedWordCount(spark, dir, maxFilesPerTrigger = 1)
    // one non-empty trigger per file — progress is genuinely incremental
    assert(perTrigger.length == 4, perTrigger.mkString(","))
    assert(perTrigger.sorted.sameElements(counts.sorted), perTrigger.mkString(","))
    // rate limiting must not change the answer: final state == batch
    import org.apache.spark.sql.functions._
    val batch = spark.read.parquet(dir)
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .where(col("word") =!= "").groupBy("word").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val streamed = finalDf.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("incremental MV maintenance reconstructs the batch aggregate") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val mv = StreamQueries.streamMvCounts(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = graft.Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(mv == batch)
  }

  test("latestFirst=true consumes the newest file in the first trigger") {
    val (dir, counts) = stageSplit(3)
    val (_, perTrigger) = StreamQueries.rateLimitedWordCount(
      spark, dir, maxFilesPerTrigger = 1, latestFirst = true)
    assert(perTrigger.length == 3, perTrigger.mkString(","))
    // newest file (last written, distinct count) arrives first
    assert(perTrigger.head == counts.last,
      s"first trigger read ${perTrigger.head} rows, newest file has ${counts.last}")
    assert(perTrigger.last == counts.head,
      s"last trigger read ${perTrigger.last} rows, oldest file has ${counts.head}")
  }
}
