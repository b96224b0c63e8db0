package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator
import graft.Tables
import graft.codec.{Tweet, TweetCodec}

/** The reference's flagship end-to-end semantic: an Avro byte stream is
  * decoded, optionally transformed, re-encoded, and written out with
  * content preserved (P4 identity round-trip, asserted at reference
  * `KafkaStormSpec.scala:257-260`, `KafkaSparkStreamingSpec.scala:239-247`).
  *
  * Stages are typed `Dataset` maps — Tungsten keeps rows serialized
  * between them; the codec runs once per row per side with no shuffle
  * (narrow dependencies only), so the pipeline scales linearly with
  * input splits.
  */
object Pipeline {

  /** Tweets derived deterministically from the `events` table — the
    * engine's stand-in for the reference's Kafka input topic.
    */
  def tweetsFromEvents(s: SparkSession, dir: String): Dataset[Tweet] = {
    import s.implicits._
    Tables.events(s, dir)
      .select(
        concat(lit("user_"), $"user_id".cast("string")).as("username"),
        $"props".as("text"),
        expr("ts_ns div 1000000000").as("timestamp"))
      .as[Tweet]
  }

  /** P3 encode: record → Avro binary `value` column (the byte-array
    * message shape of the reference's producers,
    * `kafka/KafkaProducerApp.scala:25-26`).
    */
  def encodeStage(ds: Dataset[Tweet]): Dataset[Array[Byte]] = {
    import ds.sparkSession.implicits._
    ds.map(TweetCodec.encode)
  }

  /** P1 decode with drop-malformed: corrupt rows are counted (A4-style
    * accumulator, reference `KafkaSparkStreamingSpec.scala:194-197`) and
    * dropped, never failing the job (`AvroDecoderBolt.scala:58-77`).
    */
  def decodeStage(ds: Dataset[Array[Byte]],
      corrupt: Option[LongAccumulator] = None): Dataset[Tweet] = {
    import ds.sparkSession.implicits._
    ds.flatMap { bytes =>
      val t = TweetCodec.decode(bytes)
      if (t.isEmpty) corrupt.foreach(_.add(1L))
      t
    }
  }

  /** P2 decode fail-fast (AvroScheme semantics). */
  def decodeFailFast(ds: Dataset[Array[Byte]]): Dataset[Tweet] = {
    import ds.sparkSession.implicits._
    ds.map(TweetCodec.decodeOrThrow)
  }

  /** P4: full identity round-trip — encode then decode reproduces the
    * input records exactly.
    */
  def roundTrip(s: SparkSession, dir: String): DataFrame = {
    val in = tweetsFromEvents(s, dir)
    decodeStage(encodeStage(in)).toDF()
  }

  val roundTripSql: String =
    """SELECT 'user_' || CAST(user_id AS VARCHAR) AS username,
      |  props AS text,
      |  epoch_ns(ts) // 1000000000 AS timestamp
      |FROM events""".stripMargin

  /** P1+P5 corrupt-drop pipeline: a fraction of messages is corrupted in
    * flight (every event_id ≡ 0 mod 10 becomes the reference's canonical
    * bad fixture bytes [1,2,3,4], `AvroDecoderBoltSpec.scala:73-87`);
    * the decoder drops them and the survivors are counted.
    */
  def corruptDrop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val badBytes = Array[Byte](1, 2, 3, 4)
    val withId = Tables.events(s, dir)
      .select($"event_id",
        concat(lit("user_"), $"user_id".cast("string")).as("username"),
        $"props".as("text"),
        expr("ts_ns div 1000000000").as("timestamp"))
    val encoded = withId.map { r =>
      val id = r.getLong(0)
      if (id % 10 == 0) badBytes
      else TweetCodec.encode(Tweet(r.getString(1), r.getString(2), r.getLong(3)))
    }
    decodeStage(encoded).toDF().agg(count(lit(1)).as("survivors"))
  }

  val corruptDropSql: String =
    "SELECT count(*) AS survivors FROM events WHERE event_id % 10 <> 0"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "codec_roundtrip" -> (roundTrip _),
    "codec_corrupt_drop" -> (corruptDrop _))

  def oracles: Map[String, String] = Map(
    "codec_roundtrip" -> roundTripSql,
    "codec_corrupt_drop" -> corruptDropSql)
}
