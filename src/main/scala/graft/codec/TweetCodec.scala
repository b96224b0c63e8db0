package graft.codec

import java.io.ByteArrayOutputStream
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

/** The one record type in the reference: `Tweet{username, text, timestamp}`
  * (reference `src/main/avro/twitter.avsc:1-19`; timestamp is Unix epoch
  * seconds per `twitter.avsc:14-16`).
  */
case class Tweet(username: String, text: String, timestamp: Long)

/** Avro binary codec for [[Tweet]] — the engine equivalent of the
  * reference's Bijection `Injection[Tweet, Array[Byte]]`
  * (`SpecificAvroCodecs.toBinary[T]` at reference
  * `storm/bolts/AvroDecoderBolt.scala:54-55`,
  * `storm/serialization/AvroScheme.scala:47`,
  * `storm/bolts/AvroKafkaSinkBolt.scala:49-50`).
  *
  * The reference generates a `SpecificRecordBase` subclass at build time;
  * without the spark-avro module in this environment we drive the same
  * wire format through `GenericRecord` against a parsed schema — the
  * bytes are identical (Avro binary encoding is schema-determined).
  *
  * Thread-safety at scale: `DatumWriter/Reader` and the factory-built
  * encoder/decoder carry per-call mutable state, so each executor thread
  * gets its own via `ThreadLocal` (the per-JVM-instance pattern the
  * reference uses for its producers, `kafka/KafkaProducerApp.scala:74-97`).
  * Schema parsing happens once per JVM.
  */
object TweetCodec extends Serializable {

  val schemaJson: String =
    """{"type":"record","name":"Tweet","namespace":"graft.codec","fields":[
      |  {"name":"username","type":"string"},
      |  {"name":"text","type":"string"},
      |  {"name":"timestamp","type":"long"}
      |]}""".stripMargin

  @transient lazy val schema: Schema = new Schema.Parser().parse(schemaJson)

  @transient private lazy val writer =
    new ThreadLocal[GenericDatumWriter[GenericRecord]] {
      override def initialValue() = new GenericDatumWriter[GenericRecord](schema)
    }
  @transient private lazy val reader =
    new ThreadLocal[GenericDatumReader[GenericRecord]] {
      override def initialValue() = new GenericDatumReader[GenericRecord](schema)
    }

  /** record → Avro binary (P3 in SURVEY.md §2.2). */
  def encode(t: Tweet): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    val enc = EncoderFactory.get().directBinaryEncoder(out, null)
    val rec = new GenericData.Record(schema)
    rec.put("username", t.username)
    rec.put("text", t.text)
    rec.put("timestamp", t.timestamp)
    writer.get().write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** bytes → record, or None on null/corrupt input.
    *
    * P1 semantics (reference `storm/bolts/AvroDecoderBolt.scala:58-77`):
    * bad input never fails the job — it is logged/counted and dropped.
    */
  def decode(bytes: Array[Byte]): Option[Tweet] =
    if (bytes == null) None
    else try {
      val dec = DecoderFactory.get().binaryDecoder(bytes, null)
      val rec = reader.get().read(null, dec)
      if (!dec.isEnd) None // trailing garbage → corrupt
      else Some(Tweet(rec.get("username").toString, rec.get("text").toString,
        rec.get("timestamp").asInstanceOf[Long]))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** bytes → record, throwing on corrupt input.
    *
    * P2 semantics (reference `storm/serialization/AvroScheme.scala:35-80`):
    * deserialize-on-read fails fast with this exact message
    * (`AvroSchemeSpec.scala:64-78`).
    */
  def decodeOrThrow(bytes: Array[Byte]): Tweet =
    decode(bytes).getOrElse(
      throw new RuntimeException("Could not decode input bytes"))
}
