package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Mirrors the reference's codec test surface:
  * round-trip equality (`AvroSchemeSpec.scala:47-62`),
  * corrupt-input behavior (`AvroDecoderBoltSpec.scala:73-87`,
  * `AvroSchemeSpec.scala:64-78`), null-input drop
  * (`AvroDecoderBoltSpec.scala:89-102`), plus ScalaCheck round-trip
  * properties (an upgrade over the reference's example-only tests).
  */
class TweetCodecSpec extends AnyFunSuite {

  /** Canonical fixture: boundary timestamps now / 0 / 1234
    * (reference `KafkaStormSpec.scala:51-63`).
    */
  val fixture = Seq(
    Tweet("ANY_USER_1", "ANY_TEXT_1", System.currentTimeMillis() / 1000),
    Tweet("ANY_USER_2", "ANY_TEXT_2", 0L),
    Tweet("ANY_USER_3", "ANY_TEXT_3", 1234L))

  test("round-trip identity on the canonical fixture") {
    val out = fixture.map(t => TweetCodec.decode(TweetCodec.encode(t)))
    assert(out == fixture.map(Some(_)))
  }

  test("corrupt bytes [1,2,3,4] are dropped (decode => None)") {
    assert(TweetCodec.decode(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("null input is dropped (decode => None)") {
    assert(TweetCodec.decode(null).isEmpty)
  }

  test("fail-fast mode throws 'Could not decode input bytes' on corrupt input") {
    val e = intercept[RuntimeException] {
      TweetCodec.decodeOrThrow(Array[Byte](1, 2, 3, 4))
    }
    assert(e.getMessage == "Could not decode input bytes")
  }

  test("fail-fast mode passes good input through") {
    assert(TweetCodec.decodeOrThrow(TweetCodec.encode(fixture.head)) == fixture.head)
  }

  test("property: encode/decode round-trips arbitrary tweets") {
    val genTweet = for {
      u <- Gen.alphaNumStr
      x <- Gen.asciiPrintableStr
      ts <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield Tweet(u, x, ts)
    Iterator.continually(genTweet.sample).flatten.take(300).foreach { t =>
      assert(TweetCodec.decode(TweetCodec.encode(t)).contains(t))
    }
  }

  test("trailing garbage after a valid record is corrupt") {
    val good = TweetCodec.encode(fixture.head)
    assert(TweetCodec.decode(good ++ Array[Byte](7, 7)).isEmpty)
  }
}
