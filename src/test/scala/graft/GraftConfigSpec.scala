package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's config precedence tests
  * (`KafkaProducerAppSpec.scala:32-46`: user config overrides defaults;
  * defaults hold when unset; pass-through of unknown keys).
  */
class GraftConfigSpec extends AnyFunSuite {

  test("defaults hold when nothing overrides them") {
    val c = GraftConfig.load()
    assert(c("graft.dedup.minhash.k") == "64")
  }

  test("classpath file layer overrides hard defaults") {
    val c = GraftConfig.load()
    assert(c("graft.file.layer") == "classpath")
  }

  test("explicit overrides beat file and defaults") {
    val c = GraftConfig.load(Map(
      "graft.shuffle.partitions" -> "64",
      "graft.file.layer" -> "override"))
    assert(c("graft.shuffle.partitions") == "64")
    assert(c("graft.file.layer") == "override")
  }

  test("unknown keys pass through") {
    val c = GraftConfig.load(Map("custom.anything" -> "yes"))
    assert(c("custom.anything") == "yes")
  }

  test("missing key behavior: Option None / getOrElse default") {
    val c = GraftConfig.load()
    assert(c.get("nope").isEmpty)
    assert(c.getOrElse("nope", "fallback") == "fallback")
  }
}
