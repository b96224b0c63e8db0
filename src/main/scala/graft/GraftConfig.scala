package graft

import java.util.Properties

/** Layered configuration with explicit precedence — the reference's
  * config discipline (`kafka/KafkaProducerApp.scala:31-39`: defaults
  * file ← user config ← constructor args, precedence asserted in
  * `KafkaProducerAppSpec.scala:32-46`).
  *
  * Precedence (highest wins): explicit overrides > classpath properties
  * file > hard defaults. Unknown keys pass through (the reference
  * forwards arbitrary producer properties).
  */
final case class GraftConfig(settings: Map[String, String]) {
  def get(key: String): Option[String] = settings.get(key)
  def apply(key: String): String = settings(key)
  def getOrElse(key: String, default: String): String =
    settings.getOrElse(key, default)
}

object GraftConfig {

  val defaults: Map[String, String] = Map(
    "graft.shuffle.partitions" -> "32",
    "graft.dedup.minhash.k" -> "64",
    "graft.dedup.lsh.bands" -> "16",
    "graft.sim.topk" -> "5",
    "graft.codec.mode" -> "drop-malformed")

  /** Load `graft.properties` from the classpath if present. */
  def fromClasspath(resource: String = "graft.properties"): Map[String, String] = {
    val in = Option(getClass.getClassLoader.getResourceAsStream(resource))
    in.map { stream =>
      try {
        val p = new Properties()
        p.load(stream)
        import scala.jdk.CollectionConverters._
        p.asScala.toMap
      } finally stream.close()
    }.getOrElse(Map.empty)
  }

  /** Layered load: defaults ← classpath file ← explicit overrides. */
  def load(overrides: Map[String, String] = Map.empty,
      resource: String = "graft.properties"): GraftConfig =
    GraftConfig(defaults ++ fromClasspath(resource) ++ overrides)
}
