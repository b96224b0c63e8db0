package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md).
  *
  * Schema is fixed/known at compile time — mirroring the reference's
  * compile-time Avro schema discipline (reference `build.sbt:7-15`,
  * `src/main/avro/twitter.avsc`) — so no runtime inference is needed;
  * parquet footers carry the schema and Catalyst prunes columns at scan.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read it as a raw long (`ts_ns`) and derive a µs
    * `ts` column. Range predicates should hit `ts_ns` (plain int64
    * comparison → pushed to the scan + row-group min/max pruning);
    * `ts` is for grouping/formatting only — a cast never pushes down.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts_ns div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Cheap content fingerprint of `$dir/$name.parquet` (file or
    * directory tree): folds every file's path, size, and mtime. Used to
    * key the per-dir parameter memos (LSH plane counts, IVF centroids,
    * PQ codebooks, SimHash chunk shape) so that rewriting a fixture path
    * within one JVM invalidates the derived parameters instead of
    * silently reusing the old data's — a driver-side metadata walk, no
    * data read.
    */
  def fingerprint(dir: String, name: String): String =
    fingerprintPath(s"$dir/$name.parquet")

  def fingerprintPath(path: String): String = {
    def fold(f: java.io.File, acc: Long): Long =
      if (f.isDirectory) {
        // listFiles() returns null (not empty) on IO/permission errors —
        // fold a distinct marker so an unreadable dir never fingerprints
        // equal to an empty one
        val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        val withCount = acc * 1000003L ^ (kids.length + 1).toLong
        kids.sortBy(_.getName).foldLeft(withCount)((a, c) => fold(c, a))
      } else {
        // nanosecond mtime where the filesystem provides it: a same-length
        // rewrite within one coarse-mtime tick must still change the print
        val mtimeNanos =
          try java.nio.file.Files.getLastModifiedTime(f.toPath)
            .to(java.util.concurrent.TimeUnit.NANOSECONDS)
          catch { case _: java.io.IOException => f.lastModified() }
        var h = acc
        h = h * 1000003L ^ f.getPath.hashCode.toLong
        h = h * 1000003L ^ f.length()
        h = h * 1000003L ^ mtimeNanos
        h
      }
    val root = new java.io.File(path)
    if (!root.exists()) "absent"
    else java.lang.Long.toHexString(fold(root, 0xcbf29ce484222325L))
  }
}
