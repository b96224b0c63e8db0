package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark

/** Durability semantics: checkpoint recovery is exactly-once to an
  * idempotent (file) sink — strictly stronger than the reference's
  * at-most-once (SURVEY.md §2.6 "delivery semantics").
  */
class RecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("restart from checkpoint: no loss, no duplicates in the file sink") {
    import spark.implicits._
    val ckpt = graft.TempDirs.scoped("rec_ckpt")
    val out = graft.TempDirs.scoped("rec_out")
    val src = graft.TempDirs.scoped("rec_src")
    // file source records processed files in the checkpoint — the
    // restartable source shape (MemoryStream offsets don't survive a
    // new query instance)
    (1L to 100L).toDF("v").coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema

    val q1 = spark.readStream.schema(schema).parquet(src)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    q1.processAllAvailable()
    q1.stop()

    (101L to 150L).toDF("v").coalesce(1).write.mode("append").parquet(src)
    val q2 = spark.readStream.schema(schema).parquet(src)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    q2.processAllAvailable()
    q2.stop()

    val vs = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    assert(vs.length == 150, s"expected 150 exactly-once rows, got ${vs.length}")
    assert(vs.toSeq == (1L to 150L))
  }

  test("schema evolution: mergeSchema unions columns across files") {
    import spark.implicits._
    val dir = graft.TempDirs.scoped("schema_evo")
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/p=1")
    Seq((2L, 9.5)).toDF("id", "v2").write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "v1", "v2", "p"))
    assert(merged.count() == 2)
    val row1 = merged.filter($"id" === 1L).collect()(0)
    assert(row1.getAs[String]("v1") == "a" && row1.isNullAt(row1.fieldIndex("v2")))
  }
}
