package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The scale-point generator's invariants, in-suite (SCALING.md's 10×
  * evidence ran these checks manually; this keeps them repeatable):
  * a replica must be a LARGER instance of the same schema — exact row
  * multiples, intact foreign keys, dimensions untouched, duplicate-text
  * clusters grown by the factor.
  */
class ScaleUpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("3x replica: row multiples, zero FK orphans, dims 1x, dup clusters grown") {
    val in = TestSpark.sf
    val out = java.nio.file.Files.createTempDirectory("graft_scaleup").toString
    ScaleUp.run(spark, in, out, 3)

    def cnt(dir: String, t: String): Long =
      spark.read.parquet(s"$dir/$t.parquet").count()
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(cnt(out, t) == 3 * cnt(in, t), s"$t not exactly 3x")
    for (t <- Seq("region", "nation"))
      assert(cnt(out, t) == cnt(in, t), s"dimension $t must stay 1x")

    // FK integrity on the replica through the registry's own audit
    val orphans = graft.operators.DataQuality.dqReferential(spark, out)
      .collect()
    assert(orphans.nonEmpty)
    orphans.foreach { r =>
      assert(r.getAs[Long]("n_orphan_rows") == 0L,
        s"${r.getAs[String]("fk_edge")}: key offsets broke the FK")
    }

    // duplicate-text clusters grow by the factor: distinct texts stay
    // constant while rows triple
    import org.apache.spark.sql.functions._
    val dIn = spark.read.parquet(s"$in/documents.parquet")
      .agg(countDistinct(col("text"))).collect()(0).getLong(0)
    val dOut = spark.read.parquet(s"$out/documents.parquet")
      .agg(countDistinct(col("text"))).collect()(0).getLong(0)
    assert(dOut == dIn, "replication must not invent new text content")
  }
}
