package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** q_assoc_rules — directed confidence over the co-purchase baskets.
  * The planted corpus pins the property the symmetric pair table can't
  * express: A→B and B→A keep/drop INDEPENDENTLY when the antecedent
  * frequencies differ.
  */
class AssocRulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("directionality: the rare antecedent's rule outranks the common one's") {
    import spark.implicits._
    // baskets: 1{A,B} 2{A,B} 3{A} 4{A} 5{A}  (A=101, B=202)
    // A in 5 baskets, B in 2, support(A,B)=2, n_baskets=5
    // B→A conf 2/2 = 1.0 → rank 1;  A→B conf 2/5 = 0.4 → rank 2
    // lift (direction-free) = 2·5/(5·2) = 1.0
    val rows = Seq(
      (1L, 101L), (1L, 202L),
      (2L, 101L), (2L, 202L),
      (3L, 101L), (4L, 101L), (5L, 101L),
      // duplicate line in a basket must not inflate support (distinct)
      (2L, 101L))
    val tmp = java.nio.file.Files.createTempDirectory("assoc").toString
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational3.qAssocRules(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    assert(out.keySet == Set((202L, 101L), (101L, 202L)), s"rules: $out")
    assert(out((202L, 101L)) == (2L, 1.0, 1.0, 1L), s"${out((202L, 101L))}")
    assert(out((101L, 202L)) == (2L, 0.4, 1.0, 2L), s"${out((101L, 202L))}")
  }

  test("frequent triples: Apriori prune finds exactly the repeated triple") {
    import spark.implicits._
    // baskets 1,2 both hold {3,5,9} → triple (3,5,9) support 2;
    // basket 3 holds {3,5,7}: pairs (3,5) frequent but triple (3,5,7)
    // appears once → dropped; item 11 rides one basket only
    val rows = Seq(
      (1L, 3L), (1L, 5L), (1L, 9L), (1L, 11L),
      (2L, 3L), (2L, 5L), (2L, 9L),
      (3L, 3L), (3L, 5L), (3L, 7L))
    val tmp = java.nio.file.Files.createTempDirectory("tri").toString
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational3.qFrequentTriples(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(out == Map((3L, 5L, 9L) -> 2L), s"triples: $out")
  }

  test("symmetric frequencies tie on confidence; rank breaks by antecedent") {
    import spark.implicits._
    // 1{A,B} 2{A,B} 3{A} 4{B}: A=3, B=3, support=2, n=4
    // conf both ways 2/3 → 0.666667; lift 2·4/9 = 0.888889
    val rows = Seq((1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L), (3L, 7L), (4L, 8L))
    val tmp = java.nio.file.Files.createTempDirectory("assoc2").toString
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Relational3.qAssocRules(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    assert(out.keySet == Set((7L, 8L), (8L, 7L)), s"rules: $out")
    assert(out((7L, 8L)) == (2L, 0.666667, 0.888889, 1L))
    assert(out((8L, 7L)) == (2L, 0.666667, 0.888889, 2L))
  }
}
