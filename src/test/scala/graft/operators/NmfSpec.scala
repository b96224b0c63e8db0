package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** NMF: the registered query must EXACTLY equal an independent Scala
  * replay of the whole pipeline (tokenize → rational-idf V → hash init
  * → 4 Lee–Seung rounds with the identical 9-dp floor discipline), and
  * on a corpus planted with two disjoint vocabularies the factorization
  * must recover them as separate topics.
  */
class NmfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def r9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Driver-side replay with the identical arithmetic contract. */
  private def reference(docs: Seq[(Long, String)], nDocs: Long)
      : Map[(Long, String), Double] = {
    val k = Nmf.Topics
    val tf = docs.flatMap { case (id, text) =>
      text.toLowerCase.split("\\W+").filter(_.nonEmpty).map(w => (id, w))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val dfreq = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val vocab = dfreq.toSeq.sortBy { case (w, d) => (-d, w) }
      .take(Nmf.VocabSize).map(_._1)
    val vset = vocab.toSet
    val v = tf.collect { case ((d, w), t) if vset(w) =>
      (d, w) -> r6(t * (nDocs.toDouble - dfreq(w) + 0.5) / (dfreq(w) + 0.5))
    }.toMap
    val docIds = v.keys.map(_._1).toSeq.distinct.sorted
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    var h: Map[(Int, String), Double] = (for {
      t <- 1 to k; w <- vocab
    } yield (t, w) ->
      (1 + (java.lang.Long.parseLong(md5hex(s"nmf:$t:$w").take(15), 16)
        % 1000) / 1000.0)).toMap
    var w: Map[(Long, Int), Double] =
      (for { d <- docIds; t <- 1 to k } yield (d, t) -> 1.0).toMap
    def dsum(xs: Iterable[Double]): Double =
      xs.map(BigDecimal(_)).foldLeft(BigDecimal(0))(_ + _).toDouble
    for (_ <- 1 to Nmf.NmfIters) {
      val nh = (for { t <- 1 to k; wd <- vocab } yield (t, wd) ->
        dsum(docIds.flatMap(d => v.get((d, wd))
          .map(vv => r9(w((d, t)) * vv))))).toMap
      val g = (for { t <- 1 to k; u <- 1 to k } yield (t, u) ->
        dsum(docIds.map(d => r9(w((d, t)) * w((d, u)))))).toMap
      h = (for { t <- 1 to k; wd <- vocab } yield {
        val den = (1 to k).map(u => g((t, u)) * h((u, wd)))
          .foldLeft(0.0)(_ + _)
        (t, wd) -> (if (den == 0) 0.0 else r9(h((t, wd)) * nh((t, wd)) / den))
      }).toMap
      val nw = (for { d <- docIds; t <- 1 to k } yield (d, t) ->
        dsum(vocab.flatMap(wd => v.get((d, wd))
          .map(vv => r9(vv * h((t, wd))))))).toMap
      val q = (for { t <- 1 to k; u <- 1 to k } yield (t, u) ->
        dsum(vocab.map(wd => r9(h((t, wd)) * h((u, wd)))))).toMap
      w = (for { d <- docIds; t <- 1 to k } yield {
        val den = (1 to k).map(u => q((t, u)) * w((d, u)))
          .foldLeft(0.0)(_ + _)
        (d, t) -> (if (den == 0) 0.0 else r9(w((d, t)) * nw((d, t)) / den))
      }).toMap
    }
    val cells = h.toSeq.collect { case ((t, wd), x) if x > 0 =>
      (t.toLong, wd, x) }
    cells.groupBy(_._1).flatMap { case (t, cs) =>
      cs.sortBy { case (_, wd, x) => (-x, wd) }.take(6)
        .map { case (_, wd, x) => (t, wd) -> x }
    }.toMap
  }

  test("query equals the independent replay exactly on the fixture") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toSeq
    val got = Nmf.nmfTopics(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val want = reference(docs, docs.length.toLong)
    assert(got == want)
    assert(got.nonEmpty)
    assert(got.values.forall(_ > 0))
  }

  test("planted disjoint vocabularies separate into topics") {
    import spark.implicits._
    val aWords = Seq("apple", "banana", "cherry", "date")
    val bWords = Seq("wrench", "hammer", "pliers", "saw")
    // distinct doc lengths break symmetry within each group
    val texts =
      (0 until 12).map(i => aWords.take(2 + i % 3).mkString(" ")) ++
        (0 until 12).map(i => bWords.take(2 + i % 3).mkString(" "))
    val tmp = java.nio.file.Files.createTempDirectory("nmf").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "spec") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Nmf.nmfTopics(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val topTermByTopic = rows.groupBy(_._1).view.mapValues(cs =>
      cs.maxBy(c => (c._3, c._2))._2).toMap
    val aSet = aWords.toSet; val bSet = bWords.toSet
    // at least one topic leads with an A-word and one with a B-word
    assert(topTermByTopic.values.exists(aSet),
      s"no A topic in $topTermByTopic")
    assert(topTermByTopic.values.exists(bSet),
      s"no B topic in $topTermByTopic")
  }
}
