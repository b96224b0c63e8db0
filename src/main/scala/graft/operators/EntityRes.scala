package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Entity-resolution blocking — the THIRD candidate-generation class
  * next to the inverted-index posting joins ([[Dedup]]/
  * [[InvertedIndex]], df-capped equi-joins on shared tokens) and the
  * hash-bucket sketch joins (MinHash bands, SimHash chunks, pHash
  * multi-index): SORTED NEIGHBORHOOD (Hernández & Stolfo, SIGMOD '95).
  * Records sort by a normalized blocking key; every pair within a
  * fixed-width window of the sorted order is a candidate; an exact
  * verifier keeps real matches. Its niche is near-keys that share NO
  * token or bucket (typos in every word) yet still sort adjacently —
  * the case both other classes structurally miss.
  *
  * Scale design: the global sort rank is [[Scans.segmentedRowNumber]]
  * (the segmented two-pass scan — no single-partition window),
  * sharded on an order-monotone 4-byte prefix pack of the blocking key
  * (codepoints clamped to 255, so the pack stays monotone — merely
  * coarser — on non-ASCII); window pairing is an EQUI-join of each
  * rank against its next W−1 ranks (explode of a W−1-element
  * sequence — never a range join); verification is row-local trigram
  * Jaccard over per-doc gram sets computed ONCE before pairing. Work:
  * n·(W−1) candidate rows at full cluster width.
  */
object EntityRes {

  /** Sorted-neighborhood window width (pairs at rank gap < W). */
  val ErWindow = 5

  /** Verifier threshold — mirrored verbatim in the oracle. */
  val ErJaccThresh = 0.2

  private def gramsOf(t: String): String =
    s"""array_distinct(transform(
       |  sequence(1, size($t) - 2),
       |  i -> concat_ws(' ', $t[i-1], $t[i], $t[i+1])))""".stripMargin

  def erSortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keyed = Tables.documents(s, dir)
      .selectExpr("doc_id",
        "substring(trim(regexp_replace(lower(text), '\\\\s+', ' ')), 1, 24) AS bkey",
        "filter(split(lower(text), '\\\\s+'), t -> t <> '') AS tk")
      .where("size(tk) >= 3")
      .selectExpr("doc_id", "bkey", s"${gramsOf("tk")} AS gs")
      .withColumn("__pack",
        expr("""least(ascii(substring(bkey, 1, 1)), 255) * 16777216L
               | + least(ascii(substring(bkey, 2, 1)), 255) * 65536L
               | + least(ascii(substring(bkey, 3, 1)), 255) * 256L
               | + least(ascii(substring(bkey, 4, 1)), 255)""".stripMargin))
    val ranked = Scans.segmentedRowNumber(
      Scans.shardByRange(keyed, $"__pack"), "__shard",
      Seq($"bkey", $"doc_id"), "rnk")
      .select($"doc_id", $"gs", $"rnk")
    val probes = ranked.select($"doc_id".as("id_a"), $"gs".as("ga"),
        explode(sequence(lit(1L), lit((ErWindow - 1).toLong))).as("__k"), $"rnk")
      .select($"id_a", $"ga", ($"rnk" + $"__k").as("rnk"))
    probes
      .join(ranked.select($"doc_id".as("id_b"), $"gs".as("gb"), $"rnk"), "rnk")
      .selectExpr("least(id_a, id_b) AS doc_a", "greatest(id_a, id_b) AS doc_b",
        """floor(CAST(size(array_intersect(ga, gb)) AS DOUBLE)
          |  / (size(ga) + size(gb) - size(array_intersect(ga, gb)))
          |  * 1e6 + 0.5) / 1e6 AS jaccard""".stripMargin)
      .where(col("jaccard") >= ErJaccThresh)
  }

  val erSortedNeighborhoodSql: String =
    s"""WITH keyed AS (
       |  SELECT doc_id,
       |    substring(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 24)
       |      AS bkey,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      t -> t <> '') AS tk
       |  FROM documents),
       |grammed AS (
       |  SELECT doc_id, bkey,
       |    list_distinct(list_transform(range(1, len(tk) - 1),
       |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gs
       |  FROM keyed WHERE len(tk) >= 3),
       |ranked AS (
       |  SELECT doc_id, gs,
       |    row_number() OVER (ORDER BY bkey, doc_id) AS rnk
       |  FROM grammed),
       |scored AS (
       |  SELECT least(a.doc_id, b.doc_id) AS doc_a,
       |    greatest(a.doc_id, b.doc_id) AS doc_b,
       |    floor(CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
       |      / (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs)))
       |      * 1e6 + 0.5) / 1e6 AS jaccard
       |  FROM ranked a JOIN ranked b
       |    ON b.rnk - a.rnk BETWEEN 1 AND ${ErWindow - 1})
       |SELECT doc_a, doc_b, jaccard
       |FROM scored
       |WHERE jaccard >= $ErJaccThresh""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_sorted_neighborhood" -> (erSortedNeighborhood _))

  def oracles: Map[String, String] = Map(
    "er_sorted_neighborhood" -> erSortedNeighborhoodSql)
}
