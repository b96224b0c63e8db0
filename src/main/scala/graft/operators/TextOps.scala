package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Word-count family and text analysis over the `documents` table.
  *
  * The word count reproduces the reference's Storm test-topology
  * semantics (reference
  * `src/test/scala/com/miguno/kafkastorm/integration/StormSpec.scala:43-109`:
  * per-word counts after `fieldsGrouping("word")`, final state
  * alice→2, bob→1, joe→1). `fieldsGrouping` ≈ the hash shuffle that
  * `groupBy("word")` implies; partial (map-side) aggregation means the
  * shuffle carries one row per distinct word per partition — at 100 TB
  * the shuffle volume is bounded by vocabulary size × partitions, not
  * by corpus size.
  */
object TextOps {

  /** Tokenize: lowercase, split on non-word runs, drop empties.
    * explode() is Spark's built-in Generator — the one generator-shaped
    * op the capability set needs (SURVEY.md §2.7).
    */
  def tokens(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      explode(split(lower(col("text")), "\\W+")).as("word"))
      .filter(length(col("word")) > 0)

  /** A1/batch: per-word counts (final state of the running count). */
  def wordCount(s: SparkSession, dir: String): DataFrame =
    tokens(Tables.documents(s, dir))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  val wordCountSql: String =
    """SELECT word, count(*) AS cnt
      |FROM (SELECT unnest(regexp_split_to_array(lower(text), '\W+')) AS word
      |      FROM documents)
      |WHERE word <> ''
      |GROUP BY word""".stripMargin

  /** A2: global record count (Storm `globalGrouping` → single total).
    * In Spark a global agg is a partial count per partition + a 1-row
    * final reduce — the all-to-one shuffle moves #partitions rows.
    */
  def globalCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).agg(count(lit(1)).as("total"))

  val globalCountSql: String = "SELECT count(*) AS total FROM documents"

  /** A3: aggregates-of-aggregates — count of distinct words (an agg over
    * the word-count stream's final state).
    */
  def aggOfAgg(s: SparkSession, dir: String): DataFrame =
    wordCount(s, dir).agg(count(lit(1)).as("distinct_words"))

  val aggOfAggSql: String =
    """SELECT count(*) AS distinct_words FROM (
      |  SELECT word FROM (
      |    SELECT unnest(regexp_split_to_array(lower(text), '\W+')) AS word
      |    FROM documents)
      |  WHERE word <> '' GROUP BY word)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wordcount" -> (wordCount _),
    "global_count" -> (globalCount _),
    "agg_of_agg" -> (aggOfAgg _))

  def oracles: Map[String, String] = Map(
    "wordcount" -> wordCountSql,
    "global_count" -> globalCountSql,
    "agg_of_agg" -> aggOfAggSql)
}
