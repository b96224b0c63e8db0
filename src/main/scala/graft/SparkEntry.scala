package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each module under graft.operators contributes a map of named queries
  * `(SparkSession, sfDir) => DataFrame` plus, where the semantics are
  * ANSI-SQL-expressible, an equivalent DuckDB oracle SQL (column names
  * aliased identically on both sides — the driver sorts columns by name
  * before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Relational3.queries ++
      Relational4.queries ++
      TextOps.queries ++ Bpe.queries ++ Unigram.queries ++ LogReg.queries ++
      DocCluster.queries ++ Nmf.queries ++
      EventOps.queries ++ TimeSeries.queries ++ TimeSeries2.queries ++
      Pipeline.queries ++ Dedup.queries ++ InvertedIndex.queries ++
      Similarity.queries ++
      KMeans.queries ++ Jl.queries ++ SemDedup.queries ++ NnDescent.queries ++
      Curation.queries ++
      Multimodal.queries ++ AsOfJoin.queries ++ RangeJoin.queries ++
      Skew.queries ++ DataQuality.queries ++ Sketches.queries ++
      EntityRes.queries ++
      Graph.queries ++ Layout.queries ++ Pca.queries ++
      graft.plans.TopKPerKey.queries ++ graft.plans.AsOfMergeJoin.queries ++
      graft.sources.FileSources.queries ++
      graft.streaming.StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Sketch oracles (LSH planes, IVF centroids, PQ codebooks, SimHash
    * chunk shape) embed parameters derived from the collection at `dir`,
    * so the dir is threaded explicitly — Verify passes the sfDir it ran
    * the queries against.
    */
  def oracleSqlFor(dir: String): Map[String, String] =
    Relational.oracles ++ Relational2.oracles ++ Relational3.oracles ++
      Relational4.oracles ++
      TextOps.oracles(dir) ++ Bpe.oracles ++ Unigram.oracles(dir) ++ LogReg.oracles ++
      DocCluster.oracles ++ Nmf.oracles ++
      EventOps.oracles ++ TimeSeries.oracles ++ TimeSeries2.oracles ++
      Pipeline.oracles ++ Dedup.oracles(dir) ++ InvertedIndex.oracles ++
      Similarity.oracles(dir) ++
      KMeans.oracles ++ Jl.oracles ++ SemDedup.oracles ++ NnDescent.oracles ++
      Curation.oracles ++
      Multimodal.oracles ++ AsOfJoin.oracles ++ RangeJoin.oracles ++
      Skew.oracles ++ DataQuality.oracles ++ Sketches.oracles ++
      EntityRes.oracles ++
      Graph.oracles ++ Layout.oracles ++ Pca.oracles ++
      graft.plans.TopKPerKey.oracles ++ graft.plans.AsOfMergeJoin.oracles ++
      graft.sources.FileSources.oracles ++
      graft.streaming.StreamQueries.oracles(dir)

  /** Contract alias at the driver's verify SF. */
  def oracleSql: Map[String, String] =
    oracleSqlFor(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
}
