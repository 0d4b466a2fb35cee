package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.{Corpus, Dedup, Multimodal, Relational, Similarity, TextAnalysis}
import graft.matrix.MatrixQueries
import graft.streaming.Streaming

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * R4: multi-way join with broadcast dims + grouped revenue. */
  def entry(spark: SparkSession): DataFrame =
    Relational.r04(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ MatrixQueries.queries ++ Dedup.queries ++
      TextAnalysis.queries ++ Similarity.queries ++ Multimodal.queries ++
      Streaming.queries ++ Corpus.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Dedup.oracles ++ TextAnalysis.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ Streaming.oracles ++
      MatrixQueries.oracles ++ Corpus.oracles
}
