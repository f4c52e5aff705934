package graft

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator catalog (one entry per implemented
  * SURVEY.md §2 row + the training-data extensions); `oracleSql` carries the
  * DuckDB-equivalent SQL for every SQL-expressible entry (the rest get the
  * driver's rows-only check and are unit-tested instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's schedule-deviation + in-engine reliability program. */
  def entry(spark: SparkSession): DataFrame = {
    graft.expr.functions.register(spark)
    Flagship.reliability(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Flagship.queries ++
      TextOps.queries ++ DedupOps.queries ++ SimilarityOps.queries ++
      MultimodalOps.queries ++ IngestOps.queries ++ CorpusOps.queries ++
      LayoutOps.queries ++ TimeSeriesOps.queries ++ PackOps.queries ++
      CdcOps.queries ++ LinkOps.queries ++ ClusterOps.queries ++
      RetrievalOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Relational2.oracle ++ Flagship.oracle ++
      TextOps.oracle ++ DedupOps.oracle ++ SimilarityOps.oracle ++
      MultimodalOps.oracle ++ IngestOps.oracle ++ CorpusOps.oracle ++
      LayoutOps.oracle ++ TimeSeriesOps.oracle ++ PackOps.oracle ++
      CdcOps.oracle ++ LinkOps.oracle ++ ClusterOps.oracle ++
      RetrievalOps.oracle
}
