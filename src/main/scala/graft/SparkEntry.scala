package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator family; each key has a
  * DuckDB-runnable twin in `oracleSql` unless the op is not SQL-expressible
  * (those get the driver's weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 flavor) on sf=0.001; driver smoke-checks
    * rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ RelationalExt.queries ++
      RelationalMore.queries ++ EventOps.queries ++
      TextOps.queries ++ Dedup.queries ++ Similarity.queries ++
      Pipeline.queries ++ CorpusOps.queries ++ GraphOps.queries ++
      Tpch.queries ++ CorpusMix.queries ++ Analytics.queries ++
      CorpusStats.queries ++ Curation.queries ++ Evaluation.queries ++
      Quality.queries ++ LinAlg.queries ++ Stats2.queries ++
      Stats3.queries

  /** Bench-only overrides: estimate-only forms of the sketch queries
    * (same keys as `queries`; identical sketch config, exact verification
    * arm dropped). Bench times `queries ++ benchForm`; Verify and the
    * correctness gate use `queries` alone — see
    * [[graft.queries.RelationalExt.benchForm]]. */
  def benchForm: Map[String, (SparkSession, String) => DataFrame] =
    RelationalExt.benchForm

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ RelationalExt.oracle ++
      RelationalMore.oracle ++ EventOps.oracle ++
      TextOps.oracle ++ Dedup.oracle ++ Similarity.oracle ++
      Pipeline.oracle ++ CorpusOps.oracle ++ GraphOps.oracle ++
      Tpch.oracle ++ CorpusMix.oracle ++ Analytics.oracle ++
      CorpusStats.oracle ++ Curation.oracle ++ Evaluation.oracle ++
      Quality.oracle ++ LinAlg.oracle ++ Stats2.oracle ++
      Stats3.oracle
}
