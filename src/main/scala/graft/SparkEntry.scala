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

  /** Per-module query maps in merge order. Exposed (rather than inlined
    * into `queries`) so CatalogSpec can assert the module key sets are
    * pairwise disjoint: `++` keeps the LAST binding, so a reused key
    * silently drops an operator from the catalog with no error anywhere —
    * exactly what happened to the r5-era q_cramers_v / q_stratified_sample
    * in round 9 (VERDICT r9 "what's wrong" #2). */
  def moduleQueries: Seq[(String, Map[String, (SparkSession, String) => DataFrame])] = Seq(
    "Relational" -> Relational.queries,
    "RelationalExt" -> RelationalExt.queries,
    "RelationalMore" -> RelationalMore.queries,
    "EventOps" -> EventOps.queries,
    "TextOps" -> TextOps.queries,
    "Dedup" -> Dedup.queries,
    "Similarity" -> Similarity.queries,
    "Pipeline" -> Pipeline.queries,
    "CorpusOps" -> CorpusOps.queries,
    "GraphOps" -> GraphOps.queries,
    "Graph2" -> Graph2.queries,
    "Graph3" -> Graph3.queries,
    "Tpch" -> Tpch.queries,
    "CorpusMix" -> CorpusMix.queries,
    "Analytics" -> Analytics.queries,
    "CorpusStats" -> CorpusStats.queries,
    "Curation" -> Curation.queries,
    "Evaluation" -> Evaluation.queries,
    "Quality" -> Quality.queries,
    "LinAlg" -> LinAlg.queries,
    "Stats2" -> Stats2.queries,
    "Stats3" -> Stats3.queries,
    "Stats4" -> Stats4.queries,
    "Stats5" -> Stats5.queries,
    "Stats6" -> Stats6.queries,
    "Stats7" -> Stats7.queries,
    "Stats8" -> Stats8.queries,
    "Stats9" -> Stats9.queries,
    "Stats10" -> Stats10.queries,
    "Stats11" -> Stats11.queries,
    "Stats12" -> Stats12.queries,
    "TextEval" -> TextEval.queries,
    "MlOps3" -> MlOps3.queries,
    "Stats13" -> Stats13.queries,
    "Econ" -> Econ.queries,
    "MlOps" -> MlOps.queries,
    "MlOps2" -> MlOps2.queries,
    "DqOps" -> DqOps.queries,
    "Recsys" -> Recsys.queries,
    "Stats14" -> Stats14.queries,
    "SeqMl" -> SeqMl.queries,
    "Stats15" -> Stats15.queries,
    "Stats16" -> Stats16.queries,
    "Econ2" -> Econ2.queries,
    "Density" -> Density.queries,
    "SeqMl2" -> SeqMl2.queries,
    "Stats17" -> Stats17.queries,
    "Stats18" -> Stats18.queries,
    "Fairness" -> Fairness.queries,
    "Stats19" -> Stats19.queries,
    "Stats20" -> Stats20.queries,
    "Risk" -> Risk.queries,
    "Stats21" -> Stats21.queries,
    "Agree" -> Agree.queries,
    "TextEval2" -> TextEval2.queries,
    "Stats22" -> Stats22.queries,
    "Reliab" -> Reliab.queries,
    "Text3" -> Text3.queries)

  /** Per-module oracle maps, same order/discipline as [[moduleQueries]]. */
  def moduleOracles: Seq[(String, Map[String, String])] = Seq(
    "Relational" -> Relational.oracle,
    "RelationalExt" -> RelationalExt.oracle,
    "RelationalMore" -> RelationalMore.oracle,
    "EventOps" -> EventOps.oracle,
    "TextOps" -> TextOps.oracle,
    "Dedup" -> Dedup.oracle,
    "Similarity" -> Similarity.oracle,
    "Pipeline" -> Pipeline.oracle,
    "CorpusOps" -> CorpusOps.oracle,
    "GraphOps" -> GraphOps.oracle,
    "Graph2" -> Graph2.oracle,
    "Graph3" -> Graph3.oracle,
    "Tpch" -> Tpch.oracle,
    "CorpusMix" -> CorpusMix.oracle,
    "Analytics" -> Analytics.oracle,
    "CorpusStats" -> CorpusStats.oracle,
    "Curation" -> Curation.oracle,
    "Evaluation" -> Evaluation.oracle,
    "Quality" -> Quality.oracle,
    "LinAlg" -> LinAlg.oracle,
    "Stats2" -> Stats2.oracle,
    "Stats3" -> Stats3.oracle,
    "Stats4" -> Stats4.oracle,
    "Stats5" -> Stats5.oracle,
    "Stats6" -> Stats6.oracle,
    "Stats7" -> Stats7.oracle,
    "Stats8" -> Stats8.oracle,
    "Stats9" -> Stats9.oracle,
    "Stats10" -> Stats10.oracle,
    "Stats11" -> Stats11.oracle,
    "Stats12" -> Stats12.oracle,
    "TextEval" -> TextEval.oracle,
    "MlOps3" -> MlOps3.oracle,
    "Stats13" -> Stats13.oracle,
    "Econ" -> Econ.oracle,
    "MlOps" -> MlOps.oracle,
    "MlOps2" -> MlOps2.oracle,
    "DqOps" -> DqOps.oracle,
    "Recsys" -> Recsys.oracle,
    "Stats14" -> Stats14.oracle,
    "SeqMl" -> SeqMl.oracle,
    "Stats15" -> Stats15.oracle,
    "Stats16" -> Stats16.oracle,
    "Econ2" -> Econ2.oracle,
    "Density" -> Density.oracle,
    "SeqMl2" -> SeqMl2.oracle,
    "Stats17" -> Stats17.oracle,
    "Stats18" -> Stats18.oracle,
    "Fairness" -> Fairness.oracle,
    "Stats19" -> Stats19.oracle,
    "Stats20" -> Stats20.oracle,
    "Risk" -> Risk.oracle,
    "Stats21" -> Stats21.oracle,
    "Agree" -> Agree.oracle,
    "TextEval2" -> TextEval2.oracle,
    "Stats22" -> Stats22.oracle,
    "Reliab" -> Reliab.oracle,
    "Text3" -> Text3.oracle)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    moduleQueries.iterator.map(_._2).reduce(_ ++ _)

  /** Bench-only overrides: estimate-only forms of the sketch queries
    * (same keys as `queries`; identical sketch config, exact verification
    * arm dropped). Bench times `queries ++ benchForm`; Verify and the
    * correctness gate use `queries` alone — see
    * [[graft.queries.RelationalExt.benchForm]]. */
  def benchForm: Map[String, (SparkSession, String) => DataFrame] =
    RelationalExt.benchForm ++ Similarity.benchForm ++
      Graph2.benchForm ++ Graph3.benchForm

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    moduleOracles.iterator.map(_._2).reduce(_ ++ _)
}
