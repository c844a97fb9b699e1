package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.llm.{CorpusOps, DedupOps, Multimodal, PrivacyOps, SimilarityOps, TextOps}
import graft.models.DagQueries
import graft.operators.{DialectOps, ExtensionOps, Flagship, GeoOps, OlapOps, ProfileOps, QueryDef, RelationalOps, ScaleOps, TimeSeriesOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY.md §2 is one entry in `queries`
  * with (where ANSI-SQL-expressible) a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  private[graft] def allDefs: Seq[QueryDef] =
    RelationalOps.all ++ DialectOps.all ++ Flagship.all ++ ScaleOps.all ++ OlapOps.all ++
      TimeSeriesOps.all ++ ExtensionOps.all ++ ProfileOps.all ++ GeoOps.all ++
      graft.sources.SourceFormats.all ++
      TextOps.all ++ DedupOps.all ++ SimilarityOps.all ++ Multimodal.all ++ PrivacyOps.all ++
      CorpusOps.all ++ DagQueries.all ++ graft.engine.DataTests.all ++
      graft.engine.SnapshotQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.toQueries(allDefs)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryDef.toOracles(allDefs)
}
