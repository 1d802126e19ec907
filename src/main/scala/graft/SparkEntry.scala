package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All implemented operators (SURVEY.md §2), one QueryDef each. */
  def allDefs: Seq[QueryDef] =
    operators.Relational.defs ++ operators.Skew.defs ++
      operators.AsOf.defs ++ operators.Ranges.defs ++ operators.Cdc.defs ++
      operators.Dedup.defs ++ operators.StreamDedup.defs ++
      operators.TextAnalysis.defs ++
      operators.Similarity.defs ++ operators.Multimodal.defs ++
      operators.Curation.defs ++ operators.Sketches.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(_.sql).toMap
}
