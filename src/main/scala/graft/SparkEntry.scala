package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is registered here as a
  * named query; each query with SQL-expressible semantics also declares
  * an equivalent DuckDB oracle in [[oracleSql]]. Query groups live under
  * `graft.queries.*`; the operator library they exercise lives under
  * `graft.functions` / `graft.memory` / `graft.pipeline`.
  */
object SparkEntry {

  private val groups: Seq[QueryGroup] = Seq(
    Relational, TextAnalysis, Dedup, Similarity, Retrieval, GraphOps, Lifecycle,
    Multimodal, Scoring, Temporal, EventWindows, Trust, Governance, Pipeline)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the hybrid RRF fusion — the reference's signature operation. */
  def entry(spark: SparkSession): DataFrame =
    queries("r7_rrf_fusion")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.flatMap(_.oracleSql).toMap
}
