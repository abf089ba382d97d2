package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Catalog, Extensions}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in [[graft.queries.Catalog]] (reference-parity core) and
  * [[graft.queries.Extensions]] (dedup / similarity / text / multimodal
  * / streaming twin). */
object SparkEntry {

  private def registry: Seq[Catalog.Q] = Catalog.core ++ Extensions.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Word count — the reference's canonical workload. */
  def entry(spark: SparkSession): DataFrame =
    Catalog.core.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
