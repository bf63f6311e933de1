package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DataOps, EtlSteps, Relational, Relational2, RetrievalQ, SourcesQ}

/** Driver contract — see /root/repo/SURVEY.md §2/§5.
  *
  * Every implemented operator from SURVEY §2 registers here as a named query
  * over /root/testdata/sf*, plus (where SQL-expressible) a DuckDB oracle with
  * identically-aliased columns.
  */
object SparkEntry {

  /** All query packs; each contributes name -> (fn, Option(oracleSql)). */
  private def packs: Seq[Map[String, ((SparkSession, String) => DataFrame, Option[String])]] =
    Seq(
      Relational.entries,
      Relational2.entries,
      EtlSteps.entries,
      DataOps.entries,
      RetrievalQ.entries,
      SourcesQ.entries,
    )

  private lazy val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] =
    packs.reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5LocalSupplier(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, (_, Some(sql))) => k -> sql }
}
