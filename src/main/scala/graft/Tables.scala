package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables.
  *
  * Every operator reads through here so scans stay uniform: parquet with
  * pushdown + pruning (never a cached/collected copy — at 100 TB the scan
  * must stream).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; the session reads nanos as long (GraftSession sets
    * `spark.sql.legacy.parquet.nanosAsLong` at build time — no per-read
    * config mutation here, which would race under concurrent use) and `ts`
    * is surfaced as a micros timestamp via exact integer division (double
    * division loses ulps above 2^53 nanos). */
  def events: DataFrame =
    t("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
