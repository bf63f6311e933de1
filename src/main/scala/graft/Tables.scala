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
  /** events.parquet has shipped with two physical `ts` encodings across
    * testdata generations: TIMESTAMP(NANOS) (loads as BIGINT nanos under
    * `spark.sql.legacy.parquet.nanosAsLong`, set at session build — no
    * per-read config mutation here, which would race under concurrent use)
    * and TIMESTAMP(MICROS) (loads as a timestamp directly). Branch on the
    * loaded type so both generations work: longs get exact integer division
    * to micros (double division loses ulps above 2^53 nanos); timestamps —
    * incl. TIMESTAMP_NTZ — are normalised to session-TZ TimestampType so
    * downstream window/watermark semantics are uniform. */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType =>
        raw
      case _ => // TIMESTAMP_NTZ or other timestamp flavors
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
