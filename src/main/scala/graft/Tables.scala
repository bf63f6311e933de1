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

  /** Spread a FACT-table scan whose file layout yields far fewer splits
    * than the session has cores (guide §2.5 "input skew — one huge
    * unsplittable file … repartition immediately after the read"): a
    * single small parquet file is one input split, so every downstream
    * tokenize/explode/partial-agg serializes on one task while the
    * other cores idle (measured: the r16 per-job profile showed 1-6 s
    * single-task scan stages under every documents/lineitem-heavy
    * gate). Data-adaptive, not config: at real scale the scan already
    * has ≥ cores splits and this is the identity, so no corpus-sized
    * shuffle is ever added. Only fact tables route through here —
    * dimension tables stay broadcast-sized single scans.
    *
    * ORDERING CONTRACT (ADVICE r16): the round-robin repartition does
    * not preserve file row order, so a table read through here has NO
    * deterministic row order — gates using order-sensitive ops
    * (collect_list, first) must sort explicitly, as everywhere else.
    *
    * The split probe (`df.rdd.getNumPartitions`) pays a full physical-
    * planning pass, so the DECISION is memoized per (path, want): gates
    * that reference a fact table several times plan the probe once per
    * JVM, not once per accessor call (ADVICE r16). The file layout of a
    * data dir is immutable for a run, so the memo can never go stale. */
  private def spread(name: String, df: DataFrame): DataFrame = {
    val want = spark.sparkContext.defaultParallelism
    val need = Tables.spreadMemo.computeIfAbsent(
      (s"$dir/$name", want),
      _ => Boolean.box(df.rdd.getNumPartitions * 4 < want))
    if (need) df.repartition(want) else df
  }

  /** Normalise a timestamp-carrying column to session-TZ TimestampType
    * whatever physical encoding the testdata generation used: BIGINT nanos
    * (TIMESTAMP(NANOS) under `spark.sql.legacy.parquet.nanosAsLong`, exact
    * integer division to micros — double division loses ulps above 2^53),
    * TIMESTAMP_NTZ, DATE, or TimestampType pass-through. The events `ts`
    * regeneration from nanos to micros broke 9 gates in round 10; every
    * time-typed column loads through here so the next regeneration can't. */
  private def normTs(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case TimestampType => df
      case _ => // TIMESTAMP_NTZ, DATE, other timestamp flavors
        df.withColumn(colName, col(colName).cast(TimestampType))
    }
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = spread("orders", normTs(t("orders"), "o_orderdate"))
  def lineitem: DataFrame   = spread("lineitem", normTs(t("lineitem"), "l_shipdate"))
  def events: DataFrame     = spread("events", normTs(t("events"), "ts"))
  def documents: DataFrame  = spread("documents", t("documents"))
  def embeddings: DataFrame = spread("embeddings", t("embeddings"))
}

object Tables {
  /** spread()'s split-probe memo — see the doc there. Keyed on (path,
    * cores) so a different session width re-probes; holds only a
    * Boolean decision, never data. */
  private val spreadMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), java.lang.Boolean]()
}
