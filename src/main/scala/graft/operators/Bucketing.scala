package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed storage for co-located joins and aggregations (the 100 TB
  * lever the brief calls out: "repartition()/bucketing for co-located
  * joins").
  *
  * A bucketed write pays ONE shuffle at write time; every later join or
  * aggregation on the bucket key then reads co-located buckets and skips
  * its exchange entirely — on a fact table joined daily against another
  * bucketed table, that converts a per-query multi-TB shuffle into a
  * one-time layout cost. Matching bucket counts on both sides are
  * required for the join-side elision (Spark pairs bucket i with
  * bucket i).
  *
  * Spark persists bucket metadata in the session catalog, so bucketed
  * frames are written as tables (`saveAsTable`), not bare paths —
  * that is where `spark.read.table` recovers the bucket spec from.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally sorted) table. Sorting within
    * buckets additionally lets sort-merge joins skip their sort. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String], sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    var w = df.write.mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /** Read a bucketed table back with its bucket spec intact. */
  def readBucketed(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.read.table(table)

  /** Small-file compaction — the table-maintenance pass every long-lived
    * lake needs: streaming/incremental writers leave thousands of KB-sized
    * files whose per-file open/footer costs dominate scans and whose
    * listing bloats planning. Rewrites the directory into
    * ceil(bytes / targetFileBytes) files (coalesce — no shuffle: existing
    * partitions concatenate) and swaps it in via rename-aside: the
    * original moves to `path__old` BEFORE the compacted dir takes the
    * canonical name, so every crash state leaves a complete copy at a
    * known name (`path` or `path__old`) — a delete-then-rename would have
    * a window where the dataset exists only under the temp name. Row
    * contents are untouched. Stale `__old`/`__compacting` leftovers from
    * a previous crash are cleared on entry. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(path).coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(hPath, old), s"compaction rename-aside failed for $path")
    require(fs.rename(tmp, hPath), s"compaction rename failed for $path")
    fs.delete(old, true)
    nFiles.toLong
  }

  /** Range-clustered layout for data skipping: range-partition on the
    * sort key, then sort within each partition before writing parquet.
    * Every output file then covers a narrow, pairwise-disjoint key range,
    * so a point or range predicate on that key prunes to a handful of
    * files/row-groups via parquet min/max statistics instead of scanning
    * the table — the other half of the storage-layout story next to
    * bucketing (bucketing kills join shuffles; range-clustering kills
    * selective-scan I/O). One shuffle at write time, zero at read. */
  def writeRangeClustered(df: DataFrame, path: String, sortKeys: Seq[String],
                          partitions: Int,
                          mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(sortKeys.nonEmpty, "range clustering needs at least one sort key")
    val cols = sortKeys.map(org.apache.spark.sql.functions.col)
    df.repartitionByRange(partitions, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(mode).parquet(path)
  }
}
