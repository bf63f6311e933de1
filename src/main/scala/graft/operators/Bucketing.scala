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

  /** Deterministic global shuffle for training-data export. Gradient
    * descent wants its corpus in random order, and a 100 TB export can't
    * ask a driver-side RNG: the permutation must be reproducible,
    * partitioning-independent, and computable per row. Two DECORRELATED
    * portable md5 hashes per row (the splitAssign content-hash
    * discipline) give shard = hash_s mod `shards` and the within-shard
    * sort key hash_o — a seeded pseudorandom permutation any engine can
    * replay bit-for-bit. Appends (shard: int, idx: bigint), idx 0-based
    * in hash order within its shard.
    *
    * Scale shape: hashing is map-side; the only shuffle is the shard
    * exchange; the within-shard ranking window partitions by shard
    * (corpus/shards rows each — size `shards` so a shard fits an
    * executor, the pack_sequences shard-local discipline). */
  def shuffleAssign(df: DataFrame, keyCols: Seq[String], shards: Int,
                    seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "shuffle export needs at least one key column")
    require(shards > 0, s"shuffle export needs shards > 0, got $shards")
    val key = concat_ws("-", (lit(seed) +: keyCols.map(col)): _*)
    val hs = md5(concat(key, lit("-s")).cast("binary"))
    val ho = md5(concat(key, lit("-o")).cast("binary"))
    // first 4 hex digits as an integer, via ops both engines share
    val hexVal = Range(1, 5).map { i =>
      (instr(lit("0123456789abcdef"), substring(hs, i, 1)) - 1) *
        lit(1L << (4 * (4 - i)))
    }.reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__ho") +: keyCols.map(col): _*)
    df.withColumn("shard", pmod(hexVal, lit(shards)).cast("int"))
      .withColumn("__ho", ho)
      .withColumn("idx", (row_number().over(w) - 1).cast("bigint"))
      .drop("__ho")
  }

  /** Materialize the shuffled export: one file per shard, rows inside in
    * permutation order — the layout a training loader streams directly.
    * One exchange (the shard repartition); the per-shard sort rides the
    * exchange's spill machinery. */
  def writeShuffled(df: DataFrame, path: String, keyCols: Seq[String],
                    shards: Int, seed: String = "graft",
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    shuffleAssign(df, keyCols, shards, seed)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("idx"))
      .write.mode(mode).partitionBy("shard").parquet(path)
  }

  /** Token-MASS-balanced contiguous sharding — the manifest step a
    * training export actually needs next to [[shuffleAssign]]'s
    * count-balanced hash shards: with heavy-tailed document lengths,
    * hash shards even out document COUNTS but not token mass, and a
    * training job reading one shard per worker then runs as long as its
    * heaviest shard. Here shard k is the k-th contiguous slice of the
    * deterministic hash order whose cumulative mass spans
    * [k*ceil(total/shards), (k+1)*ceil(total/shards)) — every shard
    * within one document of the ideal mass, documents never split, and
    * the hash order keeps each shard an unbiased corpus sample.
    *
    * 100 TB shape — the naive form is a running sum over the WHOLE
    * corpus: one window partition = one task. Two phases instead (the
    * [[graft.queries.DataOps.sampleTokenBudget]] prefix-sum discipline,
    * lifted from per-source to global):
    *   1. bucket rows by the hash's first `bucketHexChars` hex chars
    *      (16^h contiguous ranges of the order) and aggregate per-bucket
    *      mass — a 16^h-row collect (cluster-metadata-sized);
    *   2. driver-side prefix offsets per bucket broadcast back; each
    *      bucket's rows run the exact running sum WITHIN the bucket
    *      (balanced hash-ranged partitions of corpus/16^h rows) offset
    *      by the mass before the bucket.
    * Identical to the naive single-window form (bucket order refines
    * hash order). At 100 TB raise `bucketHexChars` to 4-5 so in-bucket
    * partitions stay executor-sized. All arithmetic is integral
    * (ceil-div shard size, floor-div assignment) — any engine replays
    * the assignment bit-for-bit. Appends `shard` (int). */
  def shardByMass(df: DataFrame, keyCols: Seq[String], massCol: String,
                  shards: Int, seed: String = "graft",
                  bucketHexChars: Int = 2): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "mass sharding needs at least one key column")
    require(shards > 0, s"mass sharding needs shards > 0, got $shards")
    require(bucketHexChars >= 1 && bucketHexChars <= 8,
      s"bucketHexChars must be in [1,8], got $bucketHexChars")
    val hx = md5(concat_ws("-", (lit(seed) +: keyCols.map(col)): _*)
      .cast("binary"))
    val based = df
      .withColumn("__hx", hx)
      .withColumn("__bk", substring(col("__hx"), 1, bucketHexChars))
    // Two contract checks ride the SAME aggregate pass: negative masses
    // would silently break the monotone prefix (shards no longer
    // contiguous slices), and duplicate key tuples make the window's
    // running sum partition-order-dependent between the duplicates —
    // the "any engine replays this bit-for-bit" claim only holds for
    // unique keys, so non-unique input fails loudly instead.
    val masses = based.groupBy(col("__bk"))
      .agg(sum(coalesce(col(massCol).cast("bigint"), lit(0L))).as("__m"),
        min(coalesce(col(massCol).cast("bigint"), lit(0L))).as("__mn"),
        count(lit(1)).as("__n"),
        countDistinct(keyCols.head, keyCols.tail: _*).as("__nd"))
      .collect().map { r =>
        require(r.getLong(2) >= 0L,
          s"shardByMass: negative $massCol in bucket ${r.getString(0)} " +
            s"(min ${r.getLong(2)}) — masses must be non-negative")
        require(r.getLong(3) == r.getLong(4),
          s"shardByMass: ${r.getLong(3) - r.getLong(4)} duplicate-or-null " +
            s"key tuple(s) in bucket ${r.getString(0)} — keys (${keyCols
              .mkString(", ")}) must be unique and non-null for a " +
            "replayable assignment")
        (r.getString(0), r.getLong(1))
      }.sortBy(_._1)
    if (masses.isEmpty) // empty input: nothing to shard
      return df.withColumn("shard", lit(0).cast("int")).filter(lit(false))
    val total = masses.map(_._2).sum
    val shardSize = math.max(1L, (total + shards - 1) / shards)
    val offsets = masses.scanLeft(("", 0L)) { case ((_, acc), (bk, m)) =>
      (bk, acc + m)
    }.sliding(2).map { case Array((_, off), (bk, _)) => (bk, off) }.toSeq
    val offDf = broadcast(df.sparkSession.createDataFrame(offsets)
      .toDF("__ob", "__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bk")).orderBy(col("__hx") +: keyCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    based.join(offDf, col("__bk") === col("__ob"))
      .withColumn("__cum",
        col("__off") + coalesce(
          sum(coalesce(col(massCol).cast("bigint"), lit(0L))).over(w), lit(0L)))
      .withColumn("shard", // DIV: integral quotient — no IEEE on the path
        least(lit(shards - 1L), expr(s"__cum DIV ${shardSize}L")).cast("int"))
      .drop("__hx", "__bk", "__ob", "__off", "__cum")
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

  /** Z-ORDER clustering for TWO-dimensional data skipping (the lakehouse
    * OPTIMIZE ZORDER pass). Range clustering narrows per-file ranges on
    * ONE key and leaves every file full-width on all others; interleaving
    * the bits of two keys (Morton code) clusters rows so each file covers
    * a small RECTANGLE in (a, b) space — parquet min/max stats then prune
    * selective scans on EITHER column, which is what multi-tenant query
    * mixes need (one table queried by user some days, by time others).
    *
    * Each key is first normalized to 16 bits by the monotone min/max
    * bucket map (one tiny agg pass — the Quantiles bracket discipline;
    * monotone ⇒ ordering-safe; uniform buckets, so a heavily skewed key
    * clusters less sharply — the rank-exact alternative is a stableRanks
    * pass per key, the knob to reach for when a key is pathological).
    * The z-value is a pure expression (bit spread + interleave via
    * shifts/masks, codegen'd end to end) passed straight to
    * repartitionByRange/sortWithinPartitions — it never materializes as
    * a column and the written schema is untouched. One shuffle at write,
    * zero at read. */
  def writeZOrdered(df: DataFrame, path: String, keyA: String, keyB: String,
                    partitions: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.{col, floor, greatest, least, lit, max, min, shiftleft}
    import org.apache.spark.sql.Column
    val stats = df.agg(
      min(col(keyA)).cast("double"), max(col(keyA)).cast("double"),
      min(col(keyB)).cast("double"), max(col(keyB)).cast("double")).head()
    if (stats.anyNull) { // empty frame or all-null key: nothing to cluster
      df.write.mode(mode).parquet(path); return
    }
    def bucket16(c: Column, lo: Double, hi: Double): Column =
      if (lo == hi) lit(0L)
      else least(greatest(
        floor((c.cast("double") - lit(lo)) * lit(65536.0) / (lit(hi) - lit(lo)))
          .cast("bigint"), lit(0L)), lit(65535L))
    // classic bit spread: 16 significant bits -> even bit positions of 32
    def spread(c: Column): Column = {
      val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
      s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
    }
    val z = spread(bucket16(col(keyA), stats.getDouble(0), stats.getDouble(1)))
      .bitwiseOR(shiftleft(
        spread(bucket16(col(keyB), stats.getDouble(2), stats.getDouble(3))), 1))
    df.repartitionByRange(partitions, z)
      .sortWithinPartitions(z)
      .write.mode(mode).parquet(path)
  }
}
