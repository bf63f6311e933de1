package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-layout behaviors that matter at 100 TB: bucketed co-located
  * joins (no shuffle), partition pruning at the scan. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: ShuffleExchangeExec => s }.size
  }

  test("bucketed tables join without a shuffle") {
    val n = 1000
    spark.range(n).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.bucketBy(4, "k").sortBy("k").mode("overwrite").saveAsTable("t_left")
    spark.range(n).select(col("id").as("k"), (col("id") + 7).as("w"))
      .write.bucketBy(4, "k").sortBy("k").mode("overwrite").saveAsTable("t_right")
    try {
      val joined = spark.table("t_left").join(spark.table("t_right"), "k")
        .groupBy().agg(sum(col("v") + col("w")).as("s"))
      // bucketed join: zero shuffles before the final single-group agg
      val plain = spark.table("t_left").withColumn("k2", col("k"))
      assert(shuffleCount(spark.table("t_left").join(spark.table("t_right"), "k")) == 0)
      assert(joined.head().getLong(0) ==
        (0 until n).map(i => i.toLong * 2 + i + 7).sum)
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_left")
      spark.sql("DROP TABLE IF EXISTS t_right")
    }
  }

  test("range-clustered layout: files cover disjoint key ranges for skipping") {
    val dir = java.nio.file.Files.createTempDirectory("rangeclus").toString + "/data"
    val df = spark.range(10000).select(
      (col("id") * 2654435761L % 10000).as("k"), col("id").as("v"))
    graft.operators.Bucketing.writeRangeClustered(df, dir, Seq("k"), partitions = 8)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length == 8)
    // per-file key ranges must be pairwise disjoint — that is exactly the
    // property parquet min/max stats need to prune selective scans
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("k")), max(col("k"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: $hi >= $lo2")
      case _ =>
    }
    // and a selective filter still returns exact results over the layout
    assert(spark.read.parquet(dir).filter(col("k") < 100).count() ==
      df.filter(col("k") < 100).count())
  }

  test("z-ordered layout: per-file bounding boxes narrow on BOTH keys") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString + "/data"
    // a full 256×256 grid — both keys vary independently
    val df = spark.range(65536).select(
      (col("id") % 256).as("a"), expr("id div 256").as("b"), col("id").as("v"))
    graft.operators.Bucketing.writeZOrdered(df, dir, "a", "b", partitions = 16)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length == 16)
    val boxes = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min(col("a")), max(col("a")), min(col("b")), max(col("b"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // ideal boxes are 64×64 out of 256×256; allow seam files to be wider,
    // but on AVERAGE both dimensions must be narrow — 1-D range clustering
    // would leave one of them at ~255 for every file
    val avgA = boxes.map { case (lo, hi, _, _) => (hi - lo).toDouble }.sum / 16
    val avgB = boxes.map { case (_, _, lo, hi) => (hi - lo).toDouble }.sum / 16
    assert(avgA <= 100, s"avg a-range $avgA")
    assert(avgB <= 100, s"avg b-range $avgB")
    // a point predicate on EITHER key prunes most files by min/max stats
    val hitA = boxes.count { case (lo, hi, _, _) => lo <= 77 && 77 <= hi }
    val hitB = boxes.count { case (_, _, lo, hi) => lo <= 77 && 77 <= hi }
    assert(hitA <= 8, s"a=77 hits $hitA of 16 files")
    assert(hitB <= 8, s"b=77 hits $hitB of 16 files")
    // the layout changes nothing about the data
    assert(spark.read.parquet(dir).agg(sum(col("v"))).head().getLong(0) ==
      df.agg(sum(col("v"))).head().getLong(0))
    assert(spark.read.parquet(dir).filter(col("a") === 77).count() == 256)
    // degenerate inputs don't crash: constant key, empty frame
    graft.operators.Bucketing.writeZOrdered(
      df.withColumn("a", lit(1L)).limit(10), dir + "_c", "a", "b", 4)
    graft.operators.Bucketing.writeZOrdered(
      df.limit(0), dir + "_e", "a", "b", 4)
    assert(spark.read.parquet(dir + "_c").count() == 10)
  }

  test("shuffled export: one file per shard, rows in permutation order, nothing lost") {
    val dir = java.nio.file.Files.createTempDirectory("shufexp").toString + "/data"
    val df = spark.range(2000).select(col("id").as("doc_id"))
    graft.operators.Bucketing.writeShuffled(df, dir, Seq("doc_id"), shards = 4)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == 4, "every shard gets its own hive dir")
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"one file per shard, got ${files.length} in $d")
      // inside the file rows sit in permutation order: idx is 0..n-1 AS READ
      val idxs = spark.read.parquet(files.head.toString)
        .select("idx").collect().map(_.getLong(0))
      assert(idxs.toSeq == idxs.indices.map(_.toLong),
        "rows must be stored in within-shard permutation order")
    }
    // the export is a permutation: every input row exactly once
    assert(spark.read.parquet(dir).select("doc_id").as[Long].collect().sorted.toSeq
      == (0L until 2000L))
    // and the assignment is stable across recomputation (no RNG state)
    val a = graft.operators.Bucketing.shuffleAssign(df, Seq("doc_id"), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = graft.operators.Bucketing.shuffleAssign(df.repartition(7), Seq("doc_id"), 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b, "assignment must be partitioning-independent")
  }

  test("mass-balanced shards: exact vs naive replay, balanced, stable, null-safe") {
    val df = spark.range(1, 1001).select(col("id").as("doc_id"),
      when(col("id") % 10 === 0, lit(null))
        .otherwise(col("id") % 97 + 1).cast("bigint").as("mass"))
    val got = graft.operators.Bucketing.shardByMass(df, Seq("doc_id"), "mass", shards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    // naive local replay: global running sum in (md5, id) order
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = (1L until 1001L).map(id =>
      (id, if (id % 10 == 0) 0L else id % 97 + 1, md5hex(s"graft-$id")))
    val ordered = docs.sortBy { case (id, _, hx) => (hx, id) }
    val total = ordered.map(_._2).sum
    val sz = math.max(1L, (total + 7) / 8)
    var cum = 0L
    val want = ordered.map { case (id, m, _) =>
      val s = math.min(7L, cum / sz).toInt; cum += m; (id, s)
    }.toMap
    assert(got == want, "two-phase bucketed prefix sum must equal the naive global order")
    // balanced: every shard within one document's mass of the ideal slice
    val perShard = ordered.map { case (id, m, _) => (want(id), m) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val maxMass = docs.map(_._2).max
    perShard.foreach { case (s, m) =>
      assert(m <= sz + maxMass, s"shard $s mass $m exceeds sz+maxDoc")
    }
    assert(perShard.keySet == (0 to 7).toSet, "all shards populated")
    // partitioning-independent and empty-safe
    val again = graft.operators.Bucketing.shardByMass(
      df.repartition(13), Seq("doc_id"), "mass", shards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(again == got, "assignment must be partitioning-independent")
    assert(graft.operators.Bucketing.shardByMass(
      df.limit(0), Seq("doc_id"), "mass", shards = 8).count() == 0)
    // negative mass fails loudly, never silently mis-shards
    val neg = df.withColumn("mass",
      when(col("doc_id") === 500, lit(-3L)).otherwise(col("mass")))
    val err = intercept[Exception] {
      graft.operators.Bucketing.shardByMass(neg, Seq("doc_id"), "mass", 8).count()
    }
    assert(err.getMessage.contains("negative"), s"got: ${err.getMessage}")
  }

  test("partition pruning reaches the scan for partitioned parquet") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString + "/data"
    spark.range(100)
      .select(col("id"), (col("id") % 5).as("part_key"))
      .write.partitionBy("part_key").parquet(dir)
    val df = spark.read.parquet(dir).filter(col("part_key") === 3)
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    val s = scan.toString
    assert(s.contains("PartitionFilters") && s.contains("part_key"))
    assert(df.count() == 20)
  }

  test("compaction rewrites a small-file directory, preserving rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    // 64 tiny files — the incremental-writer pathology compaction exists for
    spark.range(10000).select(col("id"), (col("id") % 7).as("k"))
      .repartition(64).write.parquet(dir)
    def files() = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files() == 64)
    val before = spark.read.parquet(dir).agg(sum("id"), count(lit(1))).head()
    graft.operators.Bucketing.compact(spark, dir, targetFileBytes = 512L * 1024)
    assert(files() < 8, s"expected few compacted files, got ${files()}")
    assert(spark.read.parquet(dir).agg(sum("id"), count(lit(1))).head() == before,
      "compaction must not change row contents")
    // config surface: layout mode=compact on the same dir (needs any frame
    // in the flow; the step operates on the TARGET path)
    graft.pipeline.Pipeline.run(spark,
      s"""[
         | {"type":"generator","count":1},
         | {"type":"layout","mode":"compact","path":"$dir","target_file_mb":1}
         |]""".stripMargin)
    assert(spark.read.parquet(dir).count() == 10000)
  }

  test("checksum dispatch covers sha2/sha3 families") {
    import graft.functions.Checksums
    def one(algo: String): String =
      spark.range(1).select(Checksums.checksum(algo, lit("x")).as("h")).as[String].head()
    assert(one("md5") == "9dd4e461268c8034f5c8564e155c67a6")
    assert(one("sha256") == "2d711642b726b04401627ca9fbac32f5c8530fb1903cc4db02258717921a4881")
    assert(one("sha3-256").length == 64)
    assert(one("sha3-512").length == 128)
    assert(one("sha384").length == 96)
    assert(Checksums.parseAlgorithmChecksum("sha256:abc") == (("sha256", Some("abc"))))
    assert(Checksums.parseAlgorithmChecksum("md5") == (("md5", None)))
  }
}
