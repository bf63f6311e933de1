package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed counts aggregate a memory stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    input.addData(
      EventStream.Event(1, ts(1), 1, "click", 1.0, "{}"),
      EventStream.Event(2, ts(5), 1, "click", 2.0, "{}"),
      EventStream.Event(3, ts(7), 2, "view", 5.0, "{}"))
    val q = EventStream.windowedCounts(input.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, sum_value FROM win ORDER BY event_type").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("append-mode window emission: end-at-watermark windows DO emit (<= not <)") {
    // Pins the closed-window set q_stream_heavy_hitters's oracle models:
    // the trailing no-data micro-batch advances the final watermark to
    // max(ts) − delay, and a window whose end equals that watermark
    // EXACTLY is emitted — the oracle's `win_end <= wm` must not be `<`.
    implicit val sqlCtx = spark.sqlContext
    def at(h: Int, m: Int = 0): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val input = MemoryStream[EventStream.Event]
    input.addData(
      EventStream.Event(1, at(1), 1, "a", 0.0, "{}"),   // window [00,06)
      EventStream.Event(2, at(5), 1, "a", 0.0, "{}"),   // window [00,06)
      EventStream.Event(3, at(8), 1, "a", 0.0, "{}"))   // window [06,12)
    // max(ts)=08:00 → final wm = 06:00 == [00,06)'s end exactly
    val q = input.toDF().withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "6 hours")).count()
      .writeStream.format("memory").queryName("wmedge").outputMode("append").start()
    try {
      q.processAllAvailable()
      val ends = spark.sql("SELECT window.end AS e, count FROM wmedge").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      assert(ends == Map("2024-01-01 06:00:00.0" -> 2L),
        s"expected exactly the end-at-watermark window, got $ends")
    } finally q.stop()
  }

  test("stateful sessionization counts sessions per user across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    input.addData(
      EventStream.Event(1, ts(0), 7, "click", 1.0, "{}"),
      EventStream.Event(2, ts(5), 7, "click", 1.0, "{}"))
    val sessions = EventStream.sessionize(spark, input.toDF())
    val q = sessions.writeStream.format("memory").queryName("sess").outputMode("update").start()
    try {
      q.processAllAvailable()
      // second batch: 40 min later → new session for user 7
      input.addData(EventStream.Event(3, ts(45), 7, "click", 1.0, "{}"))
      q.processAllAvailable()
      val last = spark.sql("SELECT n_events, n_sessions FROM sess WHERE user_id = 7")
        .collect().map(r => (r.getInt(0), r.getInt(1))).maxBy(_._1)
      assert(last == ((3, 2)))
    } finally q.stop()
  }


  test("watermarked stream-stream join pairs clicks with recent views") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    input.addData(
      EventStream.Event(10, ts(0), 1, "view", 0.0, "{}"),
      EventStream.Event(11, ts(20), 1, "click", 0.0, "{}"),  // pairs with 10
      EventStream.Event(12, ts(5), 2, "view", 0.0, "{}"),
      EventStream.Event(13, ts(30), 3, "click", 0.0, "{}"))  // no view for user 3
    val q = EventStream.clickViewJoin(input.toDF())
      .writeStream.format("memory").queryName("cvj").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, click_id, view_id FROM cvj").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows == Seq((1L, 11L, 10L)))
    } finally q.stop()
  }


  test("dedup within watermark drops duplicate ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.dedupWithinWatermark(input.toDF())
      .writeStream.format("memory").queryName("wmdedup").outputMode("append").start()
    try {
      input.addData(
        EventStream.Event(1, ts(0), 1, "view", 1.0, "{}"),
        EventStream.Event(2, ts(1), 1, "view", 2.0, "{}"),
        EventStream.Event(1, ts(2), 1, "view", 9.0, "{}")) // dup in-batch
      q.processAllAvailable()
      input.addData(
        EventStream.Event(2, ts(3), 1, "view", 9.0, "{}"), // dup across batches
        EventStream.Event(3, ts(4), 1, "view", 3.0, "{}"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id, value FROM wmdedup").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      // one row per id, each the FIRST occurrence's payload
      assert(rows == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    } finally q.stop()
  }

  test("streaming dedup equals the batch first-occurrence shape on ordered replay") {
    // Replay the real events table through the streaming operator in
    // event-time order; on bounded, ordered input the watermark-bounded
    // dedup must produce exactly the rows the batch gate (q_stream_dedup)
    // computes with row_number over (ts, event_id).
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val ordered = Tables(spark, sfDir).events
      .orderBy(col("ts"), col("event_id"))
      .as[EventStream.Event].collect().toSeq
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.dedupWithinWatermark(
        input.toDF(), keys = Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("eqdedup").outputMode("append").start()
    try {
      input.addData(ordered)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT user_id, event_type, event_id FROM eqdedup")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = queries.DataOps.qStreamDedup(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch,
        s"streaming dedup diverged from batch shape: ${streamed.diff(batch)} / ${batch.diff(streamed)}")
    } finally q.stop()
  }

  test("streaming funnel depth equals the batch chain on ordered replay") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val ordered = Tables(spark, sfDir).events
      .orderBy(col("ts"), col("event_id"))
      .as[EventStream.Event].collect().toSeq
    val stages = Seq("view", "click", "purchase")
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.funnelStream(spark, input.toDF(), stages)
      .writeStream.format("memory").queryName("eqfunnel").outputMode("update").start()
    try {
      // split mid-stream so funnel state must survive across batches
      val (b1, b2) = ordered.splitAt(ordered.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      // update mode: keep the LAST emitted depth per user
      val streamed = spark.sql(
          "SELECT user_id, depth FROM eqfunnel").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).max }
      val batch = queries.DataOps.funnelStages(Tables(spark, sfDir).events,
          "user_id", "ts", "event_type", stages)
        .select(col("user_id"), col("depth"))
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      assert(streamed == batch,
        s"streaming funnel diverged: ${streamed.toSet.diff(batch.toSet)}")
    } finally q.stop()
  }

  test("streaming attribution equals the batch session chain on ordered replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val ordered = Tables(spark, sfDir).events
      .orderBy(col("ts"), col("event_id"))
      .as[EventStream.Event].collect().toSeq
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.attributionStream(spark, input.toDF())
      .writeStream.format("memory").queryName("sattr").outputMode("append").start()
    try {
      val (b1, b2) = ordered.splitAt(ordered.length / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val streamed = spark.sql("SELECT event_id, sess, first_view_id FROM sattr")
        .collect().map(r => r.getLong(0) -> (r.getLong(1),
          if (r.getLong(2) < 0) -1L else r.getLong(2))).toMap
      val batch = queries.DataOps.qAttribution(spark, sfDir)
        .collect().map(r => r.getLong(0) -> (r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      assert(streamed == batch,
        s"diverged on ${streamed.toSet.diff(batch.toSet).take(3)}")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming weekly anomaly: closed weeks z-score against prior history only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ev(id: Long, day: Int, hour: Int): EventStream.Event =
      EventStream.Event(id, java.sql.Timestamp.valueOf(
        f"2024-01-${day}%02d $hour%02d:00:00"), 1L, "a", 1.0, "{}")
    // 2024-01-01 is a Monday: weeks are Jan 1-7, 8-14, 15-21, 22-28
    var id = 0L
    def week(day0: Int, count: Int): Seq[EventStream.Event] =
      (0 until count).map { i => id += 1; ev(id, day0 + i % 7, i % 24) }
    val w1 = week(1, 10); val w2 = week(8, 20); val w3 = week(15, 40)
    val w4 = week(22, 1)
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.weeklyAnomalyStream(spark, input.toDF())
      .writeStream.format("memory").queryName("wkanom").outputMode("append").start()
    try {
      input.addData(w1 ++ w2); q.processAllAvailable()
      input.addData(w3 ++ w4); q.processAllAvailable()
      val rows = spark.sql("SELECT week_start_us, n, z FROM wkanom ORDER BY week_start_us")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      assert(rows.length == 3, s"only CLOSED weeks emit (partial week 4 must not): $rows")
      assert(rows.map(_._2).toSeq == Seq(10L, 20L, 40L))
      assert(rows(0)._3.isEmpty && rows(1)._3.isEmpty,
        "fewer than two prior weeks -> no z")
      // week 3 scores against history [10, 20]: m=2, s1=30, s2=500,
      // den=sqrt(2*500-900)=10, z=(2*40-30)/10 = 5.0 exactly
      assert(rows(2)._3.contains(5.0))
      val start = rows.map(_._1)
      assert(start(1) - start(0) == 7L * 24 * 3600 * 1000000L)
    } finally q.stop()
  }

  test("windowed heavy-hitters on a stream: MG summary per event-time window") {
    // trending-terms shape: the bounded Misra-Gries buffer rides inside a
    // watermarked window aggregation — state per (window) is ≤ k counters
    // however many events arrive, the only shape that holds on a firehose
    import org.apache.spark.sql.functions.{col, window, xxhash64}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ordered = Tables(spark, "/root/testdata/sf0.001").events
      .orderBy(col("ts"), col("event_id"))
      .as[EventStream.Event].collect().toSeq
    val input = MemoryStream[EventStream.Event]
    val q = input.toDF()
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "6 hours"))
      .agg(graft.plans.Native.misraGries(xxhash64(col("event_type")), 8).as("mg"))
      .writeStream.format("memory").queryName("mgwin").outputMode("append").start()
    try {
      input.addData(ordered)
      q.processAllAvailable()
      input.addData(Seq()) // advance watermark bookkeeping
      q.processAllAvailable()
      val rows = spark.sql("SELECT window.start AS s, mg FROM mgwin").collect()
      assert(rows.nonEmpty, "closed windows must emit")
      // every summary is bounded by k and its counts are positive; with 5
      // event types and k=8, MG is EXACT — totals must equal window sizes
      val batch = Tables(spark, "/root/testdata/sf0.001").events
        .groupBy(window(col("ts"), "6 hours"))
        .count().select(col("window.start").as("s"), col("count"))
        .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      rows.foreach { r =>
        val mg = r.getSeq[org.apache.spark.sql.Row](1)
        assert(mg.size <= 8)
        val total = mg.map(_.getLong(1)).sum
        assert(batch.get(r.getTimestamp(0)).contains(total),
          s"window ${r.getTimestamp(0)}: MG total $total != batch count")
      }
    } finally q.stop()
  }

  test("streaming percentiles: closed-window histograms equal the batch bands; open window held back") {
    // the arrival-time twin of groupPercentiles: a watermarked
    // (window, type, cent-value) count is an integral-domain histogram
    // per window — bounded state — and the post-pass derives the exact
    // interpolated bands with the same integer algebra as batch
    import org.apache.spark.sql.functions.{col, floor, lit, window}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def at(h: Int, m: Int = 0): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // window [00,06): values 1.00..5.00; window [06,12): 10.00/20.00 —
    // both closed by the final watermark 14:00 − 2h = 12:00 (end ≤ wm,
    // the pinned <= semantics); window [12,18) stays OPEN and must NOT
    // emit
    val evs =
      (1 to 5).map(i => EventStream.Event(i, at(1, i), 1, "a", i.toDouble, "{}")) ++
      Seq(EventStream.Event(6, at(7), 1, "a", 10.0, "{}"),
        EventStream.Event(7, at(8), 1, "a", 20.0, "{}"),
        EventStream.Event(8, at(14), 1, "a", 99.0, "{}"))
    val input = MemoryStream[EventStream.Event]
    val q = input.toDF()
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"),
        floor(col("value") * lit(100.0)).cast("long").as("v"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("c"))
      .writeStream.format("memory").queryName("pctwin").outputMode("append").start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      input.addData(Seq())
      q.processAllAvailable()
      val hist = spark.table("pctwin")
        .select(col("window.start").cast("string").as("win"),
          col("event_type"), col("v"), col("c"))
      val bands = operators.Quantiles.groupPercentilesFromHist(
          hist, Seq("win", "event_type"),
          Seq(("p50", 1L, 2L), ("p95", 19L, 20L)))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      // [00,06): n=5, cents 100..500 → p50_x2 = 2*300, p95_x20: rank
      // 19·4/20 = i 3 r 16 → 400·4 + 500·16 = 9600
      assert(bands("2024-01-01 00:00:00") == ((5L, 600L, 9600L)),
        s"first window: ${bands.get("2024-01-01 00:00:00")}")
      // [06,12): n=2, cents 1000/2000 → p50_x2 = 1000+2000 = 3000,
      // p95_x20: i 0 r 19 → 1000·1 + 2000·19 = 39000
      assert(bands("2024-01-01 06:00:00") == ((2L, 3000L, 39000L)),
        s"second window: ${bands.get("2024-01-01 06:00:00")}")
      // the 99.0 event's window is still open — held back, not emitted
      assert(!bands.contains("2024-01-01 12:00:00"),
        "open window must not emit")
      // parity with the batch band computation over the closed rows
      val batchBands = operators.Quantiles.groupPercentiles(
          evs.filter(_.ts.getTime < at(12).getTime).toDF()
            .select(col("event_type"),
              floor(col("value") * lit(100.0)).cast("long").as("cents"))
            .withColumn("win", lit("all")),
          "event_type", "cents", Seq(("p50", 1L, 2L)))
        .collect().map(r => r.getLong(1) -> r.getLong(2)).head
      assert(batchBands == ((7L, 800L)),
        s"batch all-closed-rows p50 sanity: $batchBands")
    } finally q.stop()
  }

  test("streaming incremental dedup collapses cross-batch dups against the index") {
    implicit val sqlCtx = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS stream_inc_idx")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "stream_inc_idx")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    val ckpt = java.nio.file.Files.createTempDirectory("stream-inc-ckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[(Long, String)]
    val q = EventStream.dedupStreamAgainstIndex(
      input.toDF().toDF("doc_id", "text"), "stream_inc_idx",
      indexBuckets = 4, idCol = "doc_id", keyCol = "text", checkpoint = ckpt) {
      kept => seen ++= kept.select("doc_id").as[Long](implicitly).collect()
    }
    try {
      // batch 1 bootstraps the index ("aa" intra-batch dup collapses)
      input.addData((1L, "aa"), (2L, "aa"), (3L, "bb"))
      q.processAllAvailable()
      assert(seen.sorted.toSeq == Seq(1L, 3L))
      // batch 2: "aa"/"bb" are corpus history now — far beyond any
      // watermark horizon — only "cc" is new
      input.addData((10L, "aa"), (11L, "cc"), (12L, "bb"))
      q.processAllAvailable()
      assert(seen.sorted.toSeq == Seq(1L, 3L, 11L))
      // batch 3: "cc" folded in by batch 2; nothing survives
      input.addData((20L, "cc"))
      q.processAllAvailable()
      assert(seen.sorted.toSeq == Seq(1L, 3L, 11L))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS stream_inc_idx")
    }
  }

  test("streaming paths hold no block-manager ballast across a 3-batch replay") {
    // The PlansSpec cache-discipline audit covers batch gates; streaming
    // operators hold state ACROSS batches (state store, index tables,
    // foreachBatch scratch), so a replay must not accumulate persisted
    // RDDs batch over batch — a leak here grows with stream lifetime,
    // which is unbounded in production.
    implicit val sqlCtx = spark.sqlContext
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(true))
    spark.sql("DROP TABLE IF EXISTS stream_ballast_idx")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "stream_ballast_idx")
    loc.getFileSystem(sc.hadoopConfiguration).delete(loc, true)
    val ckpt = java.nio.file.Files.createTempDirectory("stream-ballast-ckpt").toString
    // (a) foreachBatch incremental dedup: localCheckpoint scratch must die
    // with its batch
    val input = MemoryStream[(Long, String)]
    val counts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = EventStream.dedupStreamAgainstIndex(
      input.toDF().toDF("doc_id", "text"), "stream_ballast_idx",
      indexBuckets = 4, idCol = "doc_id", keyCol = "text", checkpoint = ckpt) {
      kept => kept.count(): Unit
    }
    try {
      Seq(Seq((1L, "aa"), (2L, "bb")), Seq((3L, "aa"), (4L, "cc")),
          Seq((5L, "dd"))).foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
        counts += sc.getPersistentRDDs.size
      }
      assert(counts.forall(_ == 0),
        s"persisted RDDs accumulate across streaming batches: $counts")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS stream_ballast_idx")
    }
    // (b) stateful EventStream twin (funnel via mapGroupsWithState): state
    // lives in the state store, never the block manager
    sc.getPersistentRDDs.values.foreach(_.unpersist(true))
    val ev = MemoryStream[EventStream.Event]
    def e(id: Long, u: Long, t: String, ms: Long) =
      EventStream.Event(id, new java.sql.Timestamp(ms), u, t, 0.0, "{}")
    val fq = EventStream.funnelStream(spark, ev.toDF(), Seq("view", "click"))
      .writeStream.format("memory").queryName("ballast_funnel")
      .outputMode("update").start()
    try {
      val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
      Seq(Seq(e(1, 1, "view", 1000)), Seq(e(2, 1, "click", 2000)),
          Seq(e(3, 2, "view", 3000))).foreach { batch =>
        ev.addData(batch: _*)
        fq.processAllAvailable()
        sizes += sc.getPersistentRDDs.size
      }
      assert(sizes.forall(_ == 0),
        s"stateful streaming op persisted RDDs in the block manager: $sizes")
    } finally fq.stop()
  }

  test("config-driven streaming pipeline: stream reader -> transform -> parquet sink") {
    val dir = java.nio.file.Files.createTempDirectory("streamcfg").toString
    val in = dir + "/in"
    val out = dir + "/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(in + "/part1.jsonl"),
      """{"id":1,"v":10}
{"id":2,"v":-3}
{"id":3,"v":7}""")
    // the SAME config dialect as batch; only "stream": true differs — the
    // transformer/validator machinery lifts onto the stream unchanged
    graft.pipeline.Pipeline.run(spark,
      s"""[
         | {"type":"reader","stream":true,
         |  "connector":{"type":"local","path":"$in"},
         |  "document":{"type":"jsonl"}},
         | {"type":"transformer","actions":[{"field":"v2","pattern":"v * 2"}]},
         | {"type":"writer","connector":{"type":"local","path":"$out"},
         |  "document":{"type":"parquet"}}
         |]""".stripMargin)
    val rows = spark.read.parquet(out).orderBy("id").collect()
    assert(rows.map(r => (r.getAs[Long]("id"), r.getAs[Long]("v2"))).toSeq ==
      Seq((1L, 20L), (2L, -6L), (3L, 14L)))
  }


  test("json-array file with entry_path parses under stream:true like batch") {
    // regression: loadStream used to infer the schema from the batch read
    // (multiLine + entry_path applied) but stream raw jsonl — an array
    // envelope silently became all-null columns instead of rows
    val dir = java.nio.file.Files.createTempDirectory("streamarr").toString
    val in = dir + "/in"
    val out = dir + "/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(in + "/envelope.json"),
      """{"meta": {"page": 1}, "data": [{"id": 1, "v": 5}, {"id": 2, "v": 6}]}""")
    graft.pipeline.Pipeline.run(spark,
      s"""[
         | {"type":"reader","stream":true,
         |  "connector":{"type":"local","path":"$in"},
         |  "document":{"type":"json","entry_path":"/data"}},
         | {"type":"writer","connector":{"type":"local","path":"$out"},
         |  "document":{"type":"parquet"}}
         |]""".stripMargin)
    val rows = spark.read.parquet(out).orderBy("id").collect()
    assert(rows.map(r => (r.getAs[Long]("id"), r.getAs[Long]("v"))).toSeq ==
      Seq((1L, 5L), (2L, 6L)))
  }

  test("training steps lift onto config streams: split + chunk") {
    // split (hash map) and chunk (sequence explode) are stateless column
    // transforms, so the same config runs batch or stream unchanged
    val dir = java.nio.file.Files.createTempDirectory("streamtrain").toString
    val in = dir + "/in"
    val out = dir + "/out"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(in + "/docs.jsonl"),
      """{"doc_id":1,"text":"a b c d e f g h i j"}
{"doc_id":2,"text":"k l m"}""")
    graft.pipeline.Pipeline.run(spark,
      s"""[
         | {"type":"reader","stream":true,
         |  "connector":{"type":"local","path":"$in"},"document":{"type":"jsonl"}},
         | {"type":"chunk","id":"doc_id","field":"text","max_tokens":4,"stride":3},
         | {"type":"writer","connector":{"type":"local","path":"$out"},
         |  "document":{"type":"parquet"}}
         |]""".stripMargin)
    val rows = spark.read.parquet(out)
    // doc 1: 10 tokens -> starts 0,3,6,9; doc 2: 3 tokens -> start 0
    assert(rows.count() == 5)
    assert(rows.filter(col("doc_id") === 1 && col("start_tok") === 9)
      .head().getAs[Long]("chunk_len") == 1L)
  }

  test("in_memory streaming sink buffers micro-batches via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    input.addData(
      EventStream.Event(1, ts(0), 1, "click", 1.0, "{}"),
      EventStream.Event(2, ts(1), 2, "view", 2.0, "{}"))
    val sink = graft.sources.InMemoryConnector("[]", "json")
    sink.saveStream(input.toDF().select(col("event_id"), col("event_type")))
    assert(sink.written.size == 2)
    assert(sink.written.exists(_.contains("\"event_type\":\"click\"")))
  }

  test("batch operators lift onto streams: validator rules + dedup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    input.addData(
      EventStream.Event(1, ts(0), 1, "click", 5.0, "{}"),
      EventStream.Event(1, ts(0), 1, "click", 5.0, "{}"),   // duplicate id
      EventStream.Event(2, ts(1), 2, "view", -3.0, "{}"))   // invalid value
    // the same Column-based rule machinery as the batch validator
    val rules = Seq((col("value") >= 0) -> "negative value")
    val err = nullif(concat_ws("; ",
      rules.map { case (ok, msg) => when(!ok, lit(msg)) }: _*), lit(""))
    val validated = input.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .withColumn("_error", err)
    val q = validated.writeStream.format("memory").queryName("lifted")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id, _error FROM lifted ORDER BY event_id").collect()
      assert(rows.length == 2) // dup dropped
      assert(rows(0).isNullAt(1))
      assert(rows(1).getString(1) == "negative value")
    } finally q.stop()
  }

  test("streaming text dedup by fingerprint (reorder-stable)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    input.addData(
      (1L, ts(0), "the quick brown fox"),
      (2L, ts(1), "fox brown quick the"),   // same fingerprint (reordered)
      (3L, ts(2), "a different document"))
    val deduped = input.toDF().toDF("id", "ts", "text")
      .withColumn("fp", operators.TextAnalysis.fingerprintSorted(col("text")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("SELECT id FROM sdedup ORDER BY id").collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L, 3L))
    } finally q.stop()
  }

  test("file json stream → parquet sink roundtrip") {
    val dir = java.nio.file.Files.createTempDirectory("stream").toString
    val inDir = dir + "/in"; val outDir = dir + "/out"; val ckpt = dir + "/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    Seq(EventStream.Event(1, ts(0), 1, "click", 1.0, "{}"),
        EventStream.Event(2, ts(1), 2, "view", 2.0, "{}"))
      .toDF().coalesce(1).write.json(inDir + "/batch0")
    val events = EventStream.readJsonStream(spark, inDir + "/*")
    val q = EventStream.writeParquetStream(events, outDir, ckpt)
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(outDir).count() == 2)
  }
}
