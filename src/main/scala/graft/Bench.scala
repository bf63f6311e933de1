package graft

import org.apache.spark.sql.SparkSession

/** Headline bench over the registered gate set at SPARK_GRAFT_SF_DIR.
  *
  * r16: the sweep is SHARDED across K sequential child JVMs (default 4).
  * Rationale (VERDICT r15 #1): a 217-gate single-JVM sweep accumulates
  * run-order heap history that inflates late heavy gates 2-6x their
  * isolated cost (in-suite total 1.43x the anchor on unchanged code),
  * and the r13 A/B showed a forced System.gc() in the untimed gap reads
  * NET-WORSE — the only fix that removes heap history is a fresh JVM.
  * The coordinator deterministically bin-packs gates into K shards by
  * their BASELINE.md cost (LPT), forks one child per shard SEQUENTIALLY
  * (each child gets all cores and a fresh heap), merges the shard JSONs,
  * and emits the same artifacts as before: BENCH_FULL.json + the one
  * budgeted stdout line. Gates missing a shard result (child crash) are
  * re-run in-process so the artifact is always complete.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val shardId = sys.env.get("SPARK_GRAFT_SHARD_ID")
    val shards = sys.env.getOrElse("SPARK_GRAFT_SHARDS", "4").toInt
    // Coordinator mode: full sweep requested (no dev-loop filter, not a
    // child) and sharding enabled. A dev-loop SPARK_GRAFT_ONLY run keeps
    // the old single-JVM path (it is short by construction).
    if (shardId.isEmpty && only.isEmpty && shards > 1) coordinate(sfDir, shards)
    else {
      val outPath = shardId match {
        case Some(id) => s"BENCH_SHARD_$id.json"
        case None => if (only.isEmpty) "BENCH_FULL.json" else "BENCH_PARTIAL.json"
      }
      val results = sweep(sfDir, only)
      val isolated = adjudicate(results, sfDir)
      writeFull(outPath, results, isolated, sfDir)
      // Children write their file and stay quiet on stdout (the harness
      // reads the coordinator's tail); solo/dev runs print the line.
      if (shardId.isEmpty) printBudgeted(results, isolated, sfDir)
      if (sharedSpark != null) sharedSpark.stop()
    }
  }

  // ---------------------------------------------------------------- sweep

  private var sharedSpark: SparkSession = _
  private def spark(): SparkSession = {
    if (sharedSpark == null) {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
      sharedSpark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      sharedSpark.sparkContext.setLogLevel("WARN")
      // JVM/codegen warmup outside the timed section (first action in a
      // fresh JVM pays ~4s of Spark bootstrap unrelated to any query).
      try SparkEntry.entry(sharedSpark).count() catch { case _: Throwable => () }
    }
    sharedSpark
  }

  private def sweep(sfDir: String, only: Option[Set[String]]): Seq[(String, Double)] = {
    val s = spark()
    // best-of-2 per query: one shared JVM means JIT/GC/run-order noise can
    // swamp sub-second queries; the min of two back-to-back runs is the
    // steady-state cost of the plan, which is the number that scales.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    // Cache-ballast discipline: drop all persisted data between queries so
    // each timing reads the PLAN, not the heap history (see BenchUtil).
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        // One UNTIMED warm-up execution per query: the first run of a plan
        // in a JVM pays one-off Janino codegen + JIT.
        BenchUtil.dropBallast(s)
        try { fn(s, sfDir).count() } catch { case _: Throwable => () }
        val times = (0 until math.max(runs, 1)).map { _ =>
          BenchUtil.dropBallast(s)
          val t0 = System.nanoTime()
          try { fn(s, sfDir).count() } catch { case _: Throwable => -1L }
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.min
      }
  }

  private def parseBaseline(): Map[String, Double] = {
    val f = new java.io.File("BASELINE.md")
    if (!f.exists()) Map.empty
    else {
      val row = """\|\s*(q\S+)\s*\|\s*([0-9.]+)\s*\|""".r
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().collect { case row(g, s) => g -> s.toDouble }.toMap
      finally src.close()
    }
  }

  /** Self-adjudication (VERDICT r13 #2): re-measure every gate whose
    * in-suite time exceeded 2x its BASELINE.md row (3 runs, fresh ballast
    * drop, best); a run that THROWS must not publish its fast-failure
    * elapsed time — all-failed records the -1 sentinel.
    *
    * r17 (VERDICT r16 #2): the fixed 2x-anchor trigger tripped 83/222
    * gates when machine drift inflated the whole suite — the anchor is a
    * point-in-time recording on a box whose CPU speed drifts ~2x. The
    * trigger is now drift-relative: the threshold scales by the suite's
    * median in-suite/anchor ratio (>= 1, so a fast box never loosens it),
    * and sub-second readings are never adjudicated (a 0.3 s gate reading
    * 0.7 s is JVM noise, not a plan regression — 3 extra runs apiece for
    * dozens of such gates is what blew up the r16 isolated map). */
  private def adjudicate(results: Seq[(String, Double)], sfDir: String): Seq[(String, Double)] = {
    val baseline = parseBaseline()
    val ratios = results
      .flatMap { case (n, t) => baseline.get(n).filter(_ > 0).map(t / _) }
      .sorted
    val drift =
      if (ratios.isEmpty) 1.0 else math.max(1.0, ratios(ratios.length / 2))
    results.collect {
      case (name, t) if t > 1.0 &&
          baseline.get(name).exists(b => t > 2.0 * b * drift) =>
        val s = spark()
        val fn = SparkEntry.queries(name)
        val times = (0 until 3).flatMap { _ =>
          BenchUtil.dropBallast(s)
          val t0 = System.nanoTime()
          val ok = try { fn(s, sfDir).count(); true }
                   catch { case _: Throwable => false }
          if (ok) Some((System.nanoTime() - t0) / 1e9) else None
        }
        name -> (if (times.isEmpty) -1.0 else times.min)
    }
  }

  // ---------------------------------------------------------- coordinator

  private def coordinate(sfDir: String, shards: Int): Unit = {
    val gates = SparkEntry.queries.keys.toSeq.sorted
    val baseline = parseBaseline()
    // Deterministic LPT bin-packing on the anchor cost (unknown gates get
    // a nominal 0.3 s): heaviest first into the least-loaded shard, ties
    // broken by name / shard id, so the assignment is stable run-to-run.
    val loads = Array.fill(shards)(0.0)
    val bins = Array.fill(shards)(List.empty[String])
    gates.map(g => (g, baseline.getOrElse(g, 0.3)))
      .sortBy { case (g, c) => (-c, g) }
      .foreach { case (g, c) =>
        val i = (0 until shards).minBy(j => (loads(j), j))
        loads(i) += c; bins(i) ::= g
      }
    val assignment = bins.map(_.sorted)
    val merged = scala.collection.mutable.LinkedHashMap[String, Double]()
    val mergedIso = scala.collection.mutable.LinkedHashMap[String, Double]()
    val forkOk = (0 until shards).forall { i =>
      val f = new java.io.File(s"BENCH_SHARD_$i.json")
      if (f.exists()) f.delete()
      forkChild(i, assignment(i)) && f.exists()
    }
    if (forkOk) {
      (0 until shards).foreach { i =>
        val (qs, iso) = parseShard(s"BENCH_SHARD_$i.json")
        qs.foreach { case (k, v) => merged(k) = v }
        iso.foreach { case (k, v) => mergedIso(k) = v }
      }
    }
    // Completeness backstop: any gate missing a shard result (fork
    // infrastructure failure, child crash) re-runs in-process so the
    // driver artifact is never partial.
    val missing = gates.filterNot(merged.contains).toSet
    if (missing.nonEmpty) {
      System.err.println(s"[bench] re-running ${missing.size} gates in-process (shard gap)")
      val res = sweep(sfDir, Some(missing))
      res.foreach { case (k, v) => merged(k) = v }
      adjudicate(res, sfDir).foreach { case (k, v) => mergedIso(k) = v }
    }
    val results = merged.toSeq.sortBy(_._1)
    val isolated = mergedIso.toSeq.sortBy(_._1)
    writeFull("BENCH_FULL.json", results, isolated, sfDir)
    printBudgeted(results, isolated, sfDir)
    if (sharedSpark != null) sharedSpark.stop()
  }

  /** Fork one shard child: same JVM (java.home), same VM options
    * (add-opens, -Xmx, -D props — run/fork:=true means they are real),
    * same classpath; child stdout+stderr go to BENCH_SHARD_i.log so the
    * coordinator's final budgeted line owns the process tail the harness
    * parses. Children run SEQUENTIALLY: the point is a fresh heap per
    * ~55 gates, not parallelism — each child gets all cores. */
  private def forkChild(i: Int, gates: Seq[String]): Boolean = {
    try {
      import scala.jdk.CollectionConverters._
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val vmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq
        .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
      val cp = System.getProperty("java.class.path")
      val cmd = (Seq(javaBin) ++ vmArgs ++ Seq("-cp", cp, "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.directory(new java.io.File("."))
      pb.environment().put("SPARK_GRAFT_SHARD_ID", i.toString)
      pb.environment().put("SPARK_GRAFT_ONLY", gates.mkString(","))
      pb.redirectErrorStream(true)
      pb.redirectOutput(new java.io.File(s"BENCH_SHARD_$i.log"))
      val p = pb.start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }
  }

  private def parseShard(path: String): (Seq[(String, Double)], Seq[(String, Double)]) = {
    val txt = try {
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)
    } catch { case _: Throwable => return (Nil, Nil) }
    def obj(key: String): Seq[(String, Double)] = {
      val start = txt.indexOf("\"" + key + "\":{")
      if (start < 0) return Nil
      val open = txt.indexOf('{', start)
      val close = txt.indexOf('}', open)
      if (close < 0) return Nil
      val pair = """"([^"]+)":(-?[0-9][0-9.eE+-]*)""".r
      pair.findAllMatchIn(txt.substring(open, close + 1))
        .map(m => m.group(1) -> m.group(2).toDouble).toSeq
    }
    (obj("queries"), obj("isolated"))
  }

  // ------------------------------------------------------------ artifacts

  /** Full-precision record for humans / the repo history. */
  private def writeFull(path: String, results: Seq[(String, Double)],
                        isolated: Seq[(String, Double)], sfDir: String): Unit = {
    val total = results.map(_._2).sum
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullIso = isolated.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"isolated":$fullIso,"sf":"$sfDir"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // r17 (VERDICT r16 #1): the 32-core BENCH_FULL of the driver's main
    // run was overwritten by the subsequent 8-core scaling run, losing the
    // per-query record. Keep a per-core-count copy alongside.
    if (path == "BENCH_FULL.json") {
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"BENCH_FULL_c$cpus.json"),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** The harness that consumes stdout keeps only the last ~2000 chars, so
    * the line is budgeted: slowest queries individually (the ones that
    * matter for a perf read), the rest aggregated, under 1800 bytes.
    *
    * r17 (VERDICT r16 #1): the r14-r16 version subtracted the FULL
    * isolated map from the budget BEFORE fitting any query; on a drifted
    * run with dozens of adjudicated gates that drove the budget negative
    * and the line shipped `"queries":{}` — the round's entire per-query
    * ground truth was lost. The queries map is now budgeted FIRST (the
    * slowest gates are what the driver diffs round-over-round) and the
    * isolated map gets only the remaining space, slowest entries first;
    * neither map can ever render the other empty. BENCH_FULL.json always
    * carries both maps in full. */
  private def printBudgeted(results: Seq[(String, Double)],
                            isolated: Seq[(String, Double)], sfDir: String): Unit = {
    val total = results.map(_._2).sum
    def fmt(v: Double): String = f"$v%.3f"
    def entry(k: String, v: Double): String = "\"" + k + "\":" + fmt(v)
    def cost(k: String, v: Double): Int = entry(k, v).length + 1 // comma
    val header =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":{"""
    // Worst-case fixed parts reserved up front so the budget can't go
    // negative: the other_n/other_sec aggregate, an (possibly empty)
    // isolated wrapper, and the trailer.
    val fixed =
      s"""},"other_n":${results.length},"other_sec":${fmt(total)}""" +
        s""","isolated":{}""" + s""","sf":"$sfDir"}"""
    val budget = 1800 - header.length - fixed.length
    val sortedDesc = results.sortBy(-_._2)
    var used = 0
    val kept = sortedDesc.takeWhile { case (k, v) =>
      if (used + cost(k, v) <= budget) { used += cost(k, v); true } else false
    }
    val rest = sortedDesc.drop(kept.length)
    val isoRoom = budget - used
    var isoUsed = 0
    val isoKept = isolated.sortBy(-_._2).takeWhile { case (k, v) =>
      if (isoUsed + cost(k, v) <= isoRoom) { isoUsed += cost(k, v); true }
      else false
    }
    val keptQs = kept.map { case (k, v) => entry(k, v) }.mkString(",")
    val otherPart =
      if (rest.isEmpty) ""
      else s""","other_n":${rest.length},"other_sec":${fmt(rest.map(_._2).sum)}"""
    val isoPart = s""","isolated":{${isoKept.sortBy(_._1)
      .map { case (k, v) => entry(k, v) }.mkString(",")}}"""
    println(header + keptQs + "}" + otherPart + isoPart + s""","sf":"$sfDir"}""")
  }
}
