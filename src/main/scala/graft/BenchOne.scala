package graft
/** One-off steady-state re-measure of named queries (3 runs each, best
  * reported). SPARK_GRAFT_SF_DIR overrides the data dir (e.g. the
  * ScaleBench target/scale10x corpus); SPARK_GRAFT_NOOP=1 materializes
  * through the noop sink (the ScaleBench methodology) instead of count(). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val noop = sys.env.get("SPARK_GRAFT_NOOP").contains("1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Drop all cached data before every run (same discipline as Bench):
    // operators that MATERIALIZE their result (pageRank, jaccardJoin, the
    // ANN/BM25 family) otherwise make runs 2-3 CacheManager canonical-plan
    // hits — "best" would time a cache scan, not the query. Set
    // SPARK_GRAFT_KEEP_CACHE=1 to deliberately probe the cache-warm path.
    val keepCache = sys.env.get("SPARK_GRAFT_KEEP_CACHE").contains("1")
    args.foreach { n =>
      val times = (0 until 3).map { _ =>
        if (!keepCache) BenchUtil.dropBallast(spark)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, dir)
        if (noop) df.write.format("noop").mode("overwrite").save() else df.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"### $n best=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
