package graft
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    args.foreach { n =>
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"### $n best=${times.min}%.2f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
