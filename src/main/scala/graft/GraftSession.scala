package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration: AQE with
  * skew-join handling, sane shuffle sizing, UTC, nanos-tolerant parquet,
  * and the graft SQL functions registered.
  *
  * At cluster scale the same settings hold — `shufflePartitions` should be
  * ~2-3× total executor cores (AQE coalesces down), and
  * `maxPartitionBytes` keeps scan tasks in the 128-256 MB sweet spot.
  */
object GraftSession {

  def builder(master: String = sys.env.getOrElse("SPARK_MASTER", "local[*]"),
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  /** Build the session and register graft's SQL functions. */
  def create(master: String = sys.env.getOrElse("SPARK_MASTER", "local[*]")): SparkSession = {
    val spark = builder(master).getOrCreate()
    plans.GraftExtensions.register(spark)
    spark
  }
}
