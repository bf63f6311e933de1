package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.sources.Documents.DocOptions

/** Connectors (reference: src/connector (Rust modules) — local, in_memory, cli, curl,
  * mongodb, psql, bucket, bucket_select), re-expressed Spark-first.
  *
  * - local/bucket are the same code path: a path (file:// or s3a://) read by
  *   Spark's datasource layer — the wildcard paginator is Spark's glob +
  *   file-split parallelism; "S3 Select" pushdown is Catalyst predicate/
  *   column pushdown, which the scan does natively.
  * - psql maps to Spark JDBC with partitioned reads.
  * - curl maps to a partitioned page-fetch (offset/cursor paginator becomes
  *   a page-per-partition plan). The HTTP call itself is injectable and the
  *   default transport refuses (this environment has zero egress) — the
  *   plumbing (pagination plan, parallelism, parsing) is real and tested.
  * - mongodb would ride the official Spark connector; modeled as config
  *   only (no driver jar in this environment).
  */
sealed trait Connector {
  def load(spark: SparkSession): DataFrame
  def save(df: DataFrame, mode: SaveMode = SaveMode.Overwrite): Unit =
    throw new UnsupportedOperationException(s"$this is read-only")
  /** Eraser-step support: remove the target's contents. */
  def erase(spark: SparkSession): Unit =
    throw new UnsupportedOperationException(s"$this cannot be erased")
}

/** Local filesystem (or any Hadoop-FS URI incl. s3a://) + document format.
  * Glob wildcards in `path` fan out to parallel file partitions. */
final case class LocalConnector(path: String, docType: String = "json",
                                opts: DocOptions = DocOptions(),
                                partitionBy: Seq[String] = Nil) extends Connector {
  override def load(spark: SparkSession): DataFrame =
    Documents.read(spark, docType, path, opts)
  override def save(df: DataFrame, mode: SaveMode): Unit =
    Documents.write(df, docType, path, opts, mode, partitionBy)
  override def erase(spark: SparkSession): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}

/** S3-style bucket — same scan machinery as local through s3a. */
final case class BucketConnector(bucket: String, key: String,
                                 docType: String = "json",
                                 opts: DocOptions = DocOptions()) extends Connector {
  private def uri = s"s3a://$bucket/$key"
  override def load(spark: SparkSession): DataFrame =
    Documents.read(spark, docType, uri, opts)
  override def save(df: DataFrame, mode: SaveMode): Unit =
    Documents.write(df, docType, uri, opts, mode)
}

/** Literal data carried in the config (reference: in_memory.rs). */
final case class InMemoryConnector(data: String, docType: String = "json") extends Connector {
  override def load(spark: SparkSession): DataFrame = {
    import spark.implicits._
    docType match {
      case "json" | "jsonl" => spark.read.json(Seq(data).toDS())
      case "csv" =>
        val lines = data.linesIterator.toSeq
        spark.read.option("header", value = true).option("inferSchema", value = true)
          .csv(lines.toDS())
      case other => throw new IllegalArgumentException(s"in_memory does not support $other")
    }
  }
}

/** stdin/stdout passthrough (reference: cli.rs). Driver-side by nature. */
final case class CliConnector(docType: String = "json") extends Connector {
  override def load(spark: SparkSession): DataFrame = {
    val content = scala.io.Source.stdin.mkString
    InMemoryConnector(content, docType).load(spark)
  }
  override def save(df: DataFrame, mode: SaveMode): Unit =
    df.toJSON.collect().foreach(println)
}

/** Relational DB via Spark JDBC (reference: psql.rs). `partitionColumn` +
  * bounds split the read across executors. */
final case class JdbcConnector(url: String, table: String,
                               user: String = "", password: String = "",
                               partitionColumn: Option[String] = None,
                               lowerBound: Long = 0, upperBound: Long = 0,
                               numPartitions: Int = 8) extends Connector {
  override def load(spark: SparkSession): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
    partitionColumn.foreach { c =>
      r = r.option("partitionColumn", c)
        .option("lowerBound", lowerBound).option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
    }
    r.load()
  }
  override def save(df: DataFrame, mode: SaveMode): Unit =
    df.write.format("jdbc").mode(mode)
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
      .save()
}

object HttpConnector {
  /** Page fetcher: pageIndex -> raw page body. Injectable for tests; the
    * default refuses — this environment is zero-egress. */
  type Fetch = Int => String
  val noTransport: Fetch = _ =>
    throw new UnsupportedOperationException("HTTP transport unavailable (no egress)")

  /** Auth header factories (reference: src/connector/authenticator). */
  def basicAuth(user: String, pass: String): (String, String) =
    "Authorization" -> ("Basic " + java.util.Base64.getEncoder
      .encodeToString(s"$user:$pass".getBytes("UTF-8")))
  def bearerAuth(token: String): (String, String) = "Authorization" -> s"Bearer $token"
  /** Pre-signed JWT pass-through (signing requires a key service). */
  def jwtAuth(token: String): (String, String) = bearerAuth(token)
}

/** HTTP endpoint with offset pagination (reference: curl.rs +
  * paginator/curl/offset.rs): `pages` page indices fetched one-per-task in
  * parallel, each page parsed as a JSON array/object body. */
final case class HttpConnector(endpoint: String, pages: Int = 1,
                               headers: Map[String, String] = Map.empty,
                               fetch: HttpConnector.Fetch = HttpConnector.noTransport)
    extends Connector {
  override def load(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val f = fetch
    // one page per partition: page fetches run concurrently on executors
    val bodies = spark.range(pages).repartition(pages)
      .mapPartitions(it => it.map(i => f(i.toInt)))
    spark.read.json(bodies)
  }
}

object CursorHttpConnector {
  /** Cursor fetch: (cursorOrNull) -> (body, nextCursorOrNull). */
  type CursorFetch = Option[String] => (String, Option[String])
}

/** Cursor-paginated HTTP source (reference: paginator/curl/cursor.rs).
  * Cursor chains are inherently sequential — each page's token comes from
  * the previous response — so pages are walked on the driver (bounded by
  * maxPages) and PARSING is distributed. Use offset pagination
  * (HttpConnector) when the API supports it; this exists for APIs that
  * only hand out next-tokens. */
final case class CursorHttpConnector(endpoint: String, maxPages: Int = 1000,
                                     fetch: CursorHttpConnector.CursorFetch =
                                       _ => throw new UnsupportedOperationException(
                                         "HTTP transport unavailable (no egress)"))
    extends Connector {
  override def load(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val bodies = scala.collection.mutable.ArrayBuffer.empty[String]
    var cursor: Option[String] = None
    var pages = 0
    var done = false
    while (!done && pages < maxPages) {
      val (body, next) = fetch(cursor)
      bodies += body
      cursor = next
      pages += 1
      done = next.isEmpty
    }
    spark.read.json(bodies.toSeq.toDS())
  }
}

/** MongoDB connector (reference: mongodb.rs). Config-parse parity only:
  * execution rides the official MongoDB Spark connector jar, which is not
  * present in this environment — load/save fail fast with a clear message
  * rather than a classpath error. */
final case class MongoConnector(uri: String, database: String, collection: String)
    extends Connector {
  private def unavailable = new UnsupportedOperationException(
    "MongoDB support requires the mongo-spark-connector jar on the classpath " +
      s"(would read $database.$collection from $uri)")
  override def load(spark: SparkSession): DataFrame = throw unavailable
  override def save(df: DataFrame, mode: SaveMode): Unit = throw unavailable
}

object Connector {
  /** Build from a chewdata-style connector config node. */
  def fromConfig(node: com.fasterxml.jackson.databind.JsonNode,
                 docType: String, opts: DocOptions): Connector = {
    def str(field: String, default: String = ""): String =
      if (node.has(field)) node.get(field).asText() else default
    str("type", "local") match {
      case "local" | "l"          =>
        val parts = Option(node.get("partition_by"))
          .map(n => scala.jdk.CollectionConverters.IteratorHasAsScala(n.elements()).asScala.map(_.asText()).toSeq)
          .getOrElse(Nil)
        LocalConnector(str("path"), docType, opts, parts)
      case "mem" | "in_memory"    => InMemoryConnector(str("data"), docType)
      case "cli" | "io"           => CliConnector(docType)
      case "bucket" | "bucket_select" => BucketConnector(str("bucket"), str("key"), docType, opts)
      case "psql" | "jdbc"        => JdbcConnector(str("url"), str("table"),
        str("user"), str("password"))
      case "curl"                 => HttpConnector(str("endpoint"),
        if (node.has("pages")) node.get("pages").asInt() else 1)
      case "mongodb" | "mongo"    => MongoConnector(str("endpoint"), str("database"),
        str("collection"))
      case other => throw new IllegalArgumentException(s"unknown connector type: $other")
    }
  }
}
