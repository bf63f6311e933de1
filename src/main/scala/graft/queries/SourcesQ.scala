package graft.queries

import graft.Tables
import graft.pipeline.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/connector + pipeline-engine gate queries (SURVEY §2.2/§2.3).
  * Roundtrips write to a fresh temp dir then read back through the same
  * document layer — proving encode/decode, not just the read path. */
object SourcesQ {

  private def tempDir(prefix: String): String = TempDirs.create(prefix)

  /** Full config-driven pipeline: read parquet → transform (computed
    * column) → validate (split ok/err) → return the ok stream. */
  def qPipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    val config =
      s"""[
         | {"type": "reader",
         |  "connector": {"type": "local", "path": "$dir/orders.parquet"},
         |  "document": {"type": "parquet"}},
         | {"type": "transformer", "actions": [
         |   {"field": "price_band",
         |    "pattern": "CASE WHEN o_totalprice > 200000 THEN 'high' ELSE 'low' END",
         |    "type": "merge"}]},
         | {"type": "validator", "rules": {
         |   "price_pos": {"pattern": "o_totalprice > 1000", "message": "price too low"},
         |   "status_known": {"pattern": "o_orderstatus IN ('O','F','P')", "message": "bad status"}}}
         |]""".stripMargin
    val flow = Pipeline.run(spark, config)
    flow.ok.get.select(col("o_orderkey"), col("price_band"))
  }

  /** Config-driven STREAMING pipeline (58c promoted to a driver gate):
    * the SAME config dialect as [[qPipelineE2e]] with `"stream": true` on
    * the reader runs the real documents table through readStream → the
    * transformer machinery → the AvailableNow parquet sink, and the gate
    * returns the sink's contents — so the whole config-to-stream lift
    * (schema from one static pass, stateless transforms on the stream,
    * file sink commit protocol) sits under the DuckDB oracle instead of a
    * fixture spec. */
  def qStreamPipeline(spark: SparkSession, dir: String): DataFrame = {
    val stage = TempDirs.create("graft_spipe")
    // single-file table behind a directory source: symlink (zero-copy)
    // into a dedicated in/ dir — the sink and its checkpoint must live
    // OUTSIDE the watched directory, not beside the symlink
    val in = java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(stage, "in"))
    java.nio.file.Files.createSymbolicLink(
      in.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val out = s"$stage/out"
    val config =
      s"""[
         | {"type": "reader", "stream": true,
         |  "connector": {"type": "local", "path": "$in"},
         |  "document": {"type": "parquet"}},
         | {"type": "transformer", "actions": [
         |   {"field": "n_chars", "pattern": "CAST(length(text) AS BIGINT)",
         |    "type": "merge"}]},
         | {"type": "writer", "connector": {"type": "local", "path": "$out"},
         |  "document": {"type": "parquet"}}
         |]""".stripMargin
    Pipeline.run(spark, config)
    spark.read.parquet(out).select(col("doc_id"), col("n_chars"))
  }

  val qStreamPipelineSql: String =
    "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM documents"

  val qPipelineE2eSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 200000 THEN 'high' ELSE 'low' END AS price_band
      |FROM orders
      |WHERE o_totalprice > 1000 AND o_orderstatus IN ('O','F','P')""".stripMargin

  /** CSV encode → decode roundtrip, then aggregate (types re-cast after
    * inference so the oracle schema matches). */
  def qCsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tempDir("graft_csv")
    val flow = Pipeline.run(spark,
      s"""[
         | {"type": "reader",
         |  "connector": {"type": "local", "path": "$dir/customer.parquet"},
         |  "document": {"type": "parquet"}},
         | {"type": "writer",
         |  "connector": {"type": "local", "path": "$out/customer_csv"},
         |  "document": {"type": "csv"}}
         |]""".stripMargin)
    graft.sources.Documents.read(spark, "csv", s"$out/customer_csv")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("total_bal"))
  }

  val qCsvRoundtripSql: String =
    """SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
      |FROM customer GROUP BY c_mktsegment""".stripMargin

  /** ORC encode → decode roundtrip, then aggregate — same shape as the
    * CSV gate; proves the ORC encoder/decoder end-to-end (no inference
    * recast needed: ORC carries exact types). */
  def qOrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tempDir("graft_orc")
    Pipeline.run(spark,
      s"""[
         | {"type": "reader",
         |  "connector": {"type": "local", "path": "$dir/customer.parquet"},
         |  "document": {"type": "parquet"}},
         | {"type": "writer",
         |  "connector": {"type": "local", "path": "$out/customer_orc"},
         |  "document": {"type": "orc"}}
         |]""".stripMargin)
    graft.sources.Documents.read(spark, "orc", s"$out/customer_orc")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("total_bal"))
  }

  val qOrcRoundtripSql: String =
    """SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
      |FROM customer GROUP BY c_mktsegment""".stripMargin

  /** Shared roundtrip shape for the hand-rolled document codecs
    * (yaml/toml) and spark-native xml: write two customer columns through
    * the encoder, read back through the decoder, aggregate. The money sum
    * rides exact decimal (order-independent, bit-parity with the oracle)
    * rather than a rounded double. */
  private def docRoundtrip(spark: SparkSession, dir: String,
                           docType: String): DataFrame = {
    val out = tempDir(s"graft_$docType")
    graft.sources.Documents.write(
      Tables(spark, dir).customer.select(col("c_mktsegment"), col("c_acctbal")),
      docType, s"$out/customer_$docType")
    graft.sources.Documents.read(spark, docType, s"$out/customer_$docType")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast("decimal(12,2)")).cast("double").as("total_bal"))
  }

  private val docRoundtripSql: String =
    """SELECT c_mktsegment, count(*) AS n,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      |FROM customer GROUP BY c_mktsegment""".stripMargin

  def qYamlRoundtrip(spark: SparkSession, dir: String): DataFrame =
    docRoundtrip(spark, dir, "yaml")
  def qTomlRoundtrip(spark: SparkSession, dir: String): DataFrame =
    docRoundtrip(spark, dir, "toml")
  def qXmlRoundtrip(spark: SparkSession, dir: String): DataFrame =
    docRoundtrip(spark, dir, "xml")
  /** Avro container encode → decode roundtrip through the hand-rolled
    * avro-core codec ([[graft.sources.Avro]]) — same aggregate shape and
    * oracle as the other document roundtrips. */
  def qAvroRoundtrip(spark: SparkSession, dir: String): DataFrame =
    docRoundtrip(spark, dir, "avro")

  /** JSON-lines encode → decode roundtrip, then aggregate. */
  def qJsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = tempDir("graft_json")
    Tables(spark, dir).orders
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").json(s"$out/orders_json")
    spark.read.json(s"$out/orders_json")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
  }

  val qJsonRoundtripSql: String =
    """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_pipeline_e2e"  -> ((qPipelineE2e _, Some(qPipelineE2eSql))),
    "q_stream_pipeline" -> ((qStreamPipeline _, Some(qStreamPipelineSql))),
    "q_csv_roundtrip" -> ((qCsvRoundtrip _, Some(qCsvRoundtripSql))),
    "q_orc_roundtrip" -> ((qOrcRoundtrip _, Some(qOrcRoundtripSql))),
    "q_yaml_roundtrip" -> ((qYamlRoundtrip _, Some(docRoundtripSql))),
    "q_toml_roundtrip" -> ((qTomlRoundtrip _, Some(docRoundtripSql))),
    "q_xml_roundtrip" -> ((qXmlRoundtrip _, Some(docRoundtripSql))),
    "q_avro_roundtrip" -> ((qAvroRoundtrip _, Some(docRoundtripSql))),
    "q_json_roundtrip" -> ((qJsonRoundtrip _, Some(qJsonRoundtripSql))),
  )
}
