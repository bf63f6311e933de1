package graft.queries

import graft.Tables
import graft.functions.{Faker, JsonFns, ObjectFns, StringFns, Template}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ETL-step + function-surface queries (SURVEY §2.2, §2.4).
  *
  * Each query exercises a chewdata step/helper re-expressed Spark-first and
  * is checked against a DuckDB oracle computing the same *result* (the oracle
  * does not mirror the implementation).
  */
object EtlSteps {

  /** Transformer actions (merge computed field / replace / remove / rename),
    * reference: src/step/transformer.rs action model. One narrow projection —
    * Catalyst prunes unread columns out of the scan. */
  def qTransformActions(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders.select(
      col("o_orderkey"),
      lower(col("o_orderstatus")).as("status_lc"),
      (col("o_totalprice") * 1.1).as("price_with_tax"),
      split(col("o_orderpriority"), "-").getItem(0).cast("int").as("priority_code"),
      concat(lit("order-"), col("o_orderkey")).as("slug"))

  val qTransformActionsSql: String =
    """SELECT o_orderkey, lower(o_orderstatus) AS status_lc,
      |  o_totalprice * 1.1 AS price_with_tax,
      |  CAST(string_split(o_orderpriority, '-')[1] AS INT) AS priority_code,
      |  'order-' || o_orderkey AS slug
      |FROM orders""".stripMargin

  /** Validator rules → `_error` channel (reference: src/step/validator.rs).
    * Rules evaluate as Column predicates in one pass; failures concatenate
    * into `_error` (null = ok-stream). */
  def qValidator(spark: SparkSession, dir: String): DataFrame = {
    val rules: Seq[(org.apache.spark.sql.Column, String)] = Seq(
      (col("l_quantity") <= 45)   -> "quantity gt 45",
      (col("l_discount") <= 0.07) -> "discount gt 0.07",
      (col("l_tax") >= 0.01)      -> "tax lt 0.01")
    val err = nullif(concat_ws("; ",
      rules.map { case (ok, msg) => when(!ok, lit(msg)) }: _*), lit(""))
    Tables(spark, dir).lineitem
      .select(col("l_orderkey"), col("l_linenumber"), err.as("_error"))
      .withColumn("is_valid", col("_error").isNull)
  }

  val qValidatorSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  nullif(concat_ws('; ',
      |    CASE WHEN NOT (l_quantity <= 45) THEN 'quantity gt 45' END,
      |    CASE WHEN NOT (l_discount <= 0.07) THEN 'discount gt 0.07' END,
      |    CASE WHEN NOT (l_tax >= 0.01) THEN 'tax lt 0.01' END), '') AS "_error",
      |  nullif(concat_ws('; ',
      |    CASE WHEN NOT (l_quantity <= 45) THEN 'quantity gt 45' END,
      |    CASE WHEN NOT (l_discount <= 0.07) THEN 'discount gt 0.07' END,
      |    CASE WHEN NOT (l_tax >= 0.01) THEN 'tax lt 0.01' END), '') IS NULL AS is_valid
      |FROM lineitem""".stripMargin

  /** Referential lookup (reference: src/step/referential.rs) — a broadcast
    * join, the Spark-native "referential in memory". */
  def qReferential(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("nation_name"))
  }

  val qReferentialSql: String =
    """SELECT c_custkey, n_name AS nation_name
      |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  /** Generator step (reference: src/step/generator.rs): N synthetic records,
    * distributed via spark.range (no driver loop), faker columns in modulo
    * mode so the oracle can reproduce them. */
  def qGenerator(spark: SparkSession, dir: String): DataFrame = {
    val n = 1000
    spark.range(n).select(
      col("id"),
      Faker.pickMod(Faker.firstNames, col("id")).as("first_name"),
      Faker.pickMod(Faker.countryCodes, col("id") * 7).as("country_code"),
      concat(lower(Faker.pickMod(Faker.firstNames, col("id"))), lit("."),
        col("id").cast("string"), lit("@example.com")).as("email"))
  }

  val qGeneratorSql: String = {
    def sqlArr(vs: Seq[String]) = vs.map(v => s"'$v'").mkString("[", ", ", "]")
    s"""SELECT i AS id,
       |  (${sqlArr(Faker.firstNames)})[CAST(i % 10 AS INT) + 1] AS first_name,
       |  (${sqlArr(Faker.countryCodes)})[CAST((i * 7) % 10 AS INT) + 1] AS country_code,
       |  lower((${sqlArr(Faker.firstNames)})[CAST(i % 10 AS INT) + 1]) || '.' || i || '@example.com' AS email
       |FROM range(0, 1000) t(i)""".stripMargin
  }

  /** json_pointer over the dynamic `props` JSON column. */
  def qJsonPointer(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events.select(
      col("event_id"),
      JsonFns.jsonPointerLong(col("props"), "/k").as("k_value"))

  val qJsonPointerSql: String =
    """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k_value FROM events""".stripMargin

  /** Checksum helpers (md5/sha256). */
  def qChecksum(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).customer.select(
      col("c_custkey"),
      StringFns.checksumMd5(col("c_name")).as("md5_name"),
      StringFns.checksumSha256(col("c_name")).as("sha256_name"))

  val qChecksumSql: String =
    """SELECT c_custkey, md5(c_name) AS md5_name, sha256(c_name) AS sha256_name
      |FROM customer""".stripMargin

  /** base64 encode/decode roundtrip. */
  def qBase64(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).region.select(
      col("r_regionkey"),
      StringFns.base64Encode(col("r_name")).as("b64"),
      StringFns.base64Decode(StringFns.base64Encode(col("r_name"))).as("roundtrip"))

  val qBase64Sql: String =
    """SELECT r_regionkey, base64(encode(r_name)) AS b64, r_name AS roundtrip
      |FROM region""".stripMargin

  /** find/extract regex + core string ops. */
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part.select(
      col("p_partkey"),
      regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
      StringFns.slugify(col("p_name")).as("name_slug"),
      size(split(col("p_name"), " ")).as("n_words"),
      lpad(col("p_size").cast("string"), 4, "0").as("size_padded"))

  val qStringFuncsSql: String =
    """SELECT p_partkey, regexp_extract(p_type, '^(\w+)', 1) AS type_head,
      |  regexp_replace(regexp_replace(regexp_replace(lower(trim(p_name)), '[^a-z0-9]+', '-', 'g'), '^-', ''), '-$', '') AS name_slug,
      |  CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
      |FROM part""".stripMargin

  /** Object fns: build a map from the dynamic JSON + typed cols, rename a
    * key, bucket a value — output scalars for oracle comparison. */
  def qObjectFns(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
    val obj = map(
      lit("type"), col("event_type"),
      lit("k"), JsonFns.jsonPointer(col("props"), "/k"))
    val renamed = ObjectFns.replaceKey(obj, "k", "key_id")
    val bucketed = ObjectFns.mapValues(
      ObjectFns.extract(renamed, Seq("key_id")),
      v => when(v.cast("bigint") > 50, lit("high")).otherwise(lit("low")))
    e.select(
      col("event_id"),
      concat_ws(",", ObjectFns.keys(renamed)).as("keys_joined"),
      element_at(renamed, "key_id").cast("bigint").as("key_id"),
      element_at(bucketed, "key_id").as("bucket"))
  }

  val qObjectFnsSql: String =
    """SELECT event_id, 'key_id,type' AS keys_joined,
      |  CAST(props->>'k' AS BIGINT) AS key_id,
      |  CASE WHEN CAST(props->>'k' AS BIGINT) > 50 THEN 'high' ELSE 'low' END AS bucket
      |FROM events""".stripMargin

  /** Tera control flow compiled to Columns (reference: src/updater/tera.rs —
    * chewdata patterns are full tera, with `{% if %}`/`{% for %}`):
    * the CASE chain comes from `{% if/elif/else %}`, the per-row loop from
    * `{% for %}` over a split array — all plan-time compilation, zero
    * interpreter in the row loop. */
  def qTemplateControl(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.select(
      col("doc_id"),
      Template.render("{% if n_chars > 500 %}long{% elif n_chars > 100 %}medium" +
        "{% else %}short{% endif %}:{{ lang | upper }}").as("size_class"),
      Template.render("{% for t in text | split(pat=\" \") %}[{{ t | upper }}]{% endfor %}")
        .as("spans"))

  val qTemplateControlSql: String =
    """SELECT doc_id,
      |  (CASE WHEN n_chars > 500 THEN 'long' WHEN n_chars > 100 THEN 'medium'
      |        ELSE 'short' END) || ':' || upper(lang) AS size_class,
      |  array_to_string(list_transform(string_split(text, ' '),
      |    t -> '[' || upper(t) || ']'), '') AS spans
      |FROM documents""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_transform_actions" -> ((qTransformActions _, Some(qTransformActionsSql))),
    "q_template_control"  -> ((qTemplateControl _, Some(qTemplateControlSql))),
    "q_validator"         -> ((qValidator _, Some(qValidatorSql))),
    "q_referential"       -> ((qReferential _, Some(qReferentialSql))),
    "q_generator"         -> ((qGenerator _, Some(qGeneratorSql))),
    "q_json_pointer"      -> ((qJsonPointer _, Some(qJsonPointerSql))),
    "q_checksum"          -> ((qChecksum _, Some(qChecksumSql))),
    "q_base64"            -> ((qBase64 _, Some(qBase64Sql))),
    "q_string_funcs"      -> ((qStringFuncs _, Some(qStringFuncsSql))),
    "q_object_fns"        -> ((qObjectFns _, Some(qObjectFnsSql))),
  )
}
