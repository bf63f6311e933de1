package graft.plans

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}

/** Column-API entry points for the native expressions. */
object Native {
  def cosineSim(a: Column, b: Column): Column = toCol(CosineSim(toExpr(a), toExpr(b)))

  def dotProduct(a: Column, b: Column): Column = toCol(DotProduct(toExpr(a), toExpr(b)))

  def minhashSig(tokens: Column, shingleN: Int = 3, k: Int = 64): Column =
    toCol(MinHashSig(toExpr(tokens), shingleN, k))

  def bandKeys(sig: Column, bands: Int = 16): Column =
    toCol(BandKeys(toExpr(sig), bands))

  def simhash64(tokens: Column): Column = toCol(SimHash64(toExpr(tokens)))

  def hamming(a: Column, b: Column): Column = toCol(HammingDist(toExpr(a), toExpr(b)))

  def deflateLen(text: Column): Column = toCol(DeflateLen(toExpr(text)))

  def textNorm(text: Column): Column = toCol(TextNorm(toExpr(text)))

  /** One-pass codepoint histogram stats: struct(n_cp, distinct_cp,
    * top_cp_n, sumsq) — the character-diversity quality signals. */
  def charDiversity(text: Column): Column = toCol(CharDiversity(toExpr(text)))

  /** Winnowing fingerprint selection over a token array (rightmost-min
    * per w-window of word-k-gram hashes) — one map-side deque pass. */
  def winnowSelect(tokens: Column, k: Int, w: Int): Column =
    toCol(WinnowSelect(toExpr(tokens), k, w))

  /** Aggregate: element-wise sum of array<double> rows (map-side partial). */
  def vectorSum(v: Column): Column = toCol(VectorSum(toExpr(v)).toAggregateExpression())

  /** Aggregate: exact integer first+second moments of an array<long>
    * vector column in one [n | Σqᵢ | upper-triangle Σqᵢqⱼ] buffer. */
  def vectorMoments(v: Column): Column =
    toCol(VectorMoments(toExpr(v)).toAggregateExpression())

  /** Aggregate: best-k (score, id) pairs by (score DESC, id ASC) as a
    * bounded heap — partial buffers trim to k map-side. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    toCol(TopKByScore(toExpr(score), toExpr(id), k).toAggregateExpression())

  /** Aggregate: best-k (score, string payload) pairs by (score DESC,
    * payload ASC) — the string-keyed [[topKByScore]] (distinctive terms,
    * top docs) with the same map-side bounded heap. */
  def topKByScoreStr(score: Column, payload: Column, k: Int): Column =
    toCol(TopKByScoreStr(toExpr(score), toExpr(payload), k).toAggregateExpression())

  /** Aggregate: the k SMALLEST (key, payload) pairs by key, as a bounded
    * k-entry heap — the LSH bucket cap with the bound inside the buffer. */
  def minKByKey(key: Column, payload: Column, k: Int): Column =
    toCol(MinKByKey(toExpr(key), toExpr(payload), k).toAggregateExpression())

  /** Aggregate: the k smallest DISTINCT longs (KMV / bottom-k sketch) —
    * ≤ k-long buffer, duplicates absorbed on insert. */
  def bottomKDistinct(v: Column, k: Int): Column =
    toCol(BottomKDistinct(toExpr(v), k).toAggregateExpression())

  /** Aggregate: Misra-Gries frequent-items summary (≤ k counters per
    * buffer; any value with frequency > N/(k+1) is guaranteed kept). */
  def misraGries(v: Column, k: Int): Column =
    toCol(MisraGries(toExpr(v), k).toAggregateExpression())

  /** BPE segmentation of an array<string> word column with a trained
    * merge list (replayed in rank order, one greedy pass each). */
  def bpeEncode(words: Column, merges: Seq[(String, String)]): Column =
    toCol(BpeEncode(toExpr(words), merges))

  /** Sorted-distinct dictionary patterns occurring in a text as
    * substrings — one Aho-Corasick pass however large the dictionary. */
  def dictMatch(text: Column, dict: Seq[String]): Column =
    toCol(DictMatch(toExpr(text), dict))
}

/** SQL-side registration: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (or GraftExtensions.register(spark) on a live session) exposes the
  * native expressions as SQL functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.plans." + name, name)

  import org.apache.spark.sql.graftbridge.Bridge
  private def colFn1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Seq[Expression] => Expression =
    es => Bridge.toCatalyst(f(Bridge.column(es.head)))

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine", info("CosineSim", "cosine similarity of two double arrays"),
      (e: Seq[Expression]) => CosineSim(e(0), e(1))),
    ("graft_dot", info("DotProduct", "dot product of two double arrays"),
      (e: Seq[Expression]) => DotProduct(e(0), e(1))),
    ("graft_minhash_sig", info("MinHashSig", "minhash signature of a token array"),
      (e: Seq[Expression]) => MinHashSig(e(0), 3, 64)),
    ("graft_simhash64", info("SimHash64", "64-bit simhash of a token array"),
      (e: Seq[Expression]) => SimHash64(e(0))),
    ("graft_hamming", info("HammingDist", "hamming distance of two longs"),
      (e: Seq[Expression]) => HammingDist(e(0), e(1))),
    ("graft_deflate_len", info("DeflateLen", "DEFLATE-compressed byte length of a string"),
      (e: Seq[Expression]) => DeflateLen(e(0))),
    ("graft_text_norm", info("TextNorm", "NFKD fold: drop accents, compatibility forms, case"),
      (e: Seq[Expression]) => TextNorm(e(0))),
    ("graft_char_diversity", info("CharDiversity",
      "codepoint histogram stats: struct(n_cp, distinct_cp, top_cp_n, sumsq)"),
      (e: Seq[Expression]) => CharDiversity(e(0))),
    // aggregate: the analyzer wraps bare AggregateFunctions on resolution
    ("graft_vector_sum", info("VectorSum", "element-wise sum of double arrays"),
      (e: Seq[Expression]) => VectorSum(e(0))),
    ("graft_top_k", info("TopKByScore", "best-k (score,id) pairs, (score DESC, id ASC)"),
      (e: Seq[Expression]) => TopKByScore(e(0), e(1), e(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_top_k needs a literal int k, got $other")
      })),
    ("graft_min_k", info("MinKByKey", "k smallest (key,payload) pairs, key-ascending"),
      (e: Seq[Expression]) => MinKByKey(e(0), e(1), e(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_min_k needs a literal int k, got $other")
      })),
    ("graft_bottom_k", info("BottomKDistinct", "k smallest distinct longs (KMV sketch)"),
      (e: Seq[Expression]) => BottomKDistinct(e(0), e(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_bottom_k needs a literal int k, got $other")
      })),
    ("graft_misra_gries", info("MisraGries", "frequent-items summary, ≤ k counters"),
      (e: Seq[Expression]) => MisraGries(e(0), e(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_misra_gries needs a literal int k, got $other")
      })),
    ("graft_int8_quant", info("Int8QuantStats", "symmetric int8 quantization stats of a double array"),
      (e: Seq[Expression]) => Int8QuantStats(e(0))),
    // tera-helper surface, callable from SQL and config patterns
    ("graft_slugify", info("StringFns", "lowercase-alnum slug"),
      colFn1(graft.functions.StringFns.slugify)),
    ("graft_token_count", info("TextAnalysis", "whitespace token count"),
      colFn1(graft.operators.TextAnalysis.tokenCountWs)),
    ("graft_lang_id", info("TextAnalysis", "stopword-profile language id"),
      colFn1(graft.operators.TextAnalysis.langId)),
    ("graft_quality_score", info("TextAnalysis", "heuristic text quality in [0,1]"),
      colFn1(graft.operators.TextAnalysis.qualityScore)),
    ("graft_fingerprint", info("TextAnalysis", "sorted-token md5 fingerprint"),
      colFn1(graft.operators.TextAnalysis.fingerprintSorted)),
    ("graft_url_key", info("Web", "canonical URL dedup key (C4 web pass)"),
      colFn1(graft.operators.Web.urlKey)),
    ("graft_url_host", info("Web", "normalized URL hostname (www/port stripped)"),
      colFn1(graft.operators.Web.urlHost)),
    ("graft_html_text", info("Web", "HTML to plain text (C4 extraction pass)"),
      colFn1(graft.operators.Web.htmlToText)),
    ("graft_html_links", info("Web", "href targets of an HTML page, in order"),
      colFn1(graft.operators.Web.htmlLinks)),
    ("graft_dedup_lines", info("TextAnalysis", "drop repeated lines within a document (C4 line rule)"),
      colFn1(graft.operators.TextAnalysis.dedupLines)),
    ("graft_scrub_pii", info("TextAnalysis", "mask emails/phones/ips/ssns in a text"),
      colFn1(graft.operators.TextAnalysis.scrubPii)),
    ("graft_markdown_text", info("Web", "Markdown to plain text (extraction pass)"),
      colFn1(graft.operators.Web.markdownToText)),
    ("graft_markdown_links", info("Web", "inline-link targets of a markdown doc, in order"),
      colFn1(graft.operators.Web.markdownLinks)),
    ("graft_dict_match", info("DictMatch", "dictionary patterns present in a text (Aho-Corasick)"),
      (e: Seq[Expression]) => {
        if (!e(1).foldable) throw new IllegalArgumentException(
          "graft_dict_match needs a literal array of patterns, got " + e(1))
        val arr = e(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val dict = (0 until arr.numElements())
          .map(i => arr.getUTF8String(i).toString)
        DictMatch(e(0), dict)
      }),
  ) ++
    // the full faker registry (reference: tera.rs:46-81 registers ~35
    // fake_* functions) — graft_fake_*(seed) each, seed-deterministic
    graft.functions.Faker.registry.toSeq.sortBy(_._1).map { case (name, fn) =>
      ("graft_" + name, info("Faker", s"deterministic $name from a seed"), colFn1(fn))
    }

  /** Imperative registration for sessions built without the extension. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = org.apache.spark.sql.graftbridge.Bridge.functionRegistry(spark)
    functions.foreach { case (name, inf, builder) =>
      reg.registerFunction(FunctionIdentifier(name), inf, builder)
    }
  }
}

/** Additional Column wrappers (appended with the second expression batch). */
object NativeSets {
  import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}
  import org.apache.spark.sql.Column

  def hashedSet(tokens: Column, shingleN: Int = 1): Column =
    toCol(HashedSet(toExpr(tokens), shingleN))
  def jaccardSorted(a: Column, b: Column): Column =
    toCol(JaccardSortedLongs(toExpr(a), toExpr(b)))
  def hyperplaneLsh(vec: Column, planes: Int = 16): Column =
    toCol(HyperplaneLsh(toExpr(vec), planes))
  def int8QuantStats(vec: Column): Column = toCol(Int8QuantStats(toExpr(vec)))
}
