package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import graft.operators.Web

/** URL operators (Web.scala): canonicalization rules, dedup semantics,
  * blocklist suffix policy, per-host cap determinism, and the scan-stage
  * plan shape that makes the pass 100 TB-viable. */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private def key(u: String): String =
    Seq(u).toDF("url").select(Web.urlKey(col("url")).as("k"))
      .head().getString(0)

  test("urlKey normalizes every rule the C4 pass needs") {
    // case + scheme + www + default port + fragment
    assert(key("HTTPS://WWW.Example.COM:443/A/B#frag") === "example.com/a/b")
    assert(key("http://example.com:80/a/b") === "example.com/a/b")
    // non-default port survives
    assert(key("http://example.com:8080/a") === "example.com:8080/a")
    // tracking params dropped, survivors sorted, trailing slash stripped
    assert(key("https://ex.com/p/?utm_source=x&b=2&a=1&fbclid=y&gclid=z&ref=hn")
      === "ex.com/p?a=1&b=2")
    // all params tracking -> no query at all
    assert(key("https://ex.com/p?utm_medium=a&utm_campaign=b") === "ex.com/p")
    // bare host, with and without slash, collapse
    assert(key("https://ex.com/") === key("http://ex.com"))
    // a legit param that merely STARTS with ref chars is kept
    assert(key("https://ex.com/p?reference=1") === "ex.com/p?reference=1")
    // scheme-less input is accepted as-is
    assert(key("www.ex.com/p") === "ex.com/p")
  }

  test("urlKey and urlHost are total on null/empty/garbage") {
    val df = Seq[(Integer, String)]((1, null), (2, ""), (3, "   "),
        (4, "not a url at all"), (5, "????"))
      .toDF("id", "url")
      .select(col("id"), Web.urlKey(col("url")).as("k"),
        Web.urlHost(col("url")).as("h"))
    val rows = df.collect().sortBy(_.getInt(0))
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(rows(1).getString(1) === "" && rows(1).getString(2) === "")
    assert(rows(2).getString(1) === "")
    assert(rows(3).getString(1) === "not a url at all")
    // "????" -> empty host, the junk survives as an opaque param: garbage
    // stays distinct-but-stable rather than collapsing to one empty key
    assert(rows(4).getString(1) === "????")
  }

  test("dedupByUrl keeps the min-id row per canonical URL") {
    val df = Seq(
      (10L, "https://ex.com/a?x=1"),
      (7L,  "HTTP://WWW.EX.COM:80/a/?x=1#top"), // same page, messier spelling
      (3L,  "https://ex.com/b"),
      (9L,  "https://other.com/a?x=1")).toDF("doc_id", "url")
    val kept = Web.dedupByUrl(df, "doc_id", "url")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(3L, 7L, 9L))
  }

  test("dropBlockedDomains: exact + subdomain hit, suffix lookalike survives") {
    val df = Seq(
      (1L, "https://bad.com/x"),
      (2L, "https://ads.bad.com/x"),      // subdomain of blocked
      (3L, "https://notbad.com/x"),       // lookalike suffix, NOT blocked
      (4L, "https://www.BAD.com/y"),      // www + case folds into blocked
      (5L, "https://good.com/x"),
      (6L, null: String))                 // null kept: blocklists don't validate
      .toDF("doc_id", "url")
    val kept = Web.dropBlockedDomains(df, "url", Seq("bad.com"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(3L, 5L, 6L))
    // empty blocklist is identity
    assert(Web.dropBlockedDomains(df, "url", Nil).count() === 6)
  }

  test("capPerHost keeps exactly min(k, pages) per host, partitioning-independent") {
    val rows = (0L until 40L).map(i => (i, s"https://site${i % 3}.com/p/$i"))
    val df = rows.toDF("doc_id", "url")
    val kept = Web.capPerHost(df, "doc_id", "url", k = 5)
    val byHost = kept.select(Web.urlHost(col("url")).as("h"))
      .groupBy("h").count().as[(String, Long)].collect().toMap
    assert(byHost.values.toSet === Set(5L))
    val again = Web.capPerHost(df.repartition(7), "doc_id", "url", k = 5)
      .select("doc_id").as[Long].collect().sorted
    assert(again.toSeq === kept.select("doc_id").as[Long].collect().sorted.toSeq)
    // under-full hosts are untouched
    val tiny = Seq((1L, "https://a.com/1"), (2L, "https://a.com/2")).toDF("doc_id", "url")
    assert(Web.capPerHost(tiny, "doc_id", "url", k = 5).count() === 2)
  }

  test("url dedup plan: normalization fuses into the scan, one two-phase agg shuffle") {
    val df = queries.DataOps.qUrlDedup(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: nodes(q.plan)
      case a: AdaptiveSparkPlanExec => p +: nodes(a.executedPlan)
      case _ => p +: p.children.flatMap(nodes)
    }
    val all = nodes(plan)
    // one shuffle for the groupBy, one range exchange for the ordered gate
    // output — nothing else (no join, no window over the corpus)
    val shuffles = all.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 2, s"expected agg + sort exchanges only:\n$plan")
    assert(!plan.toString.contains("Window"), "no window in the URL pass")
    // partial aggregation runs map-side before the exchange
    assert(plan.toString.contains("partial_min") || plan.toString.contains("partial"),
      s"two-phase agg expected:\n$plan")
  }

  test("graft_url_key / graft_url_host are SQL-callable") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_url_key('HTTPS://WWW.Ex.com:443/a/?b=2&utm_source=x&a=1#f') AS k,
        |       graft_url_host('http://www.Sub.Ex.com:80/p') AS h""".stripMargin).head()
    assert(r.getString(0) === "ex.com/a?a=1&b=2")
    assert(r.getString(1) === "sub.ex.com")
  }

  private def extract(h: String): String =
    Seq(h).toDF("page").select(Web.htmlToText(col("page")).as("t"))
      .head().getString(0)

  test("htmlToText: scripts/styles/titles/comments drop, blocks break, entities decode") {
    val page =
      """<html><head><title>meta</title><style>p { color: red }</style>
        |<script>if (1 < 2) { x = "&amp;"; }</script></head>
        |<body><!-- hidden --><h1>Head</h1><p>one   two</p>
        |<ul><li>a &amp; b</li><li>c &lt;d&gt; &quot;e&quot; &#39;f&#39;&nbsp;g</li></ul>
        |<div>tail<br/>end</div></body></html>""".stripMargin
    assert(extract(page) ===
      "Head\none two\na & b\nc <d> \"e\" 'f' g\ntail\nend")
    // script content (with its bare `<`) and title text must NOT leak
    assert(!extract(page).contains("meta") && !extract(page).contains("1 < 2"))
  }

  test("htmlToText is total: null -> null, empty -> empty, prose unchanged") {
    val rows = Seq[(Integer, String)]((1, null), (2, ""), (3, "plain words here"))
      .toDF("id", "page")
      .select(col("id"), Web.htmlToText(col("page")).as("t"))
      .collect().sortBy(_.getInt(0))
    assert(rows(0).isNullAt(1))
    assert(rows(1).getString(1) === "")
    assert(rows(2).getString(1) === "plain words here")
  }

  test("htmlLinks extracts hrefs in document order") {
    val links = Seq("""<a href="https://a.com/1">x</a><p><a HREF="https://b.com/2?q=1">y</a>""")
      .toDF("page").select(Web.htmlLinks(col("page")).as("l"))
      .head().getSeq[String](0)
    assert(links === Seq("https://a.com/1", "https://b.com/2?q=1"))
  }

  test("graft_html_text / graft_html_links are SQL-callable") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_html_text('<p>a &amp; b</p><div>c</div>') AS t,
        |       size(graft_html_links('<a href="https://x.com">x</a>')) AS n""".stripMargin)
      .head()
    assert(r.getString(0) === "a & b\nc")
    assert(r.getInt(1) === 1)
  }

  test("config step: dedup method=url collapses URL variants end-to-end") {
    val flow = graft.pipeline.Pipeline.run(spark,
      """[
        | {"type":"reader","connector":{"type":"mem","data":
        |   "[{\"id\":1,\"url\":\"https://ex.com/a?x=1\"},{\"id\":2,\"url\":\"HTTP://WWW.EX.COM:80/a/?x=1&utm_source=t#f\"},{\"id\":3,\"url\":\"https://ex.com/b\"}]"}},
        | {"type":"dedup","method":"url","id":"id","field":"url"}
        |]""".stripMargin)
    assert(flow.ok.get.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
  }

  test("markdownToText: every rule fires; links extract in order") {
    val md = Seq(
      "# Title\n\n> a quote\n\nKeep **bold** _em_ ~~strike~~ words.\n\n" +
      "- bullet [anchor](https://x.com/a)\n2. num ![alt](https://x.com/i.png)\n\n" +
      "---\n\n```\ncode **stays out** [l](u)\n```\n\n`kept code` and [r][9] end"
    ).toDF("md")
    val out = out1(md.select(graft.operators.Web.markdownToText(col("md"))))
    assert(out == "Title\na quote\nKeep bold em strike words.\n" +
      "bullet anchor\nnum alt\nkept code and r end",
      s"got: <$out>")
    // links scan the RAW document (fenced code included) — the same
    // contract as htmlLinks over the raw page
    val links = md.select(graft.operators.Web.markdownLinks(col("md")))
      .head().getSeq[String](0)
    assert(links == Seq("https://x.com/a", "https://x.com/i.png", "u"))
    // totality
    val t = Seq[(Option[String], Int)]((None, 0), (Some(""), 1), (Some("plain prose"), 2))
      .toDF("s", "i")
      .select(graft.operators.Web.markdownToText(col("s")).as("o"), col("i"))
      .orderBy("i").collect()
    assert(t(0).isNullAt(0) && t(1).getString(0) == "" && t(2).getString(0) == "plain prose")
    // SQL surface
    graft.plans.GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_markdown_text('# H\\n**b**') AS t").head().getString(0) == "H\nb")
  }

  private def out1(df: org.apache.spark.sql.DataFrame): String =
    df.head().getString(0)
}
