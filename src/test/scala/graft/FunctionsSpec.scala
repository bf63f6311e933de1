package graft

import graft.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  test("json pointer converts to JsonPath and extracts") {
    assert(JsonFns.pointerToPath("/a/b/0") == "$.a.b[0]")
    assert(JsonFns.pointerToPath("a/b") == "$.a.b")
    val v = one(get_json_object(lit("""{"a":{"b":[7,8]}}"""), JsonFns.pointerToPath("/a/b/1")))
    assert(v == "8")
  }

  test("jsonSet overwrites an existing key without duplicates") {
    assert(one(JsonFns.jsonSet(lit("""{}"""), "k", lit(1))) == """{"k": 1}""")
    assert(one(JsonFns.jsonSet(lit("""{"a": 1}"""), "k", lit(2))) == """{"a": 1, "k": 2}""")
    // existing key mid-object is replaced, not duplicated
    assert(one(JsonFns.jsonSet(lit("""{"a": 1, "k": "old, val", "b": 3}"""), "k", lit(9)))
      == """{"a": 1, "b": 3, "k": 9}""")
    // existing key at the end leaves no trailing comma
    assert(one(JsonFns.jsonSet(lit("""{"a": 1, "k": 5}"""), "k", lit(6)))
      == """{"a": 1, "k": 6}""")
  }

  test("string fns: base64 roundtrip, find, slugify, checksums") {
    assert(one(StringFns.base64Encode(lit("EUROPE"))) == "RVVST1BF")
    assert(one(StringFns.base64Decode(lit("RVVST1BF"))) == "EUROPE")
    assert(one(StringFns.find(lit("order-42-x"), "\\d+")) == "42")
    assert(one(StringFns.find(lit("nope"), "\\d+")) == null)
    assert(one(StringFns.slugify(lit("  Hello, World! "))) == "hello-world")
    assert(one(StringFns.checksumMd5(lit("x"))) == "9dd4e461268c8034f5c8564e155c67a6")
  }

  test("object fns: merge/replaceKey/replaceValue/extract/keys") {
    val m  = map(lit("a"), lit("1"), lit("b"), lit("2"))
    val m2 = map(lit("b"), lit("9"), lit("c"), lit("3"))
    assert(one(concat_ws(",", ObjectFns.keys(ObjectFns.merge(m, m2)))) == "a,b,c")
    assert(one(element_at(ObjectFns.merge(m, m2), "b")) == "9")
    assert(one(element_at(ObjectFns.replaceKey(m, "a", "z"), "z")) == "1")
    assert(one(element_at(ObjectFns.replaceValue(m, lit("2"), lit("two")), "b")) == "two")
    assert(one(concat_ws(",", ObjectFns.keys(ObjectFns.extract(m, Seq("a"))))) == "a")
    assert(one(concat_ws(",", ObjectFns.keys(ObjectFns.remove(m, "a")))) == "b")
    assert(one(element_at(ObjectFns.update(m, "a", lit("7")), "a")) == "7")
  }

  test("template merge/map filters resolve object args in caller scope") {
    // reference: src/updater/tera.rs registers merge (with=<object>) and
    // map (attribute=<key>) as object filters
    val df = spark.range(1).select(
      map(lit("a"), lit("1"), lit("b"), lit("2")).as("m"),
      map(lit("b"), lit("9"), lit("c"), lit("3")).as("m2"))
    def run(t: String): String =
      df.select(Template.render(t).as("v")).head().getString(0)
    assert(run("{{ m | merge(with=m2) | keys | join(sep=\",\") }}") == "a,b,c")
    assert(run("{{ m | merge(with=m2) | map(attribute=\"b\") }}") == "9")
    assert(run("{{ m | map(attribute=\"a\") }}") == "1")
    intercept[IllegalArgumentException](run("{{ m | merge(nope=m2) }}"))
  }

  test("tera for over maps (k,v) and array filters sort/unique/nth/slice") {
    val df = spark.range(1).select(
      map(lit("b"), lit("2"), lit("a"), lit("1")).as("m"),
      lit("c,a,b,a").as("csv"))
    def run(t: String): String =
      df.select(Template.render(t).as("v")).head().getString(0)
    // map iteration binds key+value, sorted by key for determinism
    assert(run("{% for k, v in m %}{{ k }}={{ v }};{% endfor %}") == "a=1;b=2;")
    assert(run("{% for k, v in m %}{{ loop.index }}:{{ k }} {% endfor %}") == "1:a 2:b ")
    // array stdlib over a split column
    assert(run("{{ csv | split(pat=\",\") | sort | join(sep=\"\") }}") == "aabc")
    assert(run("{{ csv | split(pat=\",\") | unique | join(sep=\"\") }}") == "cab")
    assert(run("{{ csv | split(pat=\",\") | nth(n=1) }}") == "a")
    assert(run("{{ csv | split(pat=\",\") | slice(start=1, end=3) | join(sep=\"\") }}") == "ab")
    assert(run("{{ csv | split(pat=\",\") | slice(end=-1) | join(sep=\"\") }}") == "cab")
    assert(run("{{ csv | split(pat=\",\") | slice(start=-2) | join(sep=\"\") }}") == "ba")
  }

  test("tera raw sections, for-else, and ~ concatenation") {
    val df = spark.range(1).select(lit("ada").as("name"), lit("").as("empty"),
      lit(6L).as("n"))
    def run(t: String): String =
      df.select(Template.render(t).as("v")).head().getString(0)
    // raw passes tags through verbatim — no interpolation, no parse errors
    assert(run("{% raw %}{{ name }} {% if x %}lit{% endif %}{% endraw %}")
      == "{{ name }} {% if x %}lit{% endif %}")
    assert(run("a{% raw %}{{ n | nope }}{% endraw %}b") == "a{{ n | nope }}b")
    // for-else: else branch renders only for an empty iterable
    assert(run("{% for w in name | split(pat=\"-\") %}[{{ w }}]{% else %}none{% endfor %}")
      == "[ada]")
    assert(run("{% for w in empty | split(pat=\",\") | slice(start=1) %}[{{ w }}]" +
      "{% else %}none{% endfor %}") == "none")
    // ~ concatenates with loosest precedence; numbers stringify
    assert(run("{{ name ~ \"-\" ~ n + 1 }}") == "ada-7")
    assert(run("{{ \"x\" ~ n * 2 }}") == "x12")
  }

  test("faker is deterministic and seed-dependent") {
    val rows = spark.range(20).select(
      Faker.firstName(col("id")).as("fn"),
      Faker.email(col("id")).as("em"),
      Faker.ipv4(col("id")).as("ip")).collect()
    val again = spark.range(20).select(
      Faker.firstName(col("id")).as("fn"),
      Faker.email(col("id")).as("em"),
      Faker.ipv4(col("id")).as("ip")).collect()
    assert(rows.toSeq == again.toSeq)
    assert(rows.map(_.getString(0)).distinct.length > 1)
    assert(rows.forall(r => r.getString(1).endsWith("@example.com")))
    assert(rows.forall(r => r.getString(2).split("\\.").length == 4))
  }

  test("template compiles to concat of refs and literals") {
    assert(Template.variables("{{ a }}-{{ b.c }}") == Seq("a", "b.c"))
    val df = spark.range(1).select(lit("ada").as("first"), lit("l").as("last"))
    val out = df.select(Template.render("{{ first }}.{{ last }}@x.io").as("v")).head().getString(0)
    assert(out == "ada.l@x.io")
  }

  test("template filters chain tera-style and input. prefix resolves") {
    val df = spark.range(1).select(lit("  Ada Lovelace ").as("name"))
    def run(t: String): String =
      df.select(Template.render(t).as("v")).head().getString(0)
    assert(run("{{ name | trim | upper }}") == "ADA LOVELACE")
    assert(run("{{ input.name | trim | slugify }}") == "ada-lovelace")
    assert(run("{{ name | trim | length }}") == "12")
    assert(run("{{ name | md5 }}").length == 32)
    intercept[IllegalArgumentException](Template.render("{{ name | nope }}"))
  }

  test("template control flow: if/elif/else compiles to a CASE chain") {
    val df = spark.range(1).select(lit(250L).as("n"), lit("en").as("lang"),
      lit(null).cast("string").as("maybe"))
    def run(t: String): String =
      df.select(Template.render(t).as("v")).head().getString(0)
    assert(run("{% if n > 500 %}long{% elif n > 100 %}medium{% else %}short{% endif %}")
      == "medium")
    assert(run("{% if lang == \"en\" %}english{% else %}other{% endif %}") == "english")
    assert(run("{% if lang != 'en' or n >= 200 %}yes{% endif %}") == "yes")
    assert(run("{% if not (lang == 'fr') and n < 300 %}t{% else %}f{% endif %}") == "t")
    assert(run("{% if lang is defined %}d{% endif %}") == "d")
    // null ≈ not defined under a fixed schema (a truly absent column is a
    // schema error at analysis, not a template condition)
    assert(run("{% if maybe is not defined %}nd{% endif %}") == "nd")
    // `undefined` is the negation of `defined` (tera semantics) — it was
    // once compiled to the SAME column as `defined`, silently inverting
    // every config that used it; keep all four combinations pinned
    assert(run("{% if maybe is undefined %}u{% else %}x{% endif %}") == "u")
    assert(run("{% if lang is undefined %}u{% else %}x{% endif %}") == "x")
    assert(run("{% if lang is not undefined %}nu{% endif %}") == "nu")
    assert(run("{% if maybe is not undefined %}y{% else %}n{% endif %}") == "n")
    // no else → empty string when no branch matches
    assert(run("{% if n > 9000 %}x{% endif %}") == "")
    // filtered operands in conditions (tera: filters bind tighter than
    // comparison): lang has length 2
    assert(run("{% if lang | length == 2 %}two{% endif %}") == "two")
    assert(run("{% if lang | upper == 'EN' and n > 100 %}up{% endif %}") == "up")
  }

  test("tera macros: self-calls, defaults, import namespaces, kwargs scope") {
    val df = spark.range(1).select(lit("ada").as("name"), lit(3L).as("n"))
    def run(t: String, reg: Map[String, String] = Map.empty): String =
      df.select(Template.render(t, Map.empty, reg).as("v")).head().getString(0)
    // same-template macro via self:: (tera call syntax), kwarg from a column
    assert(run("{% macro tag(v) %}<{{ v | upper }}>{% endmacro %}{{ self::tag(v=name) }}")
      == "<ADA>")
    // default args compile in the macro's own scope; override wins
    assert(run("{% macro p(x, sep=\"-\") %}{{ x }}{{ sep }}{% endmacro %}" +
      "{{ self::p(x=name) }}{{ self::p(x=name, sep=\"+\") }}") == "ada-ada+")
    // imported namespace: macros live in another registered template
    val lib = "{% macro shout(s) %}{{ s | upper }}!{% endmacro %}"
    assert(run("{% import \"lib\" as m %}{{ m::shout(s=name) }}",
      Map("lib" -> lib)) == "ADA!")
    // a macro body sees ONLY its params (tera scoping): `name` un-passed
    // must not leak from the caller's row context
    intercept[Exception] {
      df.select(Template.render(
        "{% macro bad() %}{{ nope_not_a_column }}{% endmacro %}{{ self::bad() }}",
        Map.empty, Map.empty).as("v")).head()
    }
    // arity errors name the macro and the missing arg
    val err = intercept[IllegalArgumentException](
      run("{% macro q(a) %}{{ a }}{% endmacro %}{{ self::q() }}"))
    assert(err.getMessage.contains("missing required arg: a"))
    // macro result feeds a filter chain like any operand
    assert(run("{% macro two(x) %}{{ x }}{{ x }}{% endmacro %}{{ self::two(x=name) | length }}")
      == "6")
  }

  test("tera include and extends/block compose templates at plan time") {
    val df = spark.range(1).select(lit("ada").as("name"))
    def run(t: String, reg: Map[String, String]): String =
      df.select(Template.render(t, Map.empty, reg).as("v")).head().getString(0)
    // include renders with the CURRENT row context
    assert(run("pre[{% include \"frag\" %}]post",
      Map("frag" -> "hi {{ name }}")) == "pre[hi ada]post")
    // extends: child blocks override the base's; un-overridden blocks keep
    // the base body; base text outside blocks always renders
    val base = "A{% block head %}h0{% endblock %}B{% block tail %}t0{% endblock %}C"
    assert(run("{% extends \"base\" %}{% block head %}H-{{ name }}{% endblock %}",
      Map("base" -> base)) == "AH-adaBt0C")
    // two-level chain: grandchild wins over child over base
    val mid = "{% extends \"base\" %}{% block head %}mid{% endblock %}" +
      "{% block tail %}midt{% endblock %}"
    assert(run("{% extends \"mid\" %}{% block tail %}leaf{% endblock %}",
      Map("base" -> base, "mid" -> mid)) == "AmidBleafC")
    // unknown template and cycles fail at COMPILE time with named errors
    assert(intercept[IllegalArgumentException](
      run("{% include \"ghost\" %}", Map.empty)).getMessage.contains("ghost"))
    intercept[IllegalArgumentException](
      run("{% include \"a\" %}", Map("a" -> "{% include \"a\" %}")))
    // an included template can carry its own macros without leaking them
    assert(run("{% import \"lib\" as m %}{{ m::dot(s=name) }}{% include \"lib2\" %}",
      Map("lib" -> "{% macro dot(s) %}{{ s }}.{% endmacro %}",
          "lib2" -> "[{{ name }}]")) == "ada.[ada]")
  }

  test("tera filter sections, in/not-in, numeric is-tests, and super()") {
    val df = spark.range(1).select(lit("ada").as("name"), lit(6L).as("n"),
      lit("en").as("lang"))
    def run(t: String, reg: Map[String, String] = Map.empty): String =
      df.select(Template.render(t, Map.empty, reg).as("v")).head().getString(0)
    // {% filter %} pushes the whole rendered section through one filter
    assert(run("{% filter upper %}hi {{ name }}{% endfilter %}") == "HI ADA")
    assert(run("{% filter truncate(length=4) %}{{ name }}-{{ name }}{% endfilter %}")
      == "ada-")
    // membership: literal lists are plan-time arrays; column RHS = substring
    assert(run("{% if lang in [\"en\", \"fr\"] %}eu{% endif %}") == "eu")
    assert(run("{% if lang not in ['de', 'nl'] %}no{% endif %}") == "no")
    assert(run("{% if \"da\" in name %}sub{% endif %}") == "sub")
    // numeric tests
    assert(run("{% if n is even %}e{% else %}o{% endif %}") == "e")
    assert(run("{% if n is not odd %}ne{% endif %}") == "ne")
    assert(run("{% if n is divisibleby(3) %}d3{% endif %}") == "d3")
    assert(run("{% if n is divisibleby(4) %}x{% else %}nd{% endif %}") == "nd")
    // super() splices the parent block's body into the override
    val base = "A{% block b %}base-{{ name }}{% endblock %}Z"
    assert(run("{% extends \"t\" %}{% block b %}[{{ super() }}]{% endblock %}",
      Map("t" -> base)) == "A[base-ada]Z")
    // super() outside an override is a compile-time error
    intercept[IllegalArgumentException](run("{{ super() }}"))
  }

  test("tera stdlib filters: round/abs/int/float/date/wordcount/striptags") {
    val df = spark.range(1).select(lit(-2.718).as("x"), lit("  <b>two words</b> ").as("h"),
      lit("2024-03-05 07:09:11").as("ts"))
    def run(t: String): String =
      df.select(Template.render(t).as("v")).head().getString(0)
    assert(run("{{ x | abs }}") == "2.718")
    assert(run("{{ x | abs | round(precision=1) }}") == "2.7")
    assert(run("{{ x | abs | round(method='ceil', precision=1) }}") == "2.8")
    assert(run("{{ x | abs | round(method='floor') }}") == "2.0")
    assert(run("{{ x | int }}") == "-2")
    assert(run("{{ h | striptags | trim }}") == "two words")
    assert(run("{{ h | striptags | wordcount }}") == "2")
    assert(run("{{ ts | date(format='%Y/%m/%d %H:%M') }}") == "2024/03/05 07:09")
    assert(run("{{ h | trim | trim_end }}") == "<b>two words</b>")
  }

  test("template arithmetic in interpolation heads and condition operands") {
    // reference transformer patterns do arithmetic inline
    // (examples/transform-mapping.rs: input.number * output.number * ...)
    val df = spark.range(1).select(lit(6L).as("n"), lit(7L).as("m"))
    def run(t: String): String =
      df.select(Template.render(t).as("v")).head().getString(0)
    assert(run("{{ n * m }}") == "42")
    assert(run("{{ n + m * 2 }}") == "20")   // precedence
    assert(run("{{ (n + m) * 2 }}") == "26") // parens group
    assert(run("{{ n*2 }}") == "12")         // unspaced operator
    assert(run("{{ n - -1 }}") == "7")       // negative literal operand
    assert(run("{% if n * m >= 42 %}y{% else %}x{% endif %}") == "y")
    assert(run("{% if n + 1 == m %}eq{% endif %}") == "eq")
    // reference transformer context path (examples/transform-mapping.rs):
    // context.steps.<name>.<field> resolves to the record's column
    assert(run("{{ n * context.steps.reader.m }}") == "42")
  }

  test("template control flow: for loop over an array, loop.index, set") {
    val df = spark.range(1).select(lit("a b c").as("s"), lit("Z").as("z"))
    def run(t: String): String =
      df.select(Template.render(t).as("v")).head().getString(0)
    assert(run("{% for t in s | split(pat=\" \") %}[{{ t | upper }}]{% endfor %}")
      == "[A][B][C]")
    assert(run("{% for t in s | split(pat=\" \") %}{{ loop.index }}:{{ t }};{% endfor %}")
      == "1:a;2:b;3:c;")
    // nested if inside for, referencing the loop var
    assert(run("{% for t in s | split(pat=\" \") %}{% if t == \"b\" %}!{% else %}{{ t }}{% endif %}{% endfor %}")
      == "a!c")
    assert(run("{% set u = z | lower %}{{ u }}{{ u }}") == "zz")
    // whitespace control trims around tags
    assert(run("  {%- if z == \"Z\" -%}   ok   {%- endif -%}  ") == "ok")
  }

  test("template functions: uuid_v4, env, fakers with seed columns") {
    val df = spark.range(2).select(col("id"))
    def runAll(t: String): Seq[String] =
      df.select(Template.render(t).as("v")).orderBy("v").collect().map(_.getString(0)).toSeq
    // uuid_v4 renders per row, valid v4 shape
    val uuids = runAll("{{ uuid_v4() }}")
    assert(uuids.distinct.size == 2 &&
      uuids.forall(_.matches("[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}")))
    // env resolves at plan time with a default
    assert(runAll("{{ env(name=\"GRAFT_NOT_SET\", default=\"dflt\") }}") == Seq("dflt", "dflt"))
    // fakers are deterministic functions of the seed column
    val df10 = spark.range(10).select(col("id"))
    def runTen(t: String): Seq[String] =
      df10.select(Template.render(t).as("v")).orderBy("v").collect().map(_.getString(0)).toSeq
    val emails = runTen("{{ fake_email(seed=id) }}")
    assert(emails.forall(_.endsWith("@example.com")) && emails.distinct.size >= 2)
    assert(emails == runTen("{{ fake_email(seed=id) }}"))
    intercept[IllegalArgumentException](Template.render("{{ fake_email() }}"))
    intercept[IllegalArgumentException](Template.render("{{ fake_nope(seed=id) }}"))
  }

  test("template object filters operate on map columns") {
    val df = spark.range(1).select(
      map(lit("a"), lit("1"), lit("b"), lit("2")).as("m"))
    def run(t: String): String =
      df.select(Template.render(t).as("v")).head().getString(0)
    assert(run("{{ m | keys | join(sep=\",\") }}") == "a,b")
    assert(run("{{ m | values | join(sep=\",\") }}") == "1,2")
    assert(run("{{ m | extract(keys=\"b\") | values | join(sep=\"\") }}") == "2")
    assert(run("{{ m | replace_key(from=\"a\", to=\"z\") | keys | join(sep=\",\") }}") == "b,z")
  }

  test("template arg filters: default, replace, truncate, join") {
    val df = spark.range(1).select(lit("hello world").as("s"),
      lit(null).cast("string").as("missing"))
    def run(t: String): String =
      df.select(Template.render(t).as("v")).head().getString(0)
    assert(run("{{ missing | default(value=\"fallback\") }}") == "fallback")
    assert(run("{{ s | replace(from=\"world\", to=\"there\") }}") == "hello there")
    assert(run("{{ s | truncate(length=5) }}") == "hello")
    assert(run("{{ s | split(pat=\" \") | join(sep=\"-\") }}") == "hello-world")
  }

  test("validator split: ok/err streams partition the input") {
    val df = queries.EtlSteps.qValidator(spark, sf)
    val total = df.count()
    val okN = df.filter(col("_error").isNull).count()
    val errN = df.filter(col("_error").isNotNull).count()
    assert(okN + errN == total && errN > 0)
  }

  test("text norm folds accents, compatibility forms, and case; total; SQL-callable") {
    def norm(s: String): Any = one(graft.plans.Native.textNorm(lit(s)))
    assert(norm("Café") == "cafe", "combining accents fold away")
    assert(norm("Ⅻ ﬁne ①") == "xii fine 1", "NFKD compatibility forms decompose")
    assert(norm("ALREADY plain") == "already plain")
    assert(norm("") == "")
    assert(one(graft.plans.Native.textNorm(lit(null).cast("string"))) == null)
    graft.plans.GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_text_norm('Naïve Ⅳ') AS t").head().getString(0)
      == "naive iv", "SQL surface folds diaeresis and roman numeral")
  }

  test("compression ratio: repetition compresses far above prose; total; SQL-callable") {
    import graft.operators.TextAnalysis
    val prose = "the quick brown fox jumps over the lazy dog while autumn rain " +
      "settles quietly on the rooftops of the old town and merchants argue about barley"
    val repet = Seq.fill(60)("spam ham").mkString(" ")
    def ratio(s: String): Double =
      one(TextAnalysis.compressionRatio(lit(s))).asInstanceOf[Double]
    assert(ratio(prose) > 1.0, "prose must compress at all")
    assert(ratio(repet) > 2.0 * ratio(prose), "repetition must compress far harder")
    // determinism: the signal is a pure function of the bytes
    assert(ratio(prose) == ratio(prose))
    // totality: null and empty text carry no ratio
    assert(one(TextAnalysis.compressionRatio(lit(null).cast("string"))) == null)
    assert(one(TextAnalysis.compressionRatio(lit(""))) == null)
    // SQL surface
    graft.plans.GraftExtensions.register(spark)
    val n = spark.sql("SELECT graft_deflate_len('aaaaaaaaaaaaaaaaaaaaaaaa') AS n")
      .head().getInt(0)
    assert(n > 0 && n < 24, "24 identical bytes must deflate below identity")
  }

  private def dictHits(text: String, dict: Seq[String]): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(graft.plans.Native.dictMatch(col("t"), dict).as("m"))
      .head().getSeq[String](0)
  }

  test("dict match: overlapping, nested, and shared-prefix patterns all surface") {
    // nested + overlapping occurrences at one position
    assert(dictHits("xabcx", Seq("ab", "b", "abc", "bc")) == Seq("ab", "abc", "b", "bc"))
    // the classic fail-link case: hers/she/he share structure inside "ushers"
    assert(dictHits("ushers", Seq("he", "she", "hers", "his")) == Seq("he", "hers", "she"))
    // self-overlapping pattern present once is reported once (distinct set)
    assert(dictHits("aaaa", Seq("aa", "aaa")) == Seq("aa", "aaa"))
    // multi-word phrase
    assert(dictHits("a slow query ran", Seq("slow query", "fast")) == Seq("slow query"))
  }

  test("dict match ≡ contains-chain on the real corpus, and hit order is sorted") {
    import graft.queries.DataOps
    val docs = graft.Tables(spark, sf).documents
    val dict = DataOps.TagDict
    val both = docs.select(col("doc_id"),
      graft.plans.Native.dictMatch(col("text"), dict).as("ac"),
      array_sort(filter(
        array(dict.map(lit): _*), p => col("text").contains(p))).as("ref"))
    assert(both.filter(not(col("ac") === col("ref"))).count() === 0)
    // at least some docs hit ≥2 terms or the fixture is vacuous
    assert(both.filter(size(col("ac")) >= 2).count() > 0)
  }

  test("dict match is total and SQL-callable") {
    import spark.implicits._
    val rows = Seq[(Integer, String)]((1, null), (2, ""), (3, "plain"))
      .toDF("id", "t")
      .select(col("id"), graft.plans.Native.dictMatch(col("t"), Seq("a")).as("m"),
        graft.plans.Native.dictMatch(col("t"), Seq.empty).as("e"))
      .collect().sortBy(_.getInt(0))
    assert(rows(0).isNullAt(1))
    assert(rows(1).getSeq[String](1).isEmpty)
    assert(rows(2).getSeq[String](2).isEmpty, "empty dict -> empty hits")
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dict_match('the spark shuffle', array('spark', 'hash join')) AS m")
      .head().getSeq[String](0)
    assert(r == Seq("spark"))
  }
}
