package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tera-style template rendering compiled to Column expressions
  * (reference: src/updater/tera.rs builds a full tera engine;
  * src/helper/mustache.rs does `{{ var }}` substitution; transformer
  * patterns in src/step/transformer.rs use interpolation, conditionals
  * and loops).
  *
  * `render("{{ first }}.{{ last }}@{{ domain }}")` becomes
  * `concat(col("first"), lit("."), col("last"), lit("@"), col("domain"))` —
  * a plan-time compilation, so per-row evaluation is pure codegen'd concat,
  * never a template-engine interpreter in the row loop (which is what makes
  * it survive a 100 TB scan).
  *
  * Control flow compiles the same way:
  *   - `{% if cond %}A{% elif c2 %}B{% else %}C{% endif %}` →
  *     `when(cond, A).when(c2, B).otherwise(C)` — one codegen'd CASE.
  *   - `{% for x in arr %}…{% endfor %}` → `concat_ws("", transform(arr,
  *     (x, i) => body))` — the loop runs inside the `transform` HOF, per
  *     row, distributed; `loop.index`/`loop.index0` bind to the lambda
  *     index. No driver-side expansion.
  *   - `{% set name = expr %}` binds a name for the rest of the block.
  *   - `{%- … -%}` / `{{- … -}}` trim adjacent whitespace (tera ws control).
  *
  * Conditions support `== != < <= > >=`, `and`/`or`/`not`, parentheses,
  * string/number/bool literals, filtered operands (`s | length <= max` —
  * tera precedence: filters bind tighter than any operator) and
  * `x is [not] defined` (→ null check; a fixed relational schema has no
  * absent fields, so null is the analogue).
  *
  * Filters compose tera-style: `{{ name | trim | upper }}`; arg-taking
  * filters use tera call syntax: `{{ s | split(pat=",") }}`,
  * `{{ s | default(value="x") }}`, `{{ s | replace(from="a", to="b") }}`,
  * `{{ s | truncate(length=8) }}`, `{{ arr | join(sep="-") }}`. The
  * `input.` / `output.` context prefixes of chewdata patterns resolve to
  * the current row (steps are column transformations here, so
  * input ≡ output ≡ row).
  */
object Template {

  /** Supported zero-arg tera filters → Column transforms. */
  val filters: Map[String, Column => Column] = Map(
    "upper" -> upper _,
    "lower" -> lower _,
    "trim" -> trim _,
    "capitalize" -> initcap _,
    "title" -> initcap _,
    "length" -> (c => length(c).cast("string")),
    "slugify" -> StringFns.slugify _,
    "base64_encode" -> StringFns.base64Encode _,
    "base64_decode" -> StringFns.base64Decode _,
    "md5" -> StringFns.checksumMd5 _,
    "sha256" -> StringFns.checksumSha256 _,
    "json_encode" -> (c => to_json(struct(c))),
    "first" -> (c => element_at(split(c, ","), 1)),
    "last" -> (c => element_at(split(c, ","), -1)),
    // tera built-ins chewdata configs lean on (tera stdlib — public API)
    "abs" -> abs _,
    "int" -> (c => c.cast("bigint")),
    "float" -> (c => c.cast("double")),
    "reverse" -> (c => reverse(c)),
    "trim_start" -> (c => ltrim(c)),
    "trim_end" -> (c => rtrim(c)),
    "wordcount" -> (c => when(trim(c) === "", lit(0))
      .otherwise(size(split(trim(c), "\\s+"))).cast("string")),
    "striptags" -> (c => regexp_replace(c, "<[^>]*>", "")),
    "urlencode" -> (c => url_encode(c)),
    // tera array filters (operate on array columns, e.g. after `split`)
    "sort" -> (c => array_sort(c)),
    "unique" -> (c => array_distinct(c)))

  /** Arg-taking filters: (column, parsed k=v args) → Column. The object
    * filters mirror the reference's tera registrations
    * (src/updater/tera.rs:28-43) and operate on map-typed columns. */
  val argFilters: Map[String, (Column, Map[String, String]) => Column] = Map(
    "split" -> ((c, a) => split(c, java.util.regex.Pattern.quote(a("pat")))),
    "join" -> ((c, a) => array_join(c, a.getOrElse("sep", ""))),
    "default" -> ((c, a) => coalesce(c, lit(a("value")))),
    "replace" -> ((c, a) => regexp_replace(c,
      java.util.regex.Pattern.quote(a("from")),
      java.util.regex.Matcher.quoteReplacement(a("to")))),
    "truncate" -> ((c, a) => substring(c, 1, a("length").toInt)),
    // tera `round(method=..., precision=N)`: common/ceil/floor
    "round" -> ((c, a) => {
      val p = a.getOrElse("precision", "0").toInt
      a.getOrElse("method", "common") match {
        case "ceil"  => ceil(c * math.pow(10, p)) / math.pow(10, p)
        case "floor" => floor(c * math.pow(10, p)) / math.pow(10, p)
        case _       => round(c, p)
      }
    }),
    // tera `date(format=...)` with the common chrono specifiers;
    // an untranslated specifier fails at COMPILE time, not as a cryptic
    // pattern-letter error mid-job
    "date" -> ((c, a) => {
      val fmt = a.getOrElse("format", "%Y-%m-%d")
        .replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
        .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
      require(!fmt.contains("%"),
        s"unsupported date specifier in '${a.getOrElse("format", "")}' " +
          "(supported: %Y %m %d %H %M %S)")
      date_format(c.cast("timestamp"), fmt)
    }),
    // tera `nth(n=)` is 0-based; element_at is 1-based
    "nth" -> ((c, a) => element_at(c, a("n").toInt + 1)),
    // tera `slice(start=, end=)`: 0-based, end exclusive; negatives count
    // from the end (tera semantics) — resolved via the array length
    "slice" -> ((c, a) => {
      val st = a.getOrElse("start", "0").toInt
      val en = a.get("end").map(_.toInt)
      val startPos = if (st >= 0) lit(st + 1) else greatest(size(c) + st + 1, lit(1))
      val endPos0 = en match {
        case Some(x) if x >= 0 => least(lit(x), size(c))
        case Some(x)           => size(c) + x
        case None              => size(c)
      }
      val len = greatest(endPos0 - startPos + 1, lit(0))
      slice(c, startPos, len)
    }),
    "find" -> ((c, a) => StringFns.find(c, a("pattern"))),
    "extract" -> ((c, a) => ObjectFns.extract(c, a("keys").split(",").map(_.trim).toSeq)),
    "replace_key" -> ((c, a) => ObjectFns.replaceKey(c, a("from"), a("to"))),
    "replace_value" -> ((c, a) => ObjectFns.replaceValue(c, lit(a("from")), lit(a("to")))),
    "update" -> ((c, a) => ObjectFns.update(c, a("key"), lit(a("value")))),
    "search" -> ((c, a) => ObjectFns.search(c, a("prefix"))))

  /** Zero-arg object filters (map columns). */
  private val objectFilters: Map[String, Column => Column] = Map(
    "keys" -> ObjectFns.keys _,
    "values" -> ObjectFns.values _)

  /** Template function calls in `{{ ... }}` heads (reference registers
    * uuid_v4/env/get_env and ~35 fake_* as tera FUNCTIONS). Fakers take
    * `seed=<column>` — deterministic and partition-independent where the
    * reference draws RNG per record. */
  private def templateFunction(name: String, args: Map[String, String],
                               env: Map[String, Column], tmpl: Tmpl): Column = name match {
    case "uuid_v4" => StringFns.uuidV4()
    // {{ super() }}: parent block body, bound by the BlockN override path
    case "super" => env.getOrElse("__super__", throw new IllegalArgumentException(
      "super() is only valid inside a block that overrides a parent's"))
    case "now" => date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssxxx")
    case "env" | "get_env" => StringFns.env(args("name"), args.getOrElse("default", ""))
    case f if f.startsWith("fake_") =>
      val seed = args.get("seed").map(v => operand(v, env, tmpl)).getOrElse(
        throw new IllegalArgumentException(
          s"$f requires seed=<column> (deterministic generators; the reference draws RNG per record)"))
      Faker.registry.getOrElse(f, throw new IllegalArgumentException(
        s"unknown faker: $f (supported: ${Faker.registry.keys.toSeq.sorted.mkString(", ")})"))(seed)
    case other => throw new IllegalArgumentException(
      s"unsupported template function: $other (uuid_v4, now, env/get_env, fake_*)")
  }

  // ---- AST ---------------------------------------------------------------

  private sealed trait Node
  private final case class TextN(s: String) extends Node
  private final case class InterpN(body: String) extends Node
  private final case class IfN(branches: Seq[(String, Seq[Node])],
                               otherwise: Option[Seq[Node]]) extends Node
  /** `{% for x in arr %}` or `{% for k, v in map %}` (kv defined ⇒ map
    * iteration in sorted-key order — tera object iteration made
    * deterministic). */
  private final case class ForN(v: String, kv: Option[String], iter: String,
                                body: Seq[Node],
                                orElse: Option[Seq[Node]] = None) extends Node
  private final case class SetN(name: String, value: String) extends Node
  /** `{% macro name(a, b="dflt") %}…{% endmacro %}` (tera macros —
    * reference embeds the full engine, src/updater/tera.rs:248). */
  private final case class MacroDefN(name: String, params: Seq[(String, Option[String])],
                                     body: Seq[Node]) extends Node
  /** `{% filter upper %}…{% endfilter %}` — the whole body through one
    * filter (tera filter sections). */
  private final case class FilterBlockN(name: String, args: Option[String],
                                        body: Seq[Node]) extends Node
  private final case class IncludeN(name: String) extends Node
  private final case class ImportN(tmpl: String, ns: String) extends Node
  private final case class ExtendsN(name: String) extends Node
  private final case class BlockN(name: String, body: Seq[Node]) extends Node

  // ---- tokenizer ---------------------------------------------------------

  private val Tok = raw"\{\{[\s\S]*?\}\}|\{%[\s\S]*?%\}".r

  /** Raw token stream: Left(text) | Right(tag-or-interp with braces). */
  private def tokenize(template: String): Vector[Either[String, String]] = {
    val out = Vector.newBuilder[Either[String, String]]
    var last = 0
    for (m <- Tok.findAllMatchIn(template)) {
      if (m.start > last) out += Left(template.substring(last, m.start))
      out += Right(m.matched)
      last = m.end
    }
    if (last < template.length) out += Left(template.substring(last))
    applyWsControl(out.result())
  }

  /** `{%-`/`{{-` trims the end of the preceding text; `-%}`/`-}}` trims the
    * start of the following text (tera whitespace control). */
  private def applyWsControl(toks: Vector[Either[String, String]]): Vector[Either[String, String]] = {
    val arr = toks.toArray
    arr.indices.foreach {
      case i if arr(i).isRight =>
        val t = arr(i).toOption.get
        if ((t.startsWith("{%-") || t.startsWith("{{-")) && i > 0)
          arr(i - 1) = arr(i - 1).left.map(_.replaceAll("\\s+$", ""))
        if ((t.endsWith("-%}") || t.endsWith("-}}")) && i + 1 < arr.length)
          arr(i + 1) = arr(i + 1).left.map(_.replaceAll("^\\s+", ""))
      case _ =>
    }
    arr.toVector
  }

  /** Strip braces + ws-control dashes from a tag token → inner body. */
  private def inner(tok: String): String =
    tok.stripPrefix("{{").stripPrefix("{%").stripSuffix("}}").stripSuffix("%}")
      .stripPrefix("-").stripSuffix("-").trim

  // ---- parser ------------------------------------------------------------

  private val ForTag = raw"for\s+(\w+)\s+in\s+(.+)".r
  private val ForKvTag = raw"for\s+(\w+)\s*,\s*(\w+)\s+in\s+(.+)".r
  private val SetTag = raw"set\s+(\w+)\s*=\s*(.+)".r
  private val MacroTag = raw"macro\s+(\w+)\s*\((.*)\)".r
  private val ImportTag = raw"""import\s+["']([^"']+)["']\s+as\s+(\w+)""".r

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  /** Split on top-level `sep` — quotes and parens shield (macro kwargs can
    * nest calls: `self::m(a=other::n(x=1), b="y,z")`). */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0; var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') { cur += c; quote = c }
      else if (c == '(') { depth += 1; cur += c }
      else if (c == ')') { depth -= 1; cur += c }
      else if (c == sep && depth == 0) { out += cur.result(); cur.clear() }
      else cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** `a, b="x", c=3` → (name, default-source?) pairs. Defaults stay SOURCE
    * strings and compile in the macro-definition scope at call time. */
  private def parseParams(s: String): Seq[(String, Option[String])] =
    splitTop(s, ',').map { p =>
      p.split("=", 2) match {
        case Array(n)    => (n.trim, None)
        case Array(n, d) => (n.trim, Some(d.trim))
      }
    }

  private def parse(template: String): Seq[Node] = {
    val toks = tokenize(template)
    var pos = 0
    // parses until one of `until` block-closers; returns (nodes, closer)
    def block(until: Set[String]): (Seq[Node], String) = {
      val nodes = Seq.newBuilder[Node]
      while (pos < toks.length) {
        toks(pos) match {
          case Left(text) => nodes += TextN(text); pos += 1
          case Right(tok) if tok.startsWith("{{") =>
            nodes += InterpN(inner(tok)); pos += 1
          case Right(tok) =>
            val body = inner(tok)
            val keyword = body.takeWhile(!_.isWhitespace)
            if (until.contains(keyword)) { pos += 1; return (nodes.result(), body) }
            keyword match {
              case "if" =>
                pos += 1
                val branches = Seq.newBuilder[(String, Seq[Node])]
                var cond = body.stripPrefix("if").trim
                var closer = ""
                var done = false
                while (!done) {
                  val (b, c) = block(Set("elif", "else", "endif"))
                  require(c.nonEmpty, "missing {% endif %}")
                  branches += ((cond, b)); closer = c
                  if (c.startsWith("elif")) cond = c.stripPrefix("elif").trim
                  else done = true
                }
                val otherwise =
                  if (closer == "else") {
                    val (b, c) = block(Set("endif"))
                    require(c.nonEmpty, "missing {% endif %}")
                    Some(b)
                  } else None
                nodes += IfN(branches.result(), otherwise)
              case "for" =>
                pos += 1
                // tera for-else: the else branch renders when the iterable
                // is empty
                def forBody(): (Seq[Node], Option[Seq[Node]]) = {
                  val (b, c) = block(Set("endfor", "else"))
                  require(c.nonEmpty, "missing {% endfor %}")
                  if (c == "else") {
                    val (eb, c2) = block(Set("endfor"))
                    require(c2.nonEmpty, "missing {% endfor %}")
                    (b, Some(eb))
                  } else (b, None)
                }
                body match {
                  case ForKvTag(k1, v1, iter) =>
                    val (b, eb) = forBody()
                    nodes += ForN(k1, Some(v1), iter.trim, b, eb)
                  case ForTag(v, iter) =>
                    val (b, eb) = forBody()
                    nodes += ForN(v, None, iter.trim, b, eb)
                  case _ => throw new IllegalArgumentException(s"bad for tag: {% $body %}")
                }
              case "raw" =>
                // verbatim passthrough: tokens re-emit with their braces
                // until {% endraw %} (tera raw sections)
                pos += 1
                val sb = new StringBuilder
                var rawDone = false
                while (!rawDone) {
                  require(pos < toks.length, "missing {% endraw %}")
                  toks(pos) match {
                    case Right(tok) if tok.startsWith("{%") &&
                        inner(tok).startsWith("endraw") => rawDone = true
                    case Right(tok) => sb ++= tok
                    case Left(t)    => sb ++= t
                  }
                  pos += 1
                }
                nodes += TextN(sb.result())
              case "set" =>
                pos += 1
                body match {
                  case SetTag(n, v) => nodes += SetN(n, v.trim)
                  case _ => throw new IllegalArgumentException(s"bad set tag: {% $body %}")
                }
              case "macro" =>
                pos += 1
                body match {
                  case MacroTag(name, params) =>
                    val (b, c) = block(Set("endmacro"))
                    require(c.nonEmpty, "missing {% endmacro %}")
                    nodes += MacroDefN(name, parseParams(params), b)
                  case _ => throw new IllegalArgumentException(s"bad macro tag: {% $body %}")
                }
              case "filter" =>
                pos += 1
                val spec = body.stripPrefix("filter").trim
                val (fname, fargs) = spec match {
                  case FilterCall(n, a) => (n, Option(a))
                  case _ => throw new IllegalArgumentException(s"bad filter tag: {% $body %}")
                }
                val (b, c) = block(Set("endfilter"))
                require(c.nonEmpty, "missing {% endfilter %}")
                nodes += FilterBlockN(fname, fargs, b)
              case "include" =>
                pos += 1
                nodes += IncludeN(unquote(body.stripPrefix("include").trim))
              case "import" =>
                pos += 1
                body match {
                  case ImportTag(t, ns) => nodes += ImportN(t, ns)
                  case _ => throw new IllegalArgumentException(
                    s"""bad import tag (expected {% import "tmpl" as ns %}): {% $body %}""")
                }
              case "extends" =>
                pos += 1
                nodes += ExtendsN(unquote(body.stripPrefix("extends").trim))
              case "block" =>
                pos += 1
                val name = body.stripPrefix("block").trim
                require(name.nonEmpty, "block tag needs a name")
                val (b, c) = block(Set("endblock"))
                require(c.nonEmpty, "missing {% endblock %}")
                nodes += BlockN(name, b)
              case other => throw new IllegalArgumentException(
                s"unsupported template tag: {% $other %} (supported: if/elif/else/endif, " +
                  "for/endfor, set, macro/endmacro, include, import, extends, block/endblock)")
            }
        }
      }
      (nodes.result(), "")
    }
    val (nodes, closer) = block(Set.empty)
    require(closer.isEmpty, s"unexpected {% $closer %}")
    nodes
  }

  // ---- template units (macro / include / import / inheritance scope) ----

  /** One parsed template inside a registry. All cross-template resolution —
    * include splicing, `ns::macro(...)` expansion, extends/block overriding —
    * happens at PLAN TIME, so the emitted Column is the same codegen'd
    * concat/CASE chain a single flat template compiles to (no per-row
    * template interpreter at 100 TB). `loading` guards include/import/extends
    * cycles. */
  private final class Tmpl(source: String, registry: Map[String, String],
                           loading: Set[String]) {
    val allNodes: Seq[Node] = parse(source)
    val extendsName: Option[String] = allNodes.collectFirst { case ExtendsN(n) => n }
    val macros: Map[String, MacroDefN] =
      allNodes.collect { case m: MacroDefN => (m.name, m) }.toMap
    def load(name: String): Tmpl = {
      require(!loading.contains(name), s"template cycle at '$name'")
      new Tmpl(registry.getOrElse(name, throw new IllegalArgumentException(
        s"unknown template: '$name' (registered: ${registry.keys.toSeq.sorted.mkString(", ")})")),
        registry, loading + name)
    }
    /** Macro namespaces visible here: `self::` (own macros — tera's
      * same-file call syntax) plus every `{% import "t" as ns %}`. Each
      * macro carries its DEFINING unit so its body resolves nested macro
      * calls in its own scope, not the caller's. */
    lazy val namespaces: Map[String, Map[String, (MacroDefN, Tmpl)]] = {
      val imported = allNodes.collect { case ImportN(t, ns) =>
        val u = load(t)
        ns -> u.macros.map { case (k, v) => (k, (v, u)) }
      }.toMap
      imported + ("self" -> macros.map { case (k, v) => (k, (v, this)) })
    }
    /** Renderable stream: defs/imports/extends are declarations, not output. */
    val bodyNodes: Seq[Node] = allNodes.filterNot {
      case _: MacroDefN | _: ImportN | _: ExtendsN => true
      case _ => false
    }
  }

  // ---- compilation -------------------------------------------------------

  /** Column reference for a variable; dotted/pointer paths descend structs.
    * `input.` / `output.` context prefixes map to the current row; loop
    * variables and `{% set %}` names resolve from `env` first. */
  private def ref(path: String, env: Map[String, Column]): Column = {
    val norm = path.trim
    env.get(norm).getOrElse {
      val parts = norm.split("[./]").filter(_.nonEmpty) match {
        case Array("input" | "output", rest @ _*) if rest.nonEmpty => rest.toArray
        // `context.steps.<step>.<field>` (reference transformer context):
        // steps here are whole-frame column transforms, so a record's
        // value "at step X" is the column itself unless a later action
        // overwrote it — the same input ≡ output approximation documented
        // above
        case Array("context", "steps", _, rest @ _*) if rest.nonEmpty => rest.toArray
        case p => p
      }
      parts.tail.foldLeft(env.getOrElse(parts.head, col(parts.head)))((c, f) => c.getField(f))
    }
  }

  private val NumLit = raw"-?\d+(\.\d+)?".r
  private val FilterCall = raw"(\w+)\s*(?:\((.*)\))?\s*".r

  private val FnCallPat = raw"(\w+)\s*\((.*)\)".r

  private val MacroCallPat = raw"(\w+)::(\w+)\s*\((.*)\)".r

  /** A bare operand: quoted string, number, bool, macro call, function
    * call, or variable path. */
  private def operand(s: String, env: Map[String, Column], tmpl: Tmpl): Column = {
    val t = s.trim
    if ((t.startsWith("\"") && t.endsWith("\"") && t.length >= 2) ||
        (t.startsWith("'") && t.endsWith("'") && t.length >= 2)) lit(t.substring(1, t.length - 1))
    else if (t == "true") lit(true)
    else if (t == "false") lit(false)
    else if (NumLit.matches(t)) { if (t.contains('.')) lit(t.toDouble) else lit(t.toLong) }
    else t match {
      case MacroCallPat(ns, name, argsRaw) => expandMacro(ns, name, argsRaw, env, tmpl)
      case FnCallPat(name, args) => templateFunction(name, parseArgs(args), env, tmpl)
      case _ => ref(t, env)
    }
  }

  /** `{{ ns::name(k=v, …) }}` — tera macro invocation. Kwarg VALUES compile
    * in the caller's scope; the BODY compiles with only its params bound
    * (tera: macros see their arguments, not the caller's context) and in
    * its defining template's namespace, so nested `self::` calls resolve
    * where the macro was written. Expansion is compile-time inlining — a
    * macro used in a million-row scan costs exactly its body's columns. */
  private def expandMacro(ns: String, name: String, argsRaw: String,
                          env: Map[String, Column], tmpl: Tmpl): Column = {
    val space = tmpl.namespaces.getOrElse(ns, throw new IllegalArgumentException(
      s"unknown macro namespace: $ns (visible: ${tmpl.namespaces.keys.toSeq.sorted.mkString(", ")})"))
    val (mdef, defTmpl) = space.getOrElse(name, throw new IllegalArgumentException(
      s"unknown macro: $ns::$name (in $ns: ${space.keys.toSeq.sorted.mkString(", ")})"))
    val kwargs = splitTop(argsRaw, ',').map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"macro args must be kwargs (k=v): '$kv' in $ns::$name")
      kv.substring(0, i).trim -> kv.substring(i + 1).trim
    }.toMap
    val unknown = kwargs.keySet -- mdef.params.map(_._1).toSet
    require(unknown.isEmpty, s"unknown args ${unknown.mkString(", ")} for macro $ns::$name")
    val bound = mdef.params.map { case (p, dflt) =>
      p -> kwargs.get(p).map(v => arith(v, env, tmpl))
        .orElse(dflt.map(d => operand(d, Map.empty, defTmpl)))
        .getOrElse(throw new IllegalArgumentException(
          s"macro $ns::$name missing required arg: $p"))
    }.toMap
    renderNodes(mdef.body, bound, defTmpl, Map.empty)
  }

  /** Parse `k="v", k2=3` filter args; commas inside quotes don't split
    * (so `split(pat=",")` parses). */
  private def parseArgs(s: String): Map[String, String] = {
    val pairs = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') { cur += c; quote = c }
      else if (c == ',') { pairs += cur.result(); cur.clear() }
      else cur += c
    }
    if (cur.nonEmpty) pairs += cur.result()
    pairs.result().iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split("=", 2).map(_.trim)
      val unq =
        if ((v.startsWith("\"") && v.endsWith("\"")) || (v.startsWith("'") && v.endsWith("'")))
          v.substring(1, v.length - 1)
        else v
      k -> unq
    }.toMap
  }

  /** Compile one `{{ ... }}` body: operand + optional filter chain. */
  /** Arithmetic in interpolation heads: `{{ a * b.c + 2 }}` — chewdata
    * transformer patterns do arithmetic inline (reference:
    * examples/transform-mapping.rs builds my_new_field from a product).
    * Operators + - * / % with parens and precedence; operands delegate to
    * `operand`, so paths, literals, filters-free function calls keep
    * working. A bare operand (no top-level operator) compiles exactly as
    * before. NB: tera identifiers cannot contain '-' or '/', so `a-b`
    * is a subtraction and `a/b` a division here too (exactly tera's
    * reading); pointer-style paths inside templates must use dots. */
  private def arith(s: String, env: Map[String, Column], tmpl: Tmpl): Column = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")") && wrapsWhole(t))
      return arith(t.substring(1, t.length - 1), env, tmpl)
    topLevelOp(t) match {
      case Some((l, op, r)) =>
        val lc = arith(l, env, tmpl); val rc = arith(r, env, tmpl)
        op match {
          case '+' => lc + rc
          case '-' => lc - rc
          case '*' => lc * rc
          case '/' => lc / rc
          case '%' => lc % rc
          // tera `~`: string concatenation, loosest precedence
          case '~' => concat(lc.cast("string"), rc.cast("string"))
        }
      case None => operand(t, env, tmpl)
    }
  }

  /** Do the outer parens enclose the whole string? */
  private def wrapsWhole(t: String): Boolean = {
    var depth = 0; var quote: Char = 0
    for (i <- 0 until t.length) {
      val c = t.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '"' | '\'' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0 && i < t.length - 1) return false
        case _ =>
      }
    }
    depth == 0
  }

  /** Split at the LAST lowest-precedence top-level operator (left-assoc):
    * prefer +/- over * / %; None when the string is a single operand. */
  private def topLevelOp(t: String): Option[(String, Char, String)] = {
    var depth = 0; var quote: Char = 0
    var catPos = -1; var addPos = -1; var mulPos = -1
    for (i <- 0 until t.length) {
      val c = t.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '"' | '\'' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case '~' if depth == 0 => catPos = i
        case '+' | '-' if depth == 0 =>
          // binary only: something operand-like must precede (else it is a
          // sign, as in `-1` or `2 * -3`)
          val prev = t.substring(0, i).trim
          if (prev.nonEmpty && !"+-*/%~(=,".contains(prev.last)) addPos = i
        case '*' | '/' | '%' if depth == 0 =>
          val prev = t.substring(0, i).trim
          if (prev.nonEmpty && !"+-*/%~(=,".contains(prev.last)) mulPos = i
        case _ =>
      }
    }
    val pos = if (catPos >= 0) catPos else if (addPos >= 0) addPos else mulPos
    if (pos < 0) None
    else Some((t.substring(0, pos), t.charAt(pos), t.substring(pos + 1)))
  }

  /** Apply one named filter (shared by `{{ … | f }}` chains and filtered
    * condition operands). `args == null` means no parens were written —
    * the zero-arg form. `merge`/`map` resolve their argument in the
    * CALLER's scope (reference: filters::object::merge takes `with=` —
    * another value, not a string; map takes `attribute=`). */
  private def applyFilter(c: Column, name: String, args: String,
                          env: Map[String, Column], tmpl: Tmpl): Column =
    if (args == null)
      filters.get(name).orElse(objectFilters.get(name)).getOrElse(
        throw new IllegalArgumentException(
          s"unsupported template filter: $name (supported: ${(filters.keys ++ objectFilters.keys ++ argFilters.keys).toSeq.sorted.mkString(", ")}, merge, map)"))(c)
    else name match {
      case "merge" =>
        val raw = splitTop(args, ',').collectFirst {
          case kv if kv.takeWhile(_ != '=').trim == "with" =>
            kv.dropWhile(_ != '=').drop(1).trim
        }.getOrElse(throw new IllegalArgumentException("merge requires with=<object>"))
        ObjectFns.merge(c, arith(raw, env, tmpl))
      case "map" =>
        element_at(c, lit(parseArgs(args).getOrElse("attribute",
          throw new IllegalArgumentException("map requires attribute=<key>"))))
      case _ => argFilters.getOrElse(name, throw new IllegalArgumentException(
        s"filter $name takes no args or is unsupported"))(c, parseArgs(args))
    }

  private def compileExpr(body: String, env: Map[String, Column], tmpl: Tmpl): Column = {
    val parts = body.split("\\|").map(_.trim).filter(_.nonEmpty)
    // `{{ input | json_encode() }}` — the reference's whole-record JSON
    // idiom (transformer docs): when the pipeline bound the row struct
    // (`__row__input`/`__row__output`), encode THE ROW, not a wrapped
    // single field
    val head = parts.head.trim
    val (base, chain) =
      if (env.contains("__row__" + head) &&
          parts.tail.headOption.exists(_.startsWith("json_encode")))
        (to_json(env("__row__" + head)), parts.tail.tail)
      else (arith(parts.head, env, tmpl), parts.tail)
    chain.foldLeft(base) { (c, f) =>
      f match {
        case FilterCall(name, args) => applyFilter(c, name, args, env, tmpl)
        case other => throw new IllegalArgumentException(s"bad filter syntax: $other")
      }
    }
  }

  /** Recursive-descent tera condition parser → boolean Column.
    * grammar: or ← and (`or` and)*; and ← not (`and` not)*;
    * not ← `not` not | `(` or `)` | cmp;
    * cmp ← operand ((==|!=|<=|>=|<|>) operand | `is` [`not`] `defined`)? */
  private class CondParser(s: String, env: Map[String, Column], tmpl: Tmpl) {
    private var pos = 0
    private def ws(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    private def peekWord: String = {
      ws(); val start = pos
      var i = pos
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      s.substring(start, i)
    }
    private def eatWord(w: String): Boolean =
      if (peekWord == w) { ws(); pos += w.length; true } else false

    def parseOr(): Column = {
      var c = parseAnd()
      while (eatWord("or")) c = c || parseAnd()
      c
    }
    private def parseAnd(): Column = {
      var c = parseNot()
      while (eatWord("and")) c = c && parseNot()
      c
    }
    private def parseNot(): Column = {
      if (eatWord("not")) !parseNot()
      else {
        ws()
        if (pos < s.length && s.charAt(pos) == '(') {
          pos += 1
          val c = parseOr()
          ws()
          require(pos < s.length && s.charAt(pos) == ')', s"unbalanced paren in: $s")
          pos += 1
          c
        } else parseCmp()
      }
    }
    // arithmetic inside conditions (`{% if n * 2 > 10 %}`): sum over
    // product over operand, left-associative with precedence
    private def parseSum(): Column = {
      var c = parseProd()
      ws()
      while (pos < s.length && (s.charAt(pos) == '+' || s.charAt(pos) == '-')) {
        val op = s.charAt(pos); pos += 1
        val r = parseProd()
        c = if (op == '+') c + r else c - r
        ws()
      }
      c
    }
    private def parseProd(): Column = {
      var c = parseFiltered()
      ws()
      while (pos < s.length && "*/%".contains(s.charAt(pos))) {
        val op = s.charAt(pos); pos += 1
        val r = parseFiltered()
        c = op match { case '*' => c * r; case '/' => c / r; case _ => c % r }
        ws()
      }
      c
    }

    /** Operand with a tera filter chain: `s | length <= max` compares the
      * FILTERED value (tera precedence: filters bind tighter than any
      * operator). `|` is unambiguous here — tera spells disjunction `or`. */
    private def parseFiltered(): Column = {
      var c = parseOperand()
      ws()
      while (pos < s.length && s.charAt(pos) == '|') {
        pos += 1; ws()
        val start = pos
        while (pos < s.length && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_')) pos += 1
        val name = s.substring(start, pos)
        require(name.nonEmpty, s"dangling | in condition: $s")
        ws()
        var args: String = null
        if (pos < s.length && s.charAt(pos) == '(') {
          val a0 = pos + 1; var depth = 1; var i = pos + 1; var q: Char = 0
          while (i < s.length && depth > 0) {
            val ch = s.charAt(i)
            if (q != 0) { if (ch == q) q = 0 }
            else if (ch == '"' || ch == '\'') q = ch
            else if (ch == '(') depth += 1
            else if (ch == ')') depth -= 1
            i += 1
          }
          require(depth == 0, s"unbalanced filter args in: $s")
          args = s.substring(a0, i - 1)
          pos = i
        }
        c = applyFilter(c, name, args, env, tmpl)
        ws()
      }
      c
    }

    private def parseCmp(): Column = {
      val left = parseSum()
      ws()
      if (eatWord("is")) {
        val neg = eatWord("not")
        // tera tests: defined/undefined (≈ null check under a fixed
        // schema) and the string tests chewdata rules use
        // (reference validator docs: `input.text is matching('...')`)
        val base =
          if (eatWord("defined")) left.isNotNull
          else if (eatWord("undefined")) left.isNull
          else if (eatWord("matching")) left.rlike(parseParenString())
          else if (eatWord("containing")) left.contains(parseParenString())
          else if (eatWord("starting_with")) left.startsWith(parseParenString())
          else if (eatWord("ending_with")) left.endsWith(parseParenString())
          // numeric tera tests; pmod so negatives behave (Scala % keeps sign)
          else if (eatWord("odd")) pmod(left, lit(2)) === 1
          else if (eatWord("even")) pmod(left, lit(2)) === 0
          else if (eatWord("divisibleby")) pmod(left, lit(parseParenNum())) === 0
          else throw new IllegalArgumentException(
            s"unsupported `is` test in: $s (defined/undefined, matching, containing, " +
              "starting_with, ending_with, odd, even, divisibleby)")
        if (neg) !base else base
      } else if (eatWord("not")) {
        require(eatWord("in"), s"expected `in` after `not` in: $s")
        !parseInRhs(left)
      } else if (eatWord("in")) {
        parseInRhs(left)
      } else if (pos + 1 < s.length && "==" == s.substring(pos, pos + 2)) { pos += 2; left === parseSum() }
      else if (pos + 1 < s.length && "!=" == s.substring(pos, pos + 2)) { pos += 2; left =!= parseSum() }
      else if (pos + 1 < s.length && "<=" == s.substring(pos, pos + 2)) { pos += 2; left <= parseSum() }
      else if (pos + 1 < s.length && ">=" == s.substring(pos, pos + 2)) { pos += 2; left >= parseSum() }
      else if (pos < s.length && s.charAt(pos) == '<') { pos += 1; left < parseSum() }
      else if (pos < s.length && s.charAt(pos) == '>') { pos += 1; left > parseSum() }
      else left // bare truthy column, e.g. {% if flag %}
    }
    /** `(number)` argument of a tera test (divisibleby). */
    private def parseParenNum(): Long = {
      ws()
      require(pos < s.length && s.charAt(pos) == '(', s"expected ( in: $s")
      pos += 1; ws()
      val start = pos
      while (pos < s.length && s.charAt(pos) != ')') pos += 1
      require(pos < s.length, s"expected ) in: $s")
      val v = s.substring(start, pos).trim.toLong
      pos += 1
      v
    }

    /** Right-hand side of `in` / `not in`: a literal list (`x in ["a","b"]`
      * → plan-time array membership) or any operand (`c in name` → string
      * containment, tera's substring test). */
    private def parseInRhs(left: Column): Column = {
      ws()
      if (pos < s.length && s.charAt(pos) == '[') {
        val start = pos + 1; var i = pos + 1; var q: Char = 0; var depth = 1
        while (i < s.length && depth > 0) {
          val ch = s.charAt(i)
          if (q != 0) { if (ch == q) q = 0 }
          else if (ch == '"' || ch == '\'') q = ch
          else if (ch == '[') depth += 1
          else if (ch == ']') depth -= 1
          i += 1
        }
        require(depth == 0, s"unbalanced [ in: $s")
        val items = splitTop(s.substring(start, i - 1), ',').map(v => operand(v, env, tmpl))
        pos = i
        array_contains(array(items: _*), left)
      } else parseFiltered().contains(left)
    }

    /** `('literal')` argument of a tera test. */
    private def parseParenString(): String = {
      ws()
      require(pos < s.length && s.charAt(pos) == '(', s"expected ( in: $s")
      pos += 1; ws()
      require(pos < s.length && (s.charAt(pos) == '\'' || s.charAt(pos) == '"'),
        s"expected quoted string in: $s")
      val q = s.charAt(pos); pos += 1
      val start = pos
      while (pos < s.length && s.charAt(pos) != q) pos += 1
      require(pos < s.length, s"unterminated string in: $s")
      val v = s.substring(start, pos)
      pos += 1; ws()
      require(pos < s.length && s.charAt(pos) == ')', s"expected ) in: $s")
      pos += 1
      v
    }

    private def parseOperand(): Column = {
      ws()
      val start = pos
      if (pos < s.length && (s.charAt(pos) == '"' || s.charAt(pos) == '\'')) {
        val q = s.charAt(pos); pos += 1
        while (pos < s.length && s.charAt(pos) != q) pos += 1
        require(pos < s.length, s"unterminated string in: $s")
        pos += 1
        lit(s.substring(start + 1, pos - 1))
      } else {
        // a leading sign sticks to a numeric literal ("-1"); arithmetic
        // operators otherwise end the token so `n*2` parses unspaced
        if (pos < s.length && s.charAt(pos) == '-' && pos + 1 < s.length &&
            (s.charAt(pos + 1).isDigit || s.charAt(pos + 1) == '.')) pos += 1
        while (pos < s.length && !s.charAt(pos).isWhitespace &&
               !"()<>=!|+-*/%".contains(s.charAt(pos))) pos += 1
        operand(s.substring(start, pos), env, tmpl)
      }
    }
  }

  private def compileCond(cond: String, env: Map[String, Column], tmpl: Tmpl): Column =
    new CondParser(cond, env, tmpl).parseOr()

  private def renderNodes(nodes: Seq[Node], env: Map[String, Column], tmpl: Tmpl,
                          overrides: Map[String, (Seq[Node], Tmpl)]): Column = {
    var e = env
    val pieces = nodes.flatMap {
      case SetN(n, v) => e += (n -> compileExpr(v, e, tmpl)); None
      case TextN("") => None
      case TextN(s) => Some(lit(s))
      case InterpN(b) => Some(compileExpr(b, e, tmpl).cast("string"))
      case IfN(branches, otherwise) =>
        val localEnv = e
        val first = when(compileCond(branches.head._1, localEnv, tmpl),
          renderNodes(branches.head._2, localEnv, tmpl, overrides))
        val chained = branches.tail.foldLeft(first)((acc, br) =>
          acc.when(compileCond(br._1, localEnv, tmpl), renderNodes(br._2, localEnv, tmpl, overrides)))
        Some(chained.otherwise(
          otherwise.map(renderNodes(_, localEnv, tmpl, overrides)).getOrElse(lit(""))))
      case ForN(v, kv, iterB, body, orElse) =>
        val localEnv = e
        val iterC = compileExpr(iterB, localEnv, tmpl)
        // map iteration: entries sorted by key (array_sort on the entry
        // struct sorts on its first field) — deterministic where tera's
        // object order is insertion order
        val arr = if (kv.isDefined) array_sort(map_entries(iterC)) else iterC
        // the loop body runs inside the `transform` HOF — per row, inside
        // the executor, never a driver-side expansion
        val looped = concat_ws("", transform(arr, (x, i) =>
          renderNodes(body, localEnv ++ (kv match {
            case Some(valName) => Map(v -> x.getField("key"), valName -> x.getField("value"))
            case None          => Map(v -> x)
          }) ++ Map("loop.index0" -> i, "loop.index" -> (i + lit(1))), tmpl, overrides)
            .cast("string")))
        Some(orElse match {
          // tera for-else: else renders when the iterable is empty
          case Some(eb) => when(coalesce(size(arr), lit(0)) === 0,
            renderNodes(eb, localEnv, tmpl, overrides)).otherwise(looped)
          case None => looped
        })
      case FilterBlockN(name, args, body) =>
        Some(applyFilter(renderNodes(body, e, tmpl, overrides), name, args.orNull, e, tmpl)
          .cast("string"))
      case IncludeN(t) =>
        // tera include: the included template renders with the CURRENT
        // context (env) but its own macro scope — compile-time splicing
        Some(renderTmpl(tmpl.load(t), e, Map.empty).cast("string"))
      case BlockN(name, own) =>
        overrides.get(name) match {
          case Some((b, childTmpl)) =>
            // a child's block body compiles in the CHILD's macro scope;
            // {{ super() }} splices the parent body, pre-rendered here
            val parentCol = renderNodes(own, e, tmpl, overrides).cast("string")
            Some(renderNodes(b, e + ("__super__" -> parentCol), childTmpl, Map.empty)
              .cast("string"))
          case None => Some(renderNodes(own, e, tmpl, overrides).cast("string"))
        }
      // declarations — handled at Tmpl load; inert if nested in a body
      case _: MacroDefN | _: ImportN | _: ExtendsN => None
    }
    if (pieces.isEmpty) lit("") else if (pieces.size == 1) pieces.head.cast("string")
    else concat(pieces: _*)
  }

  /** Render a unit honoring `{% extends %}`: walk up the parent chain
    * accumulating block overrides (nearest child wins — entries already in
    * `overrides` come from deeper children and take precedence). */
  private def renderTmpl(u: Tmpl, env: Map[String, Column],
                         overrides: Map[String, (Seq[Node], Tmpl)]): Column =
    u.extendsName match {
      case Some(p) =>
        val childBlocks = u.bodyNodes.collect { case BlockN(n, b) => (n, (b, u)) }.toMap
        renderTmpl(u.load(p), env, childBlocks ++ overrides)
      case None => renderNodes(u.bodyNodes, env, u, overrides)
    }

  def render(template: String): Column = render(template, Map.empty[String, Column])

  /** Render with pre-bound names — how referential datasets reach
    * patterns: the pipeline collects each (small) referential and binds
    * `alias.i.field` → lit(value), so `{{ m.2.code }}` folds to a plan
    * constant (the template analogue of a broadcast join). */
  def render(template: String, env: Map[String, Column]): Column =
    render(template, env, Map.empty)

  /** Render against a named-template registry (tera: a `Tera` instance
    * holding several templates): enables `{% include "t" %}`,
    * `{% import "t" as ns %}` + `{{ ns::macro(...) }}`, same-template
    * `{% macro %}` + `{{ self::macro(...) }}`, and `{% extends "base" %}`
    * with `{% block %}` overriding. Everything resolves at plan time —
    * the emitted Column is the same codegen'd concat/CASE chain a flat
    * template compiles to. */
  def render(template: String, env: Map[String, Column],
             templates: Map[String, String]): Column =
    renderTmpl(new Tmpl(template, templates, Set.empty), env, Map.empty)

  private val Var = raw"\{\{-?\s*([^}]+?)\s*-?\}\}".r

  /** Variables referenced by `{{ }}` interpolations (for dependency
    * pruning); literals and control-flow internals are not included. */
  def variables(template: String): Seq[String] =
    Var.findAllMatchIn(template)
      .map(_.group(1).split("\\|").head.trim)
      .filterNot(v => v.startsWith("\"") || v.startsWith("'") || NumLit.matches(v) ||
        v == "true" || v == "false" || v.startsWith("loop."))
      .toSeq
}
