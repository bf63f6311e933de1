package graft

import org.apache.spark.sql.functions._

/** Property-style invariants of the operator primitives over seeded random
  * samples (single batched Spark job per property). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def word(): String =
    (1 to (1 + rnd.nextInt(7))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  private def text(): String = (1 to (3 + rnd.nextInt(10))).map(_ => word()).mkString(" ")

  test("jaccard is symmetric, bounded, and 1 on identical sets") {
    val samples = Seq.fill(40)((text(), text()))
    val rows = samples.toDF("a", "b")
      .select(
        graft.plans.NativeSets.hashedSet(split(col("a"), " ")).as("ha"),
        graft.plans.NativeSets.hashedSet(split(col("b"), " ")).as("hb"))
      .select(
        graft.plans.NativeSets.jaccardSorted(col("ha"), col("hb")).as("jab"),
        graft.plans.NativeSets.jaccardSorted(col("hb"), col("ha")).as("jba"),
        graft.plans.NativeSets.jaccardSorted(col("ha"), col("ha")).as("jaa"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(2) == 1.0)
    }
  }

  test("edit-distance join equals the naive cross-filter on random short strings") {
    // a dense random dictionary over a 4-letter alphabet maximizes
    // accidental distance-1 pairs (and duplicate strings) — the regime
    // that stresses the deletion-neighborhood blocking
    def shortWord(): String =
      (1 to (1 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val df = (1L to 120L).map(i => (i, shortWord())).toDF("id", "s")
    val got = operators.FuzzyJoin.editDistancePairs(df, "id", "s", maxBucket = 4096)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reps = df.groupBy(col("s")).agg(min(col("id")).as("id"))
    val naive = reps.as("a").join(reps.as("b"),
        col("a.id") < col("b.id") && levenshtein(col("a.s"), col("b.s")) <= 1)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"blocked=${got.size} naive=${naive.size}")
    assert(naive.nonEmpty, "fixture must generate distance-1 pairs")
  }

  test("jaccard join equals the naive cross-filter on random token sets") {
    // 6-word vocabulary, 3-8 token docs: high accidental overlap, ties at
    // the threshold, duplicate sets — worst-case-ish for prefix blocking
    val vocab = Seq("ar", "be", "cu", "do", "el", "fi")
    def doc(): String =
      (1 to (3 + rnd.nextInt(6))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val df = (1L to 80L).map(i => (i, doc())).toDF("id", "t")
    val got = operators.Dedup.jaccardJoin(df, "id", "t", tNum = 3, tDen = 5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = df.select(col("id"), array_distinct(split(col("t"), " ")).as("s"))
    val naive = sets.as("a").join(sets.as("b"), col("a.id") < col("b.id"))
      .withColumn("i", size(array_intersect(col("a.s"), col("b.s"))))
      .withColumn("u", size(col("a.s")) + size(col("b.s")) - col("i"))
      .filter(col("i") * 5 >= col("u") * 3)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"blocked=${got.size} naive=${naive.size}")
    assert(naive.nonEmpty, "fixture must generate similar pairs")
  }

  test("simhash hamming is within [0,64]; 0 for reordered token multiset") {
    val samples = Seq.fill(40)((text(), text()))
    val rows = samples.toDF("a", "b")
      .select(col("a"), col("b"),
        operators.Dedup.simhash(col("a")).as("sa"),
        operators.Dedup.simhash(col("b")).as("sb"),
        operators.Dedup.simhash(
          concat_ws(" ", reverse(split(col("a"), " ")))).as("sa_rev"))
      .select(
        operators.Dedup.hamming(col("sa"), col("sb")).as("d"),
        operators.Dedup.hamming(col("sa"), col("sa_rev")).as("self"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) <= 64)
      assert(r.getInt(1) == 0)
    }
  }

  test("slugify is idempotent and alphabet-restricted") {
    val samples = Seq.fill(40)(
      (1 to 12).map(_ => (' ' + rnd.nextInt(94)).toChar).mkString)
    val rows = samples.toDF("s")
      .select(
        functions.StringFns.slugify(col("s")).as("once"),
        functions.StringFns.slugify(functions.StringFns.slugify(col("s"))).as("twice"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1))
      assert(r.getString(0).matches("[a-z0-9-]*"))
      assert(!r.getString(0).startsWith("-") && !r.getString(0).endsWith("-"))
    }
  }

  test("hjson normalizer is the identity on strict compact JSON") {
    // random nested JSON: whatever Jackson serializes, Hjson re-emits
    // byte-identically (quoted strings/numbers/bools pass through; only
    // relaxed syntax gets rewritten)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rnd = new scala.util.Random(42)
    def randValue(depth: Int): Object = rnd.nextInt(if (depth > 2) 4 else 6) match {
      case 0 => java.lang.Long.valueOf(rnd.nextLong() % 100000)
      case 1 => java.lang.Double.valueOf(math.round(rnd.nextDouble() * 1e6) / 1e3)
      case 2 => java.lang.Boolean.valueOf(rnd.nextBoolean())
      case 3 =>
        val chars = "abc XYZ_09.:/{}#,\"\\\n\t-"
        (0 until rnd.nextInt(12)).map(_ => chars(rnd.nextInt(chars.length))).mkString
      case 4 =>
        val m = new java.util.LinkedHashMap[String, Object]()
        (0 until rnd.nextInt(4)).foreach(i => m.put(s"k$i", randValue(depth + 1)))
        m
      case _ =>
        val l = new java.util.ArrayList[Object]()
        (0 until rnd.nextInt(4)).foreach(_ => l.add(randValue(depth + 1)))
        l
    }
    (1 to 200).foreach { _ =>
      val root: Object = if (rnd.nextBoolean()) {
        val m = new java.util.LinkedHashMap[String, Object]()
        (0 until rnd.nextInt(5)).foreach(i => m.put(s"k$i", randValue(0)))
        m
      } else {
        val l = new java.util.ArrayList[Object]()
        (0 until rnd.nextInt(5)).foreach(_ => l.add(randValue(0)))
        l
      }
      val json = mapper.writeValueAsString(root)
      assert(graft.pipeline.Hjson.toJson(json) == json, s"not identity on: $json")
    }
  }

  test("minhash signature similarity tracks set jaccard") {
    val df = Seq(("p q r s t u v w x y", "p q r s t u v w x y", "aa bb cc dd ee ff gg hh ii jj"))
      .toDF("a", "b", "c")
      .select(
        graft.plans.Native.minhashSig(split(col("a"), " ")).as("sa"),
        graft.plans.Native.minhashSig(split(col("b"), " ")).as("sb"),
        graft.plans.Native.minhashSig(split(col("c"), " ")).as("sc"))
    val r = df.select(
      size(array_intersect(col("sa"), col("sb"))).as("same"),
      size(array_intersect(col("sa"), col("sc"))).as("diff")).head()
    assert(r.getInt(0) == 64)   // identical input → identical 64 minima
    assert(r.getInt(1) < 8)     // disjoint shingles → near-zero agreement
  }

  test("template compiler matches a reference interpreter on random templates") {
    // differential test: generate random templates from a small grammar
    // together with a straight-line Scala evaluator, render ALL of them as
    // columns of ONE DataFrame (single job), and compare row by row. Covers
    // interpolation, arithmetic, if/else with comparisons, for over split
    // arrays with loop.index, set bindings, and filter chains.
    val g = new scala.util.Random(4711)
    def pickS() = if (g.nextBoolean()) "s1" else "s2"
    def pickN() = if (g.nextBoolean()) "n1" else "n2"
    case class T(t: String, eval: Map[String, Any] => String)
    def lit0(): T = { val w = (1 to 3).map(_ => ('a' + g.nextInt(26)).toChar).mkString; T(w, _ => w) }
    def node(depth: Int): T = g.nextInt(if (depth >= 2) 4 else 6) match {
      case 0 => lit0()
      case 1 => val v = pickS(); T(s"{{ $v }}", m => m(v).toString)
      case 2 =>
        val v = pickS()
        g.nextInt(3) match {
          case 0 => T(s"{{ $v | upper }}", m => m(v).toString.toUpperCase)
          case 1 => T(s"{{ $v | length }}", m => m(v).toString.length.toString)
          case 2 => T(s"{{ $v | reverse }}", m => m(v).toString.reverse)
        }
      case 3 =>
        val (a, b, k) = (pickN(), pickN(), g.nextInt(9) + 1)
        g.nextInt(2) match {
          case 0 => T(s"{{ $a + $b }}",
            m => (m(a).asInstanceOf[Long] + m(b).asInstanceOf[Long]).toString)
          case 1 => T(s"{{ $a * $k - $b }}",
            m => (m(a).asInstanceOf[Long] * k - m(b).asInstanceOf[Long]).toString)
        }
      case 4 =>
        val (v, cut) = (pickN(), g.nextInt(100))
        val (yes, no) = (seq(depth + 1), seq(depth + 1))
        T(s"{% if $v < $cut %}${yes.t}{% else %}${no.t}{% endif %}",
          m => if (m(v).asInstanceOf[Long] < cut) yes.eval(m) else no.eval(m))
      case 5 =>
        val v = pickS()
        g.nextInt(2) match {
          case 0 =>
            T(s"""{% for w in $v | split(pat=" ") %}[{{ w }}]{% endfor %}""",
              m => m(v).toString.split(" ", -1).map(x => s"[$x]").mkString)
          case 1 =>
            T(s"""{% for w in $v | split(pat=" ") %}{{ loop.index }}:{{ w | upper }};{% endfor %}""",
              m => m(v).toString.split(" ", -1).zipWithIndex
                .map { case (x, i) => s"${i + 1}:${x.toUpperCase};" }.mkString)
        }
    }
    def seq(depth: Int): T = {
      val parts = Seq.fill(1 + g.nextInt(3))(node(depth))
      T(parts.map(_.t).mkString, m => parts.map(_.eval(m)).mkString)
    }
    def withSet(body: T): T = {
      // a set binding referenced through interpolation
      val n = pickN()
      T(s"{% set k2 = $n * 2 %}${body.t}(k2={{ k2 }})",
        m => body.eval(m) + s"(k2=${m(n).asInstanceOf[Long] * 2L})")
    }
    val templates = Seq.fill(40)(seq(0)) ++ Seq.fill(5)(withSet(seq(0)))
    val rows = Seq.fill(8)((text(), word(), g.nextInt(200).toLong, g.nextInt(200).toLong))
    val df = rows.toDF("s1", "s2", "n1", "n2")
    val out = df.select(templates.zipWithIndex.map { case (t, i) =>
      functions.Template.render(t.t).as(s"t$i") }: _*).collect()
    rows.zip(out).foreach { case ((s1, s2, n1, n2), r) =>
      val m = Map[String, Any]("s1" -> s1, "s2" -> s2, "n1" -> n1, "n2" -> n2)
      templates.zipWithIndex.foreach { case (t, i) =>
        assert(r.getString(i) == t.eval(m),
          s"template <${t.t}> diverged on row $m: got '${r.getString(i)}' want '${t.eval(m)}'")
      }
    }
  }

  test("condition grammar matches a reference interpreter on random conditions") {
    // the CondParser owns a subtle grammar (precedence, not, filtered
    // operands, in/not-in, is-tests) — generate random boolean expressions
    // with a parallel evaluator and compare via {% if %} rendering
    val g = new scala.util.Random(2718)
    case class C(t: String, eval: Map[String, Any] => Boolean)
    def num(m: Map[String, Any], v: String): Long = m(v).asInstanceOf[Long]
    def cmp(depth: Int): C = g.nextInt(6) match {
      case 0 =>
        val (v, k) = (if (g.nextBoolean()) "n1" else "n2", g.nextInt(100))
        val ops = Seq(("<", (a: Long, b: Long) => a < b), ("<=", (a: Long, b: Long) => a <= b),
          (">", (a: Long, b: Long) => a > b), (">=", (a: Long, b: Long) => a >= b),
          ("==", (a: Long, b: Long) => a == b), ("!=", (a: Long, b: Long) => a != b))
        val (os, of) = ops(g.nextInt(ops.size))
        C(s"$v $os $k", m => of(num(m, v), k))
      case 1 =>
        val v = if (g.nextBoolean()) "n1" else "n2"
        if (g.nextBoolean()) C(s"$v is even", m => num(m, v) % 2 == 0)
        else C(s"$v is odd", m => num(m, v) % 2 != 0)
      case 2 =>
        val k = g.nextInt(5) + 2
        C(s"n1 is divisibleby($k)", m => num(m, "n1") % k == 0)
      case 3 =>
        // filtered operand: string length against a cut
        val cut = g.nextInt(30)
        C(s"s1 | length <= $cut", m => m("s1").toString.length <= cut)
      case 4 =>
        // membership in a literal list
        val items = Seq.fill(3)(('a' + g.nextInt(4)).toChar.toString)
        val lst = items.map(x => s""""$x"""").mkString("[", ", ", "]")
        C(s"s2 in $lst", m => items.contains(m("s2").toString))
      case 5 =>
        // arithmetic inside a comparison
        val k = g.nextInt(5) + 1
        C(s"n1 * $k + n2 > 150", m => num(m, "n1") * k + num(m, "n2") > 150)
    }
    def bool(depth: Int): C =
      if (depth >= 2) cmp(depth)
      else g.nextInt(4) match {
        case 0 => cmp(depth)
        // children parenthesized so the emitted string is unambiguous —
        // the first run of this property emitted `A and B` with an
        // or-node child and caught its OWN ambiguity: tera (and this
        // compiler) binds `and` tighter than `or`
        case 1 => val (a, b) = (bool(depth + 1), bool(depth + 1))
          C(s"(${a.t}) and (${b.t})", m => a.eval(m) && b.eval(m))
        case 2 => val (a, b) = (bool(depth + 1), bool(depth + 1))
          C(s"(${a.t}) or (${b.t})", m => a.eval(m) || b.eval(m))
        case 3 => val a = bool(depth + 1)
          C(s"not (${a.t})", m => !a.eval(m))
      }
    val conds = Seq.fill(50)(bool(0))
    // single-char s2 values so the in-list case can hit both branches
    val rows = Seq.fill(10)((text(), ('a' + g.nextInt(4)).toChar.toString,
      g.nextInt(200).toLong, g.nextInt(200).toLong))
    val df = rows.toDF("s1", "s2", "n1", "n2")
    val out = df.select(conds.zipWithIndex.map { case (c, i) =>
      functions.Template.render(s"{% if ${c.t} %}1{% else %}0{% endif %}").as(s"c$i") }: _*)
      .collect()
    rows.zip(out).foreach { case ((s1, s2, n1, n2), r) =>
      val m = Map[String, Any]("s1" -> s1, "s2" -> s2, "n1" -> n1, "n2" -> n2)
      conds.zipWithIndex.foreach { case (c, i) =>
        assert(r.getString(i) == (if (c.eval(m)) "1" else "0"),
          s"condition <${c.t}> diverged on row $m")
      }
    }
  }

  test("bounded top-k aggregate equals the sort-based ranking on random data") {
    // TopKByScore (heap, map-side partial trim) must agree exactly — ties
    // included — with the naive row_number ranking it replaced. Duplicate
    // scores are planted deliberately to exercise the (score DESC, id ASC)
    // tie order across partition merges.
    val k = 5
    val rows = Seq.tabulate(400) { i =>
      (i % 7L, math.floor(rnd.nextDouble() * 20) / 20, rnd.nextLong().abs % 1000)
    }
    val df = rows.toDF("g", "score", "id").repartition(8)
    val agg = df.groupBy($"g")
      .agg(graft.plans.Native.topKByScore($"score", $"id", k).as("tk"))
      .select($"g", posexplode($"tk").as(Seq("pos", "e")))
      .select($"g", ($"pos" + 1).as("rnk"), $"e.id".as("id"), $"e.cos".as("score"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(t => (t._3, t._2))
        .sortBy { case (id, s) => (-s, id) }
        .zipWithIndex.take(k)
        .map { case ((id, s), i) => (g, i + 1, id, s) }
    }.toSet
    assert(agg == expected, s"heap top-k diverged from sort top-k")
  }

  test("char diversity one-pass stats equal the explode-groupBy reference") {
    // random strings over a deliberately nasty alphabet: ASCII, accents,
    // CJK, and an astral-plane emoji (surrogate pair — one codepoint)
    val alphabet = "ab z.,é漢字😀"
    // group the alphabet into codepoints (surrogate pair stays together)
    val cps: IndexedSeq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < alphabet.length) {
        val n = Character.charCount(alphabet.codePointAt(i))
        out += alphabet.substring(i, i + n)
        i += n
      }
      out.toIndexedSeq
    }
    val samples = (0 until 60).map { i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ => cps(rnd.nextInt(cps.size))).mkString)
    }
    val df = samples.toDF("id", "s")
    val fast = df.select(col("id"), graft.operators.TextAnalysis.charStats(col("s")).as("cs"))
      .select(col("id"), col("cs.n_cp"), col("cs.distinct_cp"),
        col("cs.top_cp_n"), col("cs.sumsq"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    samples.foreach { case (id, s) =>
      val counts = s.codePoints().toArray.groupBy(identity).map(_._2.length.toLong)
      val expected =
        if (counts.isEmpty) (0L, 0L, 0L, 0L)
        else (counts.sum, counts.size.toLong, counts.max, counts.map(k => k * k).sum)
      assert(fast(id) == expected, s"mismatch on id=$id text=${s.take(30)}")
    }
  }
}
