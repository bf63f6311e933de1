package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot loops the built-in HOF
  * (`transform`/`aggregate`) versions can't sustain: HOF lambdas are
  * interpreted per element, which measured ~0.7 s/row for a 64-permutation
  * MinHash over ~400 shingles. These evaluate one tight JVM loop per row.
  *
  * CosineSim additionally implements doGenCode so vector scoring stays
  * inside WholeStageCodegen — it's the innermost loop of ANN scans.
  */

/** cosine(a, b) over array<double> columns (null if either side null OR the
  * lengths differ — a corrupt/truncated embedding must surface as null, not
  * a plausible score over the common prefix; 0-norm guarded to NaN like the
  * plain formula). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** dot(a, b) over array<double> columns — the raw inner product CosineSim
  * normalizes; the hot loop of random-projection / matmul-style
  * transforms. Same contract as CosineSim: null if either side is null or
  * the lengths differ; sequential left-to-right accumulation, so a DuckDB
  * `list_dot_product` oracle is bit-exact. Codegen'd (stays inside
  * WholeStageCodegen like the cosine path). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object MinHashUtil {
  /** Affine permutation parameters from a fixed SplitMix64 stream —
    * deterministic across JVMs/partitions. */
  def params(k: Int): (Array[Long], Array[Long]) = {
    val a = new Array[Long](k); val b = new Array[Long](k)
    var s = 0x9E3779B97F4A7C15L
    def next(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    var i = 0
    while (i < k) { a(i) = next() | 1L; b(i) = next(); i += 1 }
    (a, b)
  }

  /** Hash a token window (shingle) without building the joined string. */
  def shingleHash(toks: ArrayData, start: Int, n: Int): Long = {
    var h = 42L
    var j = 0
    while (j < n) {
      val t = toks.getUTF8String(start + j)
      h = Murmur3_x86_32.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, (h ^ (h >>> 32)).toInt).toLong ^ (h << 1)
      j += 1
    }
    h
  }
}

/** MinHash signature: array<string> tokens → array<long> of k minima over
  * word n-gram shingles. One pass: S shingle hashes + S·k affine mixes. */
case class MinHashSig(child: Expression, shingleN: Int, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val (pa, pb) = MinHashUtil.params(k)

  override def nullSafeEval(in: Any): Any = {
    val toks = in.asInstanceOf[ArrayData]
    val s = toks.numElements()
    val nShingles = math.max(s - shingleN + 1, 1)
    val n = math.min(shingleN, s)
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < nShingles) {
      val h = MinHashUtil.shingleHash(toks, i, n)
      var j = 0
      while (j < k) {
        val v = pa(j) * h + pb(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** LSH band keys from a minhash signature: array<long> of `bands` hashes,
  * each over k/bands consecutive signature entries. */
case class BandKeys(child: Expression, bands: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_band_keys"

  override def nullSafeEval(in: Any): Any = {
    val sig = in.asInstanceOf[ArrayData]
    val k = sig.numElements()
    val r = math.max(k / bands, 1)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong * 0x9E3779B97F4A7C15L
      var j = b * r
      val end = math.min(j + r, k)
      while (j < end) {
        val v = sig.getLong(j)
        h = (h ^ v) * 0xBF58476D1CE4E5B9L
        h ^= (h >>> 29)
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): BandKeys = copy(child = c)
}

/** 64-bit SimHash of an array<string> token column (distinct tokens,
  * sign-vote per bit), returned as long. */
case class SimHash64(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(in: Any): Any = {
    val toks = in.asInstanceOf[ArrayData]
    val seen = new java.util.HashSet[Long]()
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.numElements()) {
      val t = toks.getUTF8String(i)
      val h1 = Murmur3_x86_32.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42)
      val h2 = Murmur3_x86_32.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 0x5bd1e995)
      val h = (h1.toLong << 32) | (h2.toLong & 0xFFFFFFFFL)
      if (seen.add(h)) {
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** DEFLATE-compressed byte length of a string column (java.util.zip raw
  * deflate, fixed level 6): the numerator of the compression-ratio
  * quality signal carried per document by RedPajama-v2 / Dolma —
  * repetitive or templated text compresses far below natural prose, and
  * near-random gibberish barely compresses at all. Deterministic for a
  * given input (single-shot deflate, fixed level/strategy, no
  * dictionary); the Deflater is thread-local and reset per row, so the
  * hot path allocates nothing but the output walk. */
case class DeflateLen(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(in: Any): Any = {
    val bytes = in.asInstanceOf[UTF8String].getBytes
    val d = DeflateLen.local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = DeflateLen.buf.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override protected def withNewChildInternal(c: Expression): DeflateLen = copy(child = c)
}

object DeflateLen {
  private val local = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(6, true))
  private val buf = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16384))
}

/** Winnowing fingerprint selection over a token array (Schleimer,
  * Wilkerson & Aiken 2003) as ONE per-row pass — winnowing is a
  * per-document algorithm, so the selection belongs in the map stage,
  * not in a per-window groupBy that would shuffle one row per token.
  * Computes the portable 60-bit md5 hash of each word k-gram (identical
  * to conv(substring(md5(gram),1,15),16,10) — oracle-replicable), then
  * selects the RIGHTMOST minimal hash of every w-window with a
  * monotonic deque: O(grams) total, zero allocation beyond the output.
  * Fewer than k tokens → empty; k ≤ grams < w → one whole-doc window.
  * Returns array<struct<h:long, pos:int>> of the distinct selections
  * (consecutive windows sharing a selection emit it once — selections
  * form contiguous window runs, so local dedup is exact). */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k > 0 && w > 0, s"winnow needs k > 0 and w > 0, got k=$k w=$w")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("pos", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(in: Any): Any = {
    val toks = in.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val g = n - k + 1
    if (g <= 0) return new GenericArrayData(Array.empty[Any])
    val md = WinnowSelect.md5.get()
    val hs = new Array[Long](g)
    var i = 0
    while (i < g) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      hs(i) = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      i += 1
    }
    // rightmost-min per w-window via a monotonic deque of positions with
    // strictly increasing hash front-to-back; a new element evicts every
    // back entry with hash >= its own (>= realizes the rightmost tie rule)
    val win = math.min(w, g)
    val deque = new Array[Int](g)
    var head = 0; var tail = 0 // [head, tail)
    val out = new scala.collection.mutable.ArrayBuffer[Any](2 * g / (w + 1) + 2)
    var lastPos = -1
    i = 0
    while (i < g) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1 && deque(head) != lastPos) {
        lastPos = deque(head)
        out += InternalRow(hs(lastPos), lastPos)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): WinnowSelect = copy(child = c)
}

object WinnowSelect {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
}

/** Unicode text folding for corpus normalization (the CCNet cleaning
  * pass, Wenzek et al. 2020: lowercase + accent/compatibility folding
  * before hashing or LM scoring): NFKD-normalize (compatibility forms
  * decompose — Ⅻ→XII, ①→1, ﬁ→fi), drop combining marks (é→e), then
  * lowercase. One pass per row, no regex; deterministic (java.text
  * .Normalizer is version-pinned by the JVM). */
case class TextNorm(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_text_norm"

  override def nullSafeEval(in: Any): Any = {
    val s = in.asInstanceOf[UTF8String].toString
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK)
        sb.append(Character.toLowerCase(c))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): TextNorm = copy(child = c)
}

/** Hamming distance between two long columns (bit popcount of xor). */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDist =
    copy(left = l, right = r)
}

/** Sorted distinct shingle-hash set of a token array (shingleN=1 → token
  * set). Pairs with JaccardSortedLongs for exact set jaccard without
  * per-pair string work. Uses the same shingle hash as MinHashSig, so a
  * jaccard verify measures exactly the sets the signature sketches. */
case class HashedSet(child: Expression, shingleN: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_set"

  override def nullSafeEval(in: Any): Any = {
    val toks = in.asInstanceOf[ArrayData]
    val s = toks.numElements()
    val nShingles = math.max(s - shingleN + 1, 1)
    val n = math.min(shingleN, s)
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < nShingles) {
      set.add(MinHashUtil.shingleHash(toks, i, n))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): HashedSet = copy(child = c)
}

/** Exact Jaccard of two SORTED distinct long arrays via merge walk —
  * O(|a|+|b|) with no allocation (vs per-pair hash-set building in the
  * builtin array_intersect/array_union path). */
case class JaccardSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = nx.toLong + ny.toLong - inter
    if (union == 0) 1.0 else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedLongs =
    copy(left = l, right = r)
}

/** Random-hyperplane LSH sign bits of an array<double> vector, packed into
  * a long (planes ≤ 64). Plane weights derive deterministically from
  * SplitMix64(dim, plane) — no stored model, identical on every executor. */
case class HyperplaneLsh(child: Expression, planes: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(planes <= 64, "at most 64 planes fit one long")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_lsh"

  private def weight(dim: Int, plane: Int): Double = {
    var z = dim.toLong * 0x9E3779B97F4A7C15L + plane.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= (z >>> 31)
    // map to [-1, 1)
    (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    val d = v.numElements()
    var bits = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var i = 0
      while (i < d) { s += v.getDouble(i) * weight(i, p); i += 1 }
      if (s > 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneLsh = copy(child = c)
}

/** Arbitrary MessageDigest checksum (hex) of a binary column — covers the
  * SHA-3 family Spark has no builtin for (reference supports sha2+sha3). */
case class DigestHex(child: Expression, algorithm: String)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_digest"

  @transient private lazy val md = java.security.MessageDigest.getInstance(algorithm)

  override def nullSafeEval(in: Any): Any = {
    md.reset()
    val out = md.digest(in.asInstanceOf[Array[Byte]])
    val sb = new StringBuilder(out.length * 2)
    out.foreach(b => sb.append(f"${b & 0xff}%02x"))
    UTF8String.fromString(sb.result())
  }

  override protected def withNewChildInternal(c: Expression): DigestHex = copy(child = c)
}

/** Symmetric int8 quantization report over one vector: scale = max|x|/127,
  * per element q = floor(x/scale) clamped to [-127,127]. One tight loop per
  * row (an HOF transform+aggregate here would interpret the lambda per
  * ELEMENT — the measured ~100x hot-path penalty). Arithmetic is the same
  * IEEE op sequence as the DuckDB oracle, so the gate hash-matches. */
case class Int8QuantStats(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("sum_q", LongType, nullable = false),
    StructField("n_clipped", LongType, nullable = false)))
  override def prettyName: String = "graft_int8_quant"

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    val n = v.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getDouble(i))
      if (a > mx) mx = a
      i += 1
    }
    val scale = mx / 127.0
    var sumQ = 0L
    var clipped = 0L
    // an all-zero vector has scale 0; quantize to all-zero explicitly
    // (0/0 would be NaN, whose long cast differs between engines)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val q = math.floor(v.getDouble(i) / scale).toLong
        if (math.abs(q) > 127) clipped += 1
        sumQ += math.max(-127L, math.min(127L, q))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, sumQ, clipped))
  }

  override protected def withNewChildInternal(c: Expression): Int8QuantStats = copy(child = c)
}

/** BPE segmentation of an array<string> word column with a trained merge
  * list ([[graft.operators.Bpe.train]]): each word becomes characters +
  * `</w>`, then every merge is replayed IN RANK ORDER as one greedy
  * left-to-right pass — exactly the pass the trainer's column-form
  * rewrite ran, so encode-time segmentation equals train-time
  * segmentation by construction. Output: the words' subword tokens
  * concatenated in order.
  *
  * Per row this is one tight loop of O(merges × word length) string
  * compares — embarrassingly parallel, no state, no shuffle. A
  * production encoder would pre-index merges by first symbol; at the
  * merge counts the specs and gates train (≤ a few hundred) the linear
  * replay is already faster than a HOF chain would be (each merge as a
  * nested `aggregate` lambda is interpreted per element AND grows the
  * expression tree linearly with rank count).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override def nullSafeEval(in: Any): Any = {
    val words = in.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var w = 0
    while (w < words.numElements()) {
      val word = words.getUTF8String(w).toString
      var syms = new scala.collection.mutable.ArrayBuffer[String](word.length + 1)
      var ci = 0
      while (ci < word.length) {
        val cp = word.codePointAt(ci)
        syms += new String(Character.toChars(cp))
        ci += Character.charCount(cp)
      }
      syms += "</w>"
      merges.foreach { case (a, b) =>
        if (syms.length >= 2) {
          val next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var i = 0
          while (i < syms.length) {
            if (next.nonEmpty && next.last == a && syms(i) == b)
              next(next.length - 1) = a + b
            else next += syms(i)
            i += 1
          }
          syms = next
        }
      }
      syms.foreach(s => out += UTF8String.fromString(s))
      w += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
}

/** Dictionary tagging: which of a fixed pattern list occur in a text, as
  * SUBSTRINGS, returned sorted-distinct (the FlashText / keyword-tagging
  * pass: topic routing, toxic-phrase flags, licence-string detection).
  * One Aho-Corasick automaton pass per row — O(text + hits) however
  * large the dictionary — where the naive form is |dict| `contains`
  * scans over every document; at 10k-phrase policy lists that is the
  * difference between one corpus pass and ten thousand.
  *
  * The automaton ships with the plan (built once per executor on first
  * eval, ~|dict chars| nodes) — a policy list is cluster-metadata-sized,
  * never data-sized. Presence semantics (not counts) keep the operator
  * oracle-replicable: hit set ≡ `p -> contains(text, p)` exactly.
  */
case class DictMatch(child: Expression, dict: Seq[String])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_dict_match"

  // sorted-distinct pattern list: output order == dictionary index order
  @transient private lazy val sortedDict: Array[String] =
    dict.filter(p => p != null && p.nonEmpty).distinct.sorted.toArray

  @transient private lazy val automaton = DictMatch.build(sortedDict)

  override def nullSafeEval(in: Any): Any = {
    val text = in.asInstanceOf[UTF8String].toString
    if (sortedDict.isEmpty) return new GenericArrayData(Array.empty[Any])
    val hits = automaton.run(text, sortedDict.length)
    val out = new scala.collection.mutable.ArrayBuffer[Any](hits.cardinality())
    var i = hits.nextSetBit(0)
    while (i >= 0) {
      out += UTF8String.fromString(sortedDict(i))
      i = hits.nextSetBit(i + 1)
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): DictMatch = copy(child = c)
}

object DictMatch {
  /** Aho-Corasick with fail links and output-set closure (outputs of a
    * node include outputs of its fail chain, folded in at build time so
    * the scan never walks fail links for reporting). */
  final class Automaton(
      next: Array[java.util.HashMap[Character, Integer]],
      outs: Array[java.util.BitSet],
      fails: Array[Int]) {
    def run(text: String, nPatterns: Int): java.util.BitSet = {
      val found = new java.util.BitSet(nPatterns)
      var state = 0
      var i = 0
      while (i < text.length && found.cardinality() < nPatterns) {
        val c = text.charAt(i)
        var s = state
        var n = next(s).get(c)
        while (n == null && s != 0) { s = fails(s); n = next(s).get(c) }
        state = if (n == null) 0 else n.intValue()
        if (outs(state) != null) found.or(outs(state))
        i += 1
      }
      found
    }
  }

  def build(patterns: Array[String]): Automaton = {
    val next = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outIdx = scala.collection.mutable.ArrayBuffer[java.util.BitSet](null)
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        var n = next(s).get(c)
        if (n == null) {
          next += new java.util.HashMap[Character, Integer]()
          outIdx += null
          n = next.length - 1
          next(s).put(c, n)
        }
        s = n.intValue()
      }
      if (outIdx(s) == null) outIdx(s) = new java.util.BitSet()
      outIdx(s).set(pi)
    }
    val fails = new Array[Int](next.length)
    val queue = new java.util.ArrayDeque[Integer]()
    next(0).forEach { (_, n) => fails(n) = 0; queue.add(n) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      next(u).forEach { (c, v) =>
        var f = fails(u)
        var n = next(f).get(c)
        while (n == null && f != 0) { f = fails(f); n = next(f).get(c) }
        fails(v) = if (n == null || n == v) 0 else n.intValue()
        // output-set closure: inherit the fail target's outputs
        if (outIdx(fails(v)) != null) {
          if (outIdx(v) == null) outIdx(v) = new java.util.BitSet()
          outIdx(v).or(outIdx(fails(v)))
        }
        queue.add(v)
      }
    }
    new Automaton(next.toArray, outIdx.toArray, fails)
  }
}

/** One-pass per-document character histogram statistics — the raw
  * material of the character-diversity quality signals corpus-curation
  * pipelines run at scan time (MassiveText/Gopher-family heuristics flag
  * gibberish and template spam by character concentration; Simpson's
  * diversity index 1 − Σn_c²/N² is the log-free cousin of character
  * entropy, chosen here because it needs only IEEE-exact ops — one
  * subtraction and one division — so a SQL oracle reproduces it
  * bit-for-bit, which `log` cannot guarantee).
  *
  * Counts Unicode codepoints (surrogate pairs are one character). ASCII
  * rides a flat 128-slot array; anything above spills to a map. One tight
  * loop per row in the scan stage — no explode (a char-level explode at
  * 100 TB is a 100× row multiplier into a shuffle), no shuffle, nothing
  * leaves the row but four longs.
  *
  * Returns struct(n_cp, distinct_cp, top_cp_n, sumsq) — all exact longs;
  * derived ratios (Simpson, top-char fraction) are left to the caller so
  * each is a single IEEE op shape.
  */
case class CharDiversity(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_cp", LongType, nullable = false),
    StructField("distinct_cp", LongType, nullable = false),
    StructField("top_cp_n", LongType, nullable = false),
    StructField("sumsq", LongType, nullable = false)))
  override def prettyName: String = "graft_char_diversity"

  override def nullSafeEval(in: Any): Any = {
    val s = in.asInstanceOf[UTF8String].toString
    val ascii = new Array[Long](128)
    var wide: java.util.HashMap[Integer, Array[Long]] = null
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (wide == null) wide = new java.util.HashMap[Integer, Array[Long]]()
        val cell = wide.computeIfAbsent(cp, _ => new Array[Long](1))
        cell(0) += 1
      }
    }
    var distinct = 0L
    var top = 0L
    var sumsq = 0L
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0) { distinct += 1; sumsq += k * k; if (k > top) top = k }
      c += 1
    }
    if (wide != null) wide.forEach { (_, cell) =>
      val k = cell(0)
      distinct += 1; sumsq += k * k; if (k > top) top = k
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, distinct, top, sumsq))
  }

  override protected def withNewChildInternal(c: Expression): CharDiversity = copy(child = c)
}
