package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise sum over array<double> rows as ONE aggregation buffer of
  * dim doubles (reference use: IVF/k-means centroid updates —
  * chewdata has no vector aggregate; this is the Spark-scale shape).
  *
  * Replaces the `posexplode(v) → groupBy(cell, dim) → avg` pattern: that
  * shuffles |corpus|·dim rows per Lloyd iteration; this partial-aggregates
  * map-side, so the shuffle carries one dim-length buffer per (group ×
  * partition) — at 100 TB that's the difference between a multi-TB shuffle
  * and a few MB of centroid partials.
  *
  * Ragged inputs sum over the longest length observed (short vectors are
  * zero-padded); null rows are skipped; an all-null group evaluates to null.
  */
case class VectorSum(child: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_vector_sum"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
      var i = 0
      while (i < n) { out(i) += arr.getDouble(i); i += 1 }
      out
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    val (big, small) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSum =
    copy(child = newChild)
}

/** Bounded min-k by key: keeps the `k` SMALLEST (key, payload) pairs by
  * key, as a k-entry max-heap per aggregation buffer.
  *
  * This is the LSH-bucket cap (`slice(sort_array(collect_list(...)), 1,
  * max)`) with the buffer bound moved INTO the aggregate: collect_list
  * materializes every bucket member before the slice truncates, so a
  * degenerate bucket (boilerplate docs, a collapsed embedding space) holds
  * an unbounded buffer on one executor; here the buffer never exceeds k
  * 16-byte entries no matter how hot the bucket. Output is identical to
  * the collect+sort+slice formulation when keys are unique per group:
  * array<struct<id,p>> sorted key-ascending.
  *
  * Keys/payloads are longs (callers cast integral id columns in/out);
  * null keys or payloads are skipped.
  */
case class MinKByKey(left: Expression, right: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Long, Long)]]
    with BinaryLike[Expression] {
  require(k > 0, s"min-k needs k > 0, got $k")

  private def key: Expression = left
  private def payload: Expression = right

  // dequeue yields the LARGEST kept entry (the first to evict).
  // LEXICOGRAPHIC (key, payload) order, not key alone: equal keys then
  // break toward the SMALLER payload deterministically — without this a
  // key tie at the k-th boundary keeps whichever entry arrived first,
  // making the selection partition-order-dependent and diverging from
  // every SQL-oracle `ORDER BY key, id` replay (reachable: the weighted
  // sampler's floor-quotient priorities collide under coarse weights)
  private val largestFirst: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

  override def prettyName: String = "graft_min_k"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("p", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Long, Long)] =
    scala.collection.mutable.PriorityQueue.empty(largestFirst)

  private def push(buf: scala.collection.mutable.PriorityQueue[(Long, Long)],
                   kv: (Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(kv)
    else if (largestFirst.lt(kv, buf.head)) { buf.dequeue(); buf.enqueue(kv) }
  }

  override def update(buf: scala.collection.mutable.PriorityQueue[(Long, Long)],
                      input: InternalRow): scala.collection.mutable.PriorityQueue[(Long, Long)] = {
    val kk = key.eval(input)
    val p = payload.eval(input)
    if (kk != null && p != null)
      push(buf, (kk.asInstanceOf[Long], p.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: scala.collection.mutable.PriorityQueue[(Long, Long)],
                     b2: scala.collection.mutable.PriorityQueue[(Long, Long)]): scala.collection.mutable.PriorityQueue[(Long, Long)] = {
    b2.foreach(push(b1, _))
    b1
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[(Long, Long)]): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(buf.toArray.sorted(largestFirst).map { case (kk, p) =>
      new GenericInternalRow(Array[Any](kk, p))
    })

  override def serialize(buf: scala.collection.mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    buf.foreach { case (kk, p) => bb.putLong(kk); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    (0 until bytes.length / 16).foreach { _ =>
      push(buf, (bb.getLong(), bb.getLong()))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MinKByKey =
    copy(left = newLeft, right = newRight)
}

/** Bounded top-k by score: keeps the best `k` (score, id) pairs ordered by
  * (score DESC, id ASC), as a k-entry heap per aggregation buffer.
  *
  * Replaces the `row_number() OVER (PARTITION BY query)` ranking: the
  * window funnels every scored row into |queries| sort partitions — a
  * single-task bottleneck at 100 TB. Here partial buffers trim to k
  * map-side, so the one shuffle carries k pairs per (group × partition)
  * instead of the whole scored corpus, and no global sort ever happens.
  *
  * Ids are longs (callers cast integral id columns on the way in/out);
  * null scores/ids are skipped. Evaluates to array<struct<id,cos>> sorted
  * best-first, so `posexplode` position + 1 is the rank.
  */
case class TopKByScore(left: Expression, right: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Double, Long)]]
    with BinaryLike[Expression] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private def score: Expression = left
  private def id: Expression = right

  // dequeue yields the WORST kept pair: lowest score, then highest id
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by { case (s, i) => (-s, i) }

  override def prettyName: String = "graft_top_k"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Double, Long)] =
    scala.collection.mutable.PriorityQueue.empty(worstFirst)

  private def push(buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
                   s: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else if (worstFirst.lt((s, i), buf.head)) { buf.dequeue(); buf.enqueue((s, i)) }
  }

  override def update(buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      push(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: scala.collection.mutable.PriorityQueue[(Double, Long)],
                     b2: scala.collection.mutable.PriorityQueue[(Double, Long)]): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach { case (s, i) => push(b1, s, i) }
    b1
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(buf.toArray.sorted(worstFirst).map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    })

  override def serialize(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    (0 until bytes.length / 16).foreach { _ =>
      val s = bb.getDouble(); val i = bb.getLong()
      push(buf, s, i)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}

/** Best-k (score, string-payload) pairs by (score DESC, payload ASC) as a
  * bounded heap — the [[TopKByScore]] sibling for string-keyed rankings
  * (distinctive terms per source, top documents by score) where hashing
  * the payload to a long would make the tie-break irreproducible in SQL.
  * Payload ties order by UTF8String binary comparison ≡ lexicographic for
  * ASCII (the tokenizer's output) — the oracle's ORDER BY score DESC,
  * payload ASC replays it exactly. Partial buffers trim to k map-side, so
  * a vocabulary-sized grouping never funnels through a per-group sort.
  */
case class TopKByScoreStr(left: Expression, right: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Double, org.apache.spark.unsafe.types.UTF8String)]]
    with BinaryLike[Expression] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private type Entry = (Double, org.apache.spark.unsafe.types.UTF8String)

  private def score: Expression = left
  private def payload: Expression = right

  // dequeue yields the WORST kept pair: lowest score, then largest payload
  private val worstFirst: Ordering[Entry] = new Ordering[Entry] {
    override def compare(x: Entry, y: Entry): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else x._2.compareTo(y._2)
    }
  }

  override def prettyName: String = "graft_top_k_str"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[Entry] =
    scala.collection.mutable.PriorityQueue.empty(worstFirst)

  private def push(buf: scala.collection.mutable.PriorityQueue[Entry], e: Entry): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: scala.collection.mutable.PriorityQueue[Entry],
                      input: InternalRow): scala.collection.mutable.PriorityQueue[Entry] = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null)
      // clone: eval may return a buffer-backed UTF8String that is reused
      push(buf, (s.asInstanceOf[Double],
        p.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].clone()))
    buf
  }

  override def merge(b1: scala.collection.mutable.PriorityQueue[Entry],
                     b2: scala.collection.mutable.PriorityQueue[Entry]): scala.collection.mutable.PriorityQueue[Entry] = {
    b2.foreach(push(b1, _))
    b1
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[Entry]): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(buf.toArray.sorted(worstFirst).map { case (s, p) =>
      new GenericInternalRow(Array[Any](p, s))
    })

  override def serialize(buf: scala.collection.mutable.PriorityQueue[Entry]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    buf.foreach { case (s, p) =>
      out.writeDouble(s)
      val b = p.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[Entry] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    while (in.available() > 0) {
      val s = in.readDouble()
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      push(buf, (s, org.apache.spark.unsafe.types.UTF8String.fromBytes(b)))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKByScoreStr =
    copy(left = newLeft, right = newRight)
}

/** The k smallest DISTINCT long values — a KMV / bottom-k sketch buffer
  * (Bar-Yossef et al. 2002): duplicates are absorbed on insert, so the
  * buffer is ≤ k longs no matter how heavy the value multiplicity.
  *
  * Replaces `distinct → sort → limit k` for sketch building: the exact
  * distinct shuffles every value corpus-wide before anything can be
  * truncated; this partial-aggregates map-side, so the one exchange
  * carries ≤ k longs per partition and no global sort ever runs — the
  * shape that lets two 100 TB corpora be compared by reading each once.
  *
  * Null inputs are skipped; an all-null group evaluates to null.
  * Evaluates to array<long> sorted ascending (the bottom-k set).
  */
case class BottomKDistinct(child: Expression, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {
  require(k > 0, s"bottom-k needs k > 0, got $k")

  override def prettyName: String = "graft_bottom_k_distinct"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def push(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) { if (buf.add(v)) { buf.pollLast(); () } }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) push(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b2.forEach(v => push(b1, v))
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.isEmpty) null
    else {
      val out = new Array[Long](buf.size)
      var i = 0
      buf.forEach { v => out(i) = v; i += 1 } // TreeSet iterates ascending
      new GenericArrayData(out)
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    buf.forEach(v => { bb.putLong(v); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    (0 until bytes.length / 8).foreach(_ => push(buf, bb.getLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKDistinct =
    copy(child = newChild)
}

/** Misra-Gries frequent-items summary over longs (Misra & Gries 1982;
  * mergeable form per Agarwal et al. 2013, "Mergeable Summaries"): at
  * most `k` (value, weight) counters per buffer. Any value with true
  * frequency > N/(k+1) is guaranteed present in the final summary — the
  * candidate phase of the two-pass EXACT heavy-hitter shape
  * ([[graft.operators.TextAnalysis.heavyHitters]]): an exact
  * `groupBy(term)` shuffles the whole corpus vocabulary; this bounds
  * every partial buffer at k entries, so the one exchange carries ≤ k
  * counters per partition no matter how many distinct terms 100 TB holds.
  *
  * update: present → increment; room → insert at 1; full → decrement
  * every counter (dropping zeros) — the classic amortized-O(1) step.
  * merge: sum matching counters, then subtract the (k+1)-th largest
  * weight from all and drop non-positives (the mergeable-summaries
  * reduction, which preserves the N/(k+1) undercount bound).
  *
  * Counts are LOWER bounds (never over); candidates are a SUPERSET of
  * the true heavy hitters, so an exact recount of the candidate set
  * yields the provably exact answer. The candidate set (though not its
  * guarantee) depends on encounter order — callers must treat it as a
  * superset to recount, never as the answer. Null inputs are skipped;
  * an all-null group evaluates to null. Evaluates to
  * array<struct<id: long, c: long>> id-ascending (deterministic given
  * the buffer contents).
  */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Long, Long]]
    with UnaryLike[Expression] {
  require(k > 0, s"misra-gries needs k > 0, got $k")

  override def prettyName: String = "graft_misra_gries"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  override def update(buf: java.util.HashMap[Long, Long],
                      input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (buf.containsKey(x)) buf.put(x, buf.get(x) + 1L)
      else if (buf.size < k) buf.put(x, 1L)
      else {
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(b1: java.util.HashMap[Long, Long],
                     b2: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    b2.forEach((x, c) => { buf2sum(b1, x, c); () })
    if (b1.size > k) {
      // subtract the (k+1)-th largest weight from every counter; ≤ k survive
      val weights = new Array[Long](b1.size)
      var i = 0
      b1.forEach((_, c) => { weights(i) = c; i += 1 })
      java.util.Arrays.sort(weights)
      val sub = weights(weights.length - k - 1)
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    b1
  }

  private def buf2sum(m: java.util.HashMap[Long, Long], x: Long, c: Long): Unit =
    m.put(x, if (m.containsKey(x)) m.get(x) + c else c)

  override def eval(buf: java.util.HashMap[Long, Long]): Any =
    if (buf.isEmpty) null
    else {
      val arr = new Array[(Long, Long)](buf.size)
      var i = 0
      buf.forEach((x, c) => { arr(i) = (x, c); i += 1 })
      scala.util.Sorting.quickSort(arr)(Ordering.by(_._1))
      new GenericArrayData(arr.map { case (x, c) =>
        new GenericInternalRow(Array[Any](x, c))
      })
    }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    buf.forEach((x, c) => { bb.putLong(x); bb.putLong(c); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    (0 until bytes.length / 16).foreach(_ => buf.put(bb.getLong(), bb.getLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

/** Exact second-moment sketch over array<long> rows in ONE aggregation
  * buffer: [n, s₀..s_{D−1}, upper-triangle Σqᵢqⱼ (i ≤ j, row-major)] —
  * 1 + D + D(D+1)/2 longs total (2145 at D = 64).
  *
  * This is the dimension-correlation hot path with the pair explode
  * moved INSIDE the buffer: the declarative form emits D(D+1)/2
  * interpreted-HOF struct rows per input row before the hash aggregate
  * collapses them; here each row is a tight long[] multiply-add loop and
  * the shuffle carries one buffer per (group × partition) — at 100 TB
  * the difference between a D²-amplified row stream and a few KB of
  * moment partials per partition.
  *
  * All arithmetic is exact longs (callers quantize components first and
  * own the 2⁶³ bound — see Similarity.dimCorrelations). Null rows skip;
  * a dimension mismatch between rows fails loudly (zero-padding would
  * silently distort every covariance); zero rows evaluate to null.
  */
case class VectorMoments(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_vector_moments"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def dimOf(len: Int): Int = {
    // len = 1 + d + d(d+1)/2  ⇒  d from the positive quadratic root
    val d = ((math.sqrt(9.0 + 8.0 * (len - 1)) - 3.0) / 2.0).round.toInt
    require(1 + d + d * (d + 1) / 2 == len, s"corrupt moments buffer ($len)")
    d
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      val need = 1 + d + d * (d + 1) / 2
      val out =
        if (buf.isEmpty) new Array[Long](need)
        else {
          require(buf.length == need,
            s"vector_moments: dimension mismatch ($d vs ${dimOf(buf.length)})")
          buf
        }
      // a null COMPONENT must fail loudly: ArrayData.getLong reads a
      // null slot as 0, which would silently skew every moment while
      // still counting the row in n (the distortion the dimension
      // check exists to prevent; null ROWS skip above, by contract)
      var i = 0
      while (i < d) {
        require(!arr.isNullAt(i),
          s"vector_moments: null component at dim $i (quantize nulls out first)")
        i += 1
      }
      out(0) += 1L
      i = 0
      var p = 1 + d
      while (i < d) {
        val qi = arr.getLong(i)
        out(1 + i) += qi
        var j = i
        while (j < d) { out(p) += qi * arr.getLong(j); p += 1; j += 1 }
        i += 1
      }
      out
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      require(b1.length == b2.length,
        s"vector_moments: dimension mismatch (${dimOf(b1.length)} vs ${dimOf(b2.length)})")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMoments =
    copy(child = newChild)
}
