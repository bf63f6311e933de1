package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** EXACT order statistics over a double column at corpus scale.
  *
  * The existing exact-percentile path (Relational.intOrderStatNumerator)
  * shuffles one row per DISTINCT value — right for integral columns,
  * wrong for doubles where distinct ≈ corpus and the "histogram" IS the
  * data. The two textbook alternatives both die at 100 TB: a global sort
  * funnels everything through a range exchange, and percentile_approx
  * gives up exactness.
  *
  * This operator is the selection-by-bracketing shape instead:
  *   1. one map-side aggregate → (min, max, count);
  *   2. one map-side histogram over `buckets` uniform value ranges —
  *      the driver sees `buckets` longs (cluster-metadata-sized, the
  *      trainCentroids small-model contract), locates each requested
  *      rank's bucket and the count below it;
  *   3. one combined refinement histogram WITHIN the hit buckets
  *      (`buckets`² effective resolution ⇒ expected sliver n/buckets²);
  *   4. per rank, a TakeOrdered over the final sliver picks the exact
  *      in-bucket offset — no window over the corpus, no collect of data
  *      rows, no global sort anywhere.
  *
  * Exactness does not depend on bucket balance, only sliver size does:
  * bucket assignment is monotone in v (IEEE subtraction and
  * multiplication/division by positive constants are monotone, floor is
  * monotone, clamping preserves it), so ranks are consistent across
  * bucket boundaries and ties co-bucket. A pathological distribution
  * (99.99% one value) degrades the sliver toward that value's
  * multiplicity, never the answer; the all-equal bucket short-circuits
  * through the lo == hi fast path at the top. Extraction filters carry a
  * redundant ulp-widened RANGE predicate alongside the exact bucket
  * predicate so parquet row-group stats can prune the sliver scan.
  *
  * Nulls and NaNs are excluded (a validator's concern, not a rank's).
  */
object Quantiles {

  /** `(name, num, den)` → the value at 0-indexed rank (n-1)·num/den
    * (integer arithmetic — no interpolation, the returned double is a
    * stored value, so cross-engine comparison is repr-exact).
    * Output: (which, rank, value), one row per spec, ordered by name. */
  def orderStatistics(df: DataFrame, valueCol: String,
                      specs: Seq[(String, Long, Long)],
                      buckets: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(specs.nonEmpty, "need at least one rank spec")
    specs.foreach { case (nm, num, den) =>
      require(den > 0 && num >= 0 && num <= den, s"bad rank spec $nm: $num/$den")
    }
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))

    val head = vals.agg(min(col("v")), max(col("v")), count(col("v"))).head()
    val (lo, hi, n) = (head.getDouble(0), head.getDouble(1), head.getLong(2))
    require(n > 0, s"no non-null values in $valueCol")
    val ranks = specs.map { case (nm, num, den) => (nm, (n - 1) * num / den) }

    if (lo == hi) // all values equal: every rank is that value
      return ranks.map { case (nm, r) => (nm, r, lo) }
        .toDF("which", "rank", "value").orderBy("which")

    def bucketOf(v: Column, l: Double, h: Double): Column =
      least(greatest(
        floor((v - lit(l)) * lit(buckets.toDouble) / (lit(h) - lit(l))).cast("int"),
        lit(0)), lit(buckets - 1))

    def locate(hist: Map[Int, Long], rank: Long): (Int, Long) = {
      var below = 0L
      var b = 0
      while (below + hist.getOrElse(b, 0L) <= rank) {
        below += hist.getOrElse(b, 0L); b += 1
      }
      (b, below)
    }

    /** Ulp-widened nominal value range of bucket b on [l, h] — a REDUNDANT
      * predicate (the exact bucket expression decides membership) that
      * parquet row-group min/max stats can prune by. */
    def roughRange(vc: Column, l: Double, h: Double, b: Int): Column = {
      val w = (h - l) / buckets
      vc >= lit(l + (b - 1) * w) && vc <= lit(l + (b + 2) * w)
    }

    // pass 2: coarse histogram (map-side partials; `buckets` rows total)
    val hist1 = vals.groupBy(bucketOf(col("v"), lo, hi).as("b")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val coarse = ranks.map { case (nm, r) => (nm, r, locate(hist1, r)) }

    // pass 3: one combined refinement histogram within every hit bucket.
    // A row can sit in two ranks' brackets (shared bucket) — tag it once
    // per rank via an exploded literal rank index.
    val w1 = (hi - lo) / buckets
    val subRanges = coarse.zipWithIndex.map { case ((_, _, (b1, _)), i) =>
      (i, b1, lo + b1 * w1, math.min(hi, lo + (b1 + 1) * w1))
    }
    val tagged = vals
      .select(col("v"), explode(array(subRanges.map { case (i, b1, _, _) =>
        when(bucketOf(col("v"), lo, hi) === b1 &&
          roughRange(col("v"), lo, hi, b1), lit(i)).otherwise(lit(-1))
      }: _*)).as("ri"))
      .filter(col("ri") >= 0)
    val b2Expr = subRanges.tail
      .foldLeft(when(col("ri") === subRanges.head._1,
        bucketOf(col("v"), subRanges.head._3, subRanges.head._4))) {
        case (acc, (i, _, sl, sh)) =>
          acc.when(col("ri") === i, bucketOf(col("v"), sl, sh))
      }
    val hist2 = tagged
      .groupBy(col("ri"), b2Expr.as("b2"))
      .count()
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

    // pass 4 (per rank, sliver-sized): TakeOrdered to the exact offset
    val rows = coarse.zipWithIndex.map { case ((nm, r, (b1, below1)), i) =>
      val (_, _, sl, sh) = subRanges(i)
      val h2 = hist2.collect { case ((ri, b2), c) if ri == i => b2 -> c }.toMap
      val (b2, below2) = locate(h2, r - below1)
      val offset = (r - below1 - below2).toInt
      val sliver = vals.filter(
        roughRange(col("v"), lo, hi, b1) &&
          bucketOf(col("v"), lo, hi) === b1 &&
          bucketOf(col("v"), sl, sh) === b2)
      val value = sliver.orderBy(col("v")).limit(offset + 1)
        .agg(max(col("v"))).head().getDouble(0)
      (nm, r, value)
    }
    rows.toDF("which", "rank", "value").orderBy("which")
  }

  /** Per-GROUP exact percentiles over an INTEGRAL value domain — the
    * latency-bands-per-endpoint query (p50/p95/p99 of a measure per key).
    *
    * Dual regime to [[orderStatistics]]: that path serves few groups over
    * a continuous domain (driver-held histograms); this one serves ANY
    * group cardinality when the value domain is integral — the per-group
    * distinct-VALUE histogram is what shuffles (bounded by domain size,
    * never corpus rows), cumulative ranks run in a per-group window over
    * that bounded frame, and linear interpolation is held integer
    * (numerator ×den) so the result is bit-exact cross-engine with no
    * double arithmetic at all. Continuous measures enter by fixed-point
    * pre-scaling (floor(v·100) cents etc. — exact IEEE multiply+floor).
    *
    * specs: (name, num, den) → the ×den numerator of the interpolated
    * 0-indexed rank num·(n−1)/den, emitted as `<name>_x<den>`:
    * v[i]·(den−r) + v[i+1]·r with i = num(n−1) div den, r = num(n−1) mod
    * den. Nulls excluded per group. */
  def groupPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                       specs: Seq[(String, Long, Long)]): DataFrame = {
    val hist = df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    groupPercentilesFromHist(hist, Seq("g"), specs)
      .withColumnRenamed("g", groupCol)
  }

  /** [[groupPercentiles]] over a PRE-AGGREGATED per-group value
    * histogram `hist(groupCols…, v: long, c: long)` — the shared core,
    * and the consumer a STREAMING pipeline needs: a watermarked
    * (window, key, value) count is exactly such a histogram for the
    * closed windows, so arrival-time percentile state stays bounded by
    * the value domain while this post-pass derives the exact
    * interpolated ranks with the identical integer algebra (VERDICT r14
    * #4). The rank windows partition by the group key (never
    * unpartitioned) and run over the histogram — domain-sized, not
    * corpus-sized. */
  def groupPercentilesFromHist(hist: DataFrame, groupCols: Seq[String],
                               specs: Seq[(String, Long, Long)]): DataFrame = {
    require(specs.nonEmpty, "need at least one rank spec")
    import org.apache.spark.sql.expressions.Window
    val gc = groupCols.map(col)
    val w = Window.partitionBy(gc: _*).orderBy("v")
    // the group total shares w's partitioning AND ordering (unbounded
    // frame), so all three sums ride ONE Window operator — a separate
    // unordered spec costs a second Sort+Window pass over the histogram
    val wAll = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    var cum = hist
      .withColumn("hi", sum(col("c")).over(w))
      .withColumn("lo", col("hi") - col("c"))
      .withColumn("n", sum(col("c")).over(wAll))
    specs.foreach { case (nm, num, den) =>
      cum = cum
        .withColumn(s"i_$nm", expr(s"($num * (n - 1)) div $den"))
        .withColumn(s"r_$nm", expr(s"($num * (n - 1)) % $den"))
    }
    def at(i: Column) = max(when(i >= col("lo") && i < col("hi"), col("v")))
    val aggCols = specs.flatMap { case (nm, _, _) => Seq(
      at(col(s"i_$nm")).as(s"vlo_$nm"),
      at(col(s"i_$nm") + when(col(s"r_$nm") > 0, 1).otherwise(0)).as(s"vhi_$nm")) }
    val keyCols = gc ++ (col("n") +: specs.map(s => col(s"r_${s._1}")))
    val grouped = cum.groupBy(keyCols: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val outCols = specs.map { case (nm, _, den) =>
      (col(s"vlo_$nm") * (lit(den) - col(s"r_$nm"))
        + col(s"vhi_$nm") * col(s"r_$nm")).cast("long").as(s"${nm}_x$den") }
    grouped.select(gc ++ (col("n") +: outCols): _*)
  }

  /** Approximate per-group percentiles at BOUNDED state over an
    * UNBOUNDED value domain — the scale path beside
    * [[groupPercentiles]]'s exact integral-domain histogram, which is
    * corpus-sized when every value is distinct (continuous measures,
    * raw micros): keep the k rows with the SMALLEST portable content
    * hashes per group (a uniform sample that is partitioning-, run- and
    * engine-independent — the samplePerGroup discipline, held in the
    * bounded minKByKey heap), then read nearest-lower-rank quantiles
    * off the sorted sample. Rank error is the classical uniform-sample
    * bound O(n/√k) w.h.p. (spec-pinned on an adversarial fixture); when
    * a group has ≤ k rows the sample IS the group and the quantiles are
    * exact. `idCol` must identify rows within a group (the hash input).
    * Returns (groupCol, n_total, m_sample, <name>_s…) — exact stored
    * longs, bit-replayable cross-engine. */
  def hashSampleQuantiles(df: DataFrame, groupCol: String, idCol: String,
                          valueCol: String, k: Int,
                          specs: Seq[(String, Long, Long)]): DataFrame = {
    require(k >= 1, s"sample size k must be >= 1, got $k")
    require(specs.nonEmpty, "need at least one rank spec")
    val h = conv(substring(md5(
      concat(col(groupCol), lit("-"), col(idCol)).cast("binary")), 1, 15),
      16, 10).cast("long")
    val sample = df
      .select(col(groupCol).as("g"), h.as("__h"),
        col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_total"),
        graft.plans.Native.minKByKey(col("__h"), col("v"), k).as("ks"))
      .select(col("g"), col("n_total"),
        sort_array(transform(col("ks"), e => e.getField("p"))).as("s"))
      .withColumn("m_sample", size(col("s")).cast("long"))
    val outCols = specs.map { case (nm, num, den) =>
      element_at(col("s"),
        (expr(s"($num * (m_sample - 1)) div $den") + 1).cast("int"))
        .as(s"${nm}_s")
    }
    sample.select(col("g").as(groupCol) +: col("n_total") +:
      col("m_sample") +: outCols: _*)
  }

  /** Per-group WINSORIZATION of an integral signal: clip each value into
    * its own group's [pLo, pHi] nearest-lower-rank percentile VALUES —
    * the outlier-taming step before moment-based statistics (a single
    * 10⁶-token doc otherwise owns its source's mean). Bounds are exact
    * STORED values at floor rank num·(n−1) div den (no interpolation ⇒
    * all integer, clip = least/greatest), computed by the same bounded
    * distinct-value histogram as [[groupPercentiles]]; one-row-per-group
    * bounds broadcast back and the clip is map-stage. */
  def winsorizePerGroup(df: DataFrame, groupCol: String, valueCol: String,
                        lo: (Long, Long), hi: (Long, Long),
                        out: String = "w"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The bounds key lives under a RESERVED name (__wg): dropping a column
    // literally named "g" after the join would also delete the caller's
    // group column if it happens to be called "g". Left join so groups
    // whose values are all null (no histogram row) pass through unclipped
    // instead of being silently dropped.
    val hist = df.select(col(groupCol).as("__wg"), col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("__wg"), col("v")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("__wg").orderBy("v")
    // unbounded frame on the SAME ordered spec: one Window operator, one
    // sort pass (a separate unordered spec costs a second Sort+Window)
    val wAll = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val cum = hist
      .withColumn("hi_", sum(col("c")).over(w))
      .withColumn("lo_", col("hi_") - col("c"))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("ilo", expr(s"(${lo._1} * (n - 1)) div ${lo._2}"))
      .withColumn("ihi", expr(s"(${hi._1} * (n - 1)) div ${hi._2}"))
    val bounds = cum.groupBy(col("__wg")).agg(
      max(when(col("ilo") >= col("lo_") && col("ilo") < col("hi_"), col("v"))).as("__blo"),
      max(when(col("ihi") >= col("lo_") && col("ihi") < col("hi_"), col("v"))).as("__bhi"))
    // The value-null guard matters in MIXED groups: Spark's greatest/least
    // SKIP nulls, so without it a null value in a group that has bounds
    // would clip to __blo instead of staying null.
    df.join(broadcast(bounds), df(groupCol) === bounds("__wg"), "left")
      .withColumn(out,
        when(col(valueCol).isNotNull &&
            col("__blo").isNotNull && col("__bhi").isNotNull,
          least(greatest(col(valueCol).cast("long"), col("__blo")), col("__bhi")))
          .otherwise(col(valueCol).cast("long")))
      .drop("__wg", "__blo", "__bhi")
  }

  /** Per-group MEDIAN and MAD (median absolute deviation) — the robust
    * location/scale pair that a single pathological document can't move
    * (unlike the mean/stddev feeding 52d's z-score). Exactness without
    * doubles: medians interpolate on integral domains, so they live as
    * ×2 numerators — median_x2 = 2·median, deviations |2·x − median_x2|
    * are exact longs, and the median of THOSE carries one more ×2 ⇒
    * mad_x4 = 4·MAD. Two applications of the same bounded distinct-value
    * histogram machinery as [[groupPercentiles]]; robust z-scores derive
    * downstream as (2·(2x − median_x2)) / mad_x4 — all integer until one
    * final division. */
  def madPerGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val med = groupPercentiles(df, groupCol, valueCol, Seq(("med", 1L, 2L)))
      .select(col(groupCol).as("__g"), col("n"), col("med_x2"))
    val dev = df.join(broadcast(med), df(groupCol) === col("__g"))
      .select(col(groupCol),
        abs(lit(2L) * col(valueCol).cast("long") - col("med_x2")).as("__dev"))
    val mad = groupPercentiles(dev, groupCol, "__dev", Seq(("mad", 1L, 2L)))
      .select(col(groupCol).as("__g2"), col("mad_x2").as("mad_x4"))
    med.join(mad, col("__g") === col("__g2"))
      .select(col("__g").as(groupCol), col("n"), col("med_x2"), col("mad_x4"))
  }
}
