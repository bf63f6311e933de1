package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantiles

/** Exact order statistics by histogram-bracket selection (Quantiles.scala):
  * exactness against a literal sort on adversarial value sets — heavy
  * ties, negatives, denormal-ish spreads — plus the degenerate fast path
  * and partitioning independence. */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val specs = Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p99", 99L, 100L))

  private def groundTruth(vs: Seq[Double]): Map[String, Double] = {
    val sorted = vs.sorted
    val n = sorted.length.toLong
    specs.map { case (nm, num, den) =>
      nm -> sorted(((n - 1) * num / den).toInt)
    }.toMap
  }

  private def run(vs: Seq[Double], buckets: Int = 64): Map[String, Double] =
    Quantiles.orderStatistics(vs.toDF("x"), "x", specs, buckets)
      .select("which", "value").as[(String, Double)].collect().toMap

  test("matches a literal sort on a mixed-sign, tie-heavy value set") {
    // deterministic pseudo-random values with planted tie blocks
    val vs = (0 until 5000).map(i => ((i * 2654435761L) % 997).toDouble - 498.0) ++
      Seq.fill(800)(42.5) ++ Seq.fill(600)(-13.25)
    assert(run(vs) === groundTruth(vs))
  }

  test("exact when 99.9% of the mass is one value (degenerate bucket)") {
    val vs = Seq.fill(9990)(7.0) ++ (1 to 10).map(_.toDouble * 1e6)
    assert(run(vs) === groundTruth(vs))
  }

  test("all-equal fast path and tiny inputs") {
    assert(run(Seq.fill(100)(3.14)).values.toSet === Set(3.14))
    assert(run(Seq(5.0)) === Map("p25" -> 5.0, "p50" -> 5.0, "p99" -> 5.0))
    assert(run(Seq(2.0, 1.0)) === groundTruth(Seq(2.0, 1.0)))
  }

  test("nulls and NaNs are excluded, result unchanged") {
    val base = (0 until 1000).map(i => ((i * 48271L) % 313).toDouble)
    val noisy = base.map(Option(_)) ++ Seq(None, None) ++
      Seq(Some(Double.NaN), Some(Double.NaN))
    val got = Quantiles.orderStatistics(noisy.toDF("x"), "x", specs, 64)
      .select("which", "value").as[(String, Double)].collect().toMap
    assert(got === groundTruth(base))
  }

  test("partitioning-independent") {
    val vs = (0 until 3000).map(i => math.sin(i).abs * 1000 - 250)
    val df1 = vs.toDF("x").repartition(1)
    val df7 = vs.toDF("x").repartition(7)
    val a = Quantiles.orderStatistics(df1, "x", specs, 64)
      .select("which", "value").as[(String, Double)].collect().toMap
    val b = Quantiles.orderStatistics(df7, "x", specs, 64)
      .select("which", "value").as[(String, Double)].collect().toMap
    assert(a === b && a === groundTruth(vs))
  }

  test("group percentiles: hand-computed interpolation per group, negatives") {
    // g=a: sorted [-10, 0, 10, 20] (n=4): p50 rank 1.5 -> x2 numerator
    // 0*(2-1) + 10*1 = 10; p95 rank 2.85 -> i=2,r=17: 10*3 + 20*17 = 370
    // g=b: [5, 5, 5] (n=3): p50 rank 1 exactly -> 5*2 = 10; p95 -> i=1,r=18
    // over ties: 5*2+5*18 = 100... all collapse to value 5 numerators
    val df = Seq(("a", 20L), ("a", -10L), ("a", 0L), ("a", 10L),
                 ("b", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val out = Quantiles.groupPercentiles(df, "g", "v",
        Seq(("p50", 1L, 2L), ("p95", 19L, 20L))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((4L, 10L, 370L)))
    assert(out("b") == ((3L, 10L, 100L)))
    // repartition must not change a single numerator
    val out7 = Quantiles.groupPercentiles(df.repartition(7), "g", "v",
        Seq(("p50", 1L, 2L), ("p95", 19L, 20L))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out7 == out)
  }

  test("winsorize clips to per-group nearest-lower-rank bounds") {
    // g=a: 11 values 0..9 and 1000 (the outlier). p10 lower-rank value at
    // i = (1*10) div 10 = 1 -> v=1; p90 at i = (9*10) div 10 = 9 -> v=9.
    val df = ((0 to 9).map(v => ("a", v.toLong)) :+ ("a", 1000L))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "v")
    val out = Quantiles.winsorizePerGroup(df, "g", "v", lo = (1L, 10L), hi = (9L, 10L))
      .select("v", "w").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 1L, "below p10 clips up")
    assert(out(1000L) == 9L, "the outlier clips to p90's stored value")
    assert(out(5L) == 5L, "in-range values pass through")
  }

  test("winsorize keeps the group column even when it is named g") {
    // the bounds join key lives under a reserved name (__wg); a bounds
    // column literally named "g" would make drop("g") delete the caller's
    // group column too.
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L)).toDF("g", "v")
    val out = Quantiles.winsorizePerGroup(df, "g", "v", lo = (1L, 10L), hi = (9L, 10L))
    assert(out.columns.contains("g"), "caller's group column must survive")
    assert(out.select("g").distinct().collect().map(_.getString(0)).toSet == Set("a"))
  }

  test("winsorize passes all-null groups through unclipped") {
    // group b has only null values: no histogram row exists, so an inner
    // join would drop its rows entirely — they must pass through with w
    // null instead.
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", Some(100L)),
                 ("b", None), ("b", None)).toDF("g", "v")
    val out = Quantiles.winsorizePerGroup(df, "g", "v", lo = (1L, 10L), hi = (9L, 10L))
      .select("g", "v", "w").collect()
    assert(out.length == 5, "all-null group rows must not vanish")
    val bRows = out.filter(_.getString(0) == "b")
    assert(bRows.length == 2 && bRows.forall(_.isNullAt(2)))
  }

  test("winsorize keeps null values null in mixed groups") {
    // group a HAS bounds (non-null values exist): a null value row must
    // still come out null — greatest/least skip nulls, so an unguarded
    // clip would return __blo for it.
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", Some(100L)),
                 ("a", None), ("b", Some(5L))).toDF("g", "v")
    val out = Quantiles.winsorizePerGroup(df, "g", "v", lo = (1L, 10L), hi = (9L, 10L))
      .select("g", "v", "w").collect()
    assert(out.length == 5)
    val nullRow = out.filter(r => r.getString(0) == "a" && r.isNullAt(1))
    assert(nullRow.length == 1 && nullRow.head.isNullAt(2),
      "null value in a bounded group must stay null, not clip to the lower bound")
    // and non-null rows in the same group still clip
    assert(out.filter(r => r.getString(0) == "a" && !r.isNullAt(1)).forall(!_.isNullAt(2)))
  }

  test("mad per group: outlier-immune where the mean is not") {
    // g=a: [1,2,3,4,1000] -> median 3 (med_x2=6); devs*2 = |2v-6| =
    // [4,2,0,2,1994] -> sorted [0,2,2,4,1994], median 2 -> mad_x4 = 4
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 1000L),
                 ("b", 7L), ("b", 9L)).toDF("g", "v")
    val out = Quantiles.madPerGroup(df, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((5L, 6L, 4L)))
    // g=b: median 8 (x2=16), devs*2 = [2,2] -> mad_x4 = 4... deviations
    // |14-16|=2 and |18-16|=2, median 2 -> x2 -> 4
    assert(out("b") == ((2L, 16L, 4L)))
  }
}
