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
}
