package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Chunked range joins (RangeJoin.scala): exactness against the naive
  * cross-filter, boundary inclusivity, multi-chunk intervals, overlap
  * dedup, and the plan property that justifies the operator — no
  * cartesian/nested-loop anywhere. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("point-in-interval matches the naive cross-filter, boundaries inclusive") {
    val points = Seq((1L, 0L), (2L, 10L), (3L, 25L), (4L, 99L), (5L, 100L), (6L, 101L))
      .toDF("pid", "t")
    val ivals = Seq((10L, 10L, 25L), (11L, 0L, 0L), (12L, 100L, 200L), (13L, 30L, 20L))
      .toDF("iid", "lo", "hi") // 13 is malformed (lo > hi) -> empty
    val got = RangeJoin.pointInInterval(points, ivals, "t", "lo", "hi", chunk = 7)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.crossJoin(ivals)
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got === Set((2L, 10L), (3L, 10L), (1L, 11L), (5L, 12L), (6L, 12L)))
  }

  test("intervals spanning many chunks still match, once each") {
    val points = (0L until 200L).map(t => (t, t)).toDF("pid", "t")
    val ivals = Seq((1L, 5L, 150L)).toDF("iid", "lo", "hi") // covers ~30 chunks at 5
    val got = RangeJoin.pointInInterval(points, ivals, "t", "lo", "hi", chunk = 5)
      .select("pid").as[Long].collect().sorted
    assert(got.toSeq === (5L to 150L).toSeq) // exactly once each, inclusive
  }

  test("interval overlap: exact pair set, each pair exactly once") {
    val left = Seq((1L, 0L, 50L), (2L, 60L, 70L), (3L, 200L, 210L)).toDF("aid", "a_lo", "a_hi")
    val right = Seq((10L, 40L, 65L), (11L, 66L, 66L), (12L, 300L, 310L)).toDF("bid", "b_lo", "b_hi")
    val rows = RangeJoin.intervalOverlap(left, right, "a_lo", "a_hi", "b_lo", "b_hi", chunk = 8)
      .select("aid", "bid").as[(Long, Long)].collect()
    assert(rows.length === rows.toSet.size, s"duplicate pairs: ${rows.toSeq}")
    assert(rows.toSet === Set((1L, 10L), (2L, 10L), (2L, 11L)))
  }

  test("keys + chunk plan as an equi-join: no cartesian, no nested loop") {
    val plan = planOf(queries.DataOps.qRangeJoin(spark, sf))
    assert(!plan.contains("CartesianProduct"), "cartesian in range join plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested loop in range join plan")
    // the naive BETWEEN formulation of the same query IS a nested loop —
    // the operator exists to remove it
    val e = Tables(spark, sf).events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("sec"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("sec").as("lo"),
        (col("sec") + 21600L).as("hi"))
    val naive = clicks.join(signups, col("sec") >= col("lo") && col("sec") <= col("hi"))
    assert(planOf(naive).contains("NestedLoop"))
  }

  test("negative coordinates chunk correctly (floor, not truncate)") {
    val points = Seq((1L, -10L), (2L, -1L), (3L, 1L)).toDF("pid", "t")
    val ivals = Seq((10L, -12L, -2L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivals, "t", "lo", "hi", chunk = 7)
      .select("pid").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L))
  }
}
