package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape guards: the properties that make these queries survive a
  * 100× scale-up, asserted against the actual physical plans so a
  * refactor can't silently regress them. */
class PlansSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def planString(df: org.apache.spark.sql.DataFrame): String =
    executed(df).toString

  test("q_filter_project: filters push to the scan, schema is pruned") {
    val df = queries.Relational.qFilterProject(spark, sf)
    val leaf = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(leaf.contains("PushedFilters") && leaf.contains("GreaterThan(l_quantity"))
    // pruned read schema: only the needed columns, never the full table
    assert(!leaf.contains("l_shipdate") && !leaf.contains("l_tax"))
  }

  test("q1: aggregation is two-phase (partial + final) with one shuffle") {
    val s = planString(queries.Relational.q1PricingSummary(spark, sf))
    assert("HashAggregate".r.findAllIn(s).size >= 2, s"expected partial+final HashAggregate, got:\n$s")
    assert(s.contains("partial_sum"), "map-side partial aggregation missing")
  }

  test("q5: small dims broadcast, no cartesian products") {
    val s = planString(queries.Relational.q5LocalSupplier(spark, sf))
    assert(s.contains("BroadcastHashJoin"))
    assert(!s.contains("CartesianProduct"))
  }

  test("q_sort_limit plans as TakeOrdered (per-partition heap, no global sort)") {
    val s = planString(queries.Relational.qSortLimit(spark, sf))
    assert(s.contains("TakeOrderedAndProject"))
  }

  test("ann brute top-k: corpus side never shuffles before scoring") {
    val df = queries.DataOps.qAnnTopk(spark, sf)
    val plan = executed(df)
    // one shuffle for the per-query window, nothing repartitioning the corpus scan
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 1, s"expected at most the window shuffle, got ${shuffles.size}")
    assert(planString(df).contains("BroadcastNestedLoopJoin") ||
      planString(df).contains("BroadcastHashJoin"))
  }

  test("minhash candidates: no cross join anywhere in the plan") {
    val df = operators.Dedup.minhashCandidates(Tables(spark, sf).documents, "doc_id", "text")
    val s = planString(df)
    assert(!s.contains("CartesianProduct"))
  }
}
