package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ClassicConversions, ExpressionUtils}

/** Bridge into `private[sql]` helpers (the standard extension-library
  * pattern: Column ⇄ catalyst Expression plus function-registry access). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Fully convert a Column's node tree into catalyst expressions (the
    * analyzer can resolve these; the lazy ColumnNodeExpression wrapper from
    * `expression` cannot be used inside a function-registry builder). */
  def toCatalyst(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    ClassicConversions.castToImpl(spark).sessionState.functionRegistry

  /** Rebuild `df` as a flat scan over its own execution RDD — logical-plan
    * truncation WITHOUT the Row-conversion round-trip `createDataFrame(df
    * .rdd, schema)` pays (toRdd yields InternalRows directly). The RDD
    * lineage is preserved, so eviction recomputes through the original
    * plan — unlike localCheckpoint, which trades lineage away. Used by
    * iterative operators whose per-sweep self-composition would otherwise
    * grow the logical plan exponentially. */
  def truncatePlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val classic = ClassicConversions.castToImpl(df.sparkSession)
    classic.internalCreateDataFrame(
      ClassicConversions.castToImpl(df).queryExecution.toRdd, df.schema)
  }

  /** [[truncatePlan]] KEEPING the physical layout metadata: the flat
    * LogicalRDD records the executed plan's outputPartitioning and
    * outputOrdering (attribute-rewritten onto the new output), so a
    * persisted truncated frame still satisfies downstream exchange/sort
    * requirements — plain truncation erases both and every consumer
    * re-shuffles and re-sorts data that is already laid out (ADVICE r16:
    * representatives() had to give up truncation entirely to keep its
    * layout, re-embedding the whole upstream plan per sweep). Built on
    * Spark's own LogicalRDD.fromDataset (the Dataset.checkpoint path). */
  def truncatePlanKeepLayout(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val classic = ClassicConversions.castToImpl(df)
    val rdd = classic.queryExecution.toRdd
    val lr = org.apache.spark.sql.execution.LogicalRDD
      .fromDataset(rdd, classic, isStreaming = false)
    org.apache.spark.sql.classic.Dataset.ofRows(
      ClassicConversions.castToImpl(df.sparkSession), lr)
  }

  /** [[truncatePlan]] exposing the raw execution RDD alongside the
    * truncated frame: an iterative operator can run its per-sweep
    * convergence scan as ONE RDD job over InternalRows instead of paying
    * a second full QueryExecution (analyze + optimize + codegen of an
    * aggregate plan) per sweep. */
  def truncatePlanWithRdd(df: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame,
         org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]) = {
    val classic = ClassicConversions.castToImpl(df.sparkSession)
    val rdd = ClassicConversions.castToImpl(df).queryExecution.toRdd
    (classic.internalCreateDataFrame(rdd, df.schema), rdd)
  }

  /** Release the block-manager storage behind a localCheckpoint'd frame
    * (Dataset.unpersist only covers CacheManager entries; a local
    * checkpoint persists its RDD directly). Call ONLY when the frame is
    * fully consumed — the checkpoint's lineage is truncated, so the data
    * cannot be recomputed afterwards. */
  def releaseLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    ClassicConversions.castToImpl(df).queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Block until every queued SparkListener event has been delivered —
    * the deterministic replacement for the listener specs' Thread.sleep
    * drains (ADVICE r14: a fixed sleep under-counts task metrics on a
    * loaded machine and flakes threshold assertions). `listenerBus` is
    * `private[spark]`, hence the bridge. */
  def drainListenerBus(spark: SparkSession, timeoutMillis: Long = 30000L): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis)

  /** A clone of `spark` (same SparkContext, SharedState — so the cache
    * manager, catalog and temp views carry over) with the given runtime
    * confs overridden. The conf-mutation-free way for an iterative
    * operator to right-size ITS OWN shuffle width (or disable AQE for a
    * fixed small loop) without racing concurrent queries on the caller's
    * session — the defect ADVICE r12 flagged in the session-global conf
    * flip representatives() used. */
  def sessionWithConf(spark: SparkSession,
                      confs: Map[String, String]): SparkSession = {
    val c = ClassicConversions.castToImpl(spark).cloneSession()
    confs.foreach { case (k, v) => c.conf.set(k, v) }
    c
  }

  /** The formatted explain text as a string (Dataset.explain only prints)
    * — for the plan-dump evidence files. */
  def explainFormatted(df: org.apache.spark.sql.DataFrame): String =
    ClassicConversions.castToImpl(df).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Rebind `df`'s logical plan to another session of the same context:
    * operations and actions on the result plan/execute under `spark`'s
    * conf. Persisted data is shared (one CacheManager per SharedState),
    * so a frame persisted in one session is a cache hit in the other. */
  def rebind(df: org.apache.spark.sql.DataFrame,
             spark: SparkSession): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      ClassicConversions.castToImpl(spark),
      ClassicConversions.castToImpl(df).queryExecution.logical)
}
