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
}
