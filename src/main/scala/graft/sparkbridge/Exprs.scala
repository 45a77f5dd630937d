package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 bridge between public `Column` and Catalyst `Expression`.
  * `Column` no longer exposes `.expr` publicly in Spark 4's split API and
  * `ExpressionUtils` is `private[sql]`, so this object lives under the
  * `org.apache.spark.sql` namespace to reach it. */
object Exprs {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column -> Catalyst conversion: a plain tree (UnresolvedFunction,
    * lambda variables, ...) the analyzer resolves to fixpoint. The lazy
    * `expression` wrapper keeps the tree inside a ColumnNodeExpression leaf
    * that the analyzer never descends into — fatal when the Column
    * composition is RETURNED from an injected FunctionBuilder (SQL UDF
    * surface) rather than passed through Dataset.select. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Analyze + wrap a logical plan as a DataFrame (classic.Dataset.ofRows is
    * `private[sql]` in Spark 4). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Structural type equality ignoring nullability at every level. */
  def sameTypeIgnoreNullability(a: org.apache.spark.sql.types.DataType,
                                b: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.types.DataType.equalsIgnoreNullability(a, b)

  /** Re-wrap a V1 streaming sink's micro-batch as a BATCH DataFrame (the
    * Sink.addBatch argument keeps `isStreaming = true`, which rejects
    * `observe()` and friends; `internalCreateDataFrame` is `private[sql]`).
    * The sources inside the plan are already the micro-batch's concrete
    * relations, so executing it as a batch is exact — the same move
    * `foreachBatch` makes before handing the user its DataFrame. */
  def asBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = ds.sparkSession
    spark.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
