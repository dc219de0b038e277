package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to package-private Spark internals graft's custom operator
 * needs (the standard extension-library technique; same pattern used by
 * public Spark extension projects):
 *  - `Dataset.ofRows` to hand a custom LogicalPlan back to the session
 *  - `ExpressionUtils.expression` for Column → catalyst Expression in
 *    Spark 4's column-node world
 *  - `mapPartitionsInternal` for exec-node iterators without the
 *    closure-cleaning overhead of the public mapPartitions */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Eager Column → catalyst Expression (ExpressionUtils.expression wraps
   * lazily in a ColumnNodeExpression, which hides e.g. SortOrder from
   * pattern matches). */
  def expr(c: Column): Expression = classic.ColumnNodeToExpressionConverter(c.node)

  def mapPartitionsInternal(rdd: RDD[InternalRow])(
      f: Iterator[InternalRow] => Iterator[InternalRow]): RDD[InternalRow] =
    rdd.mapPartitionsInternal(f)
}
