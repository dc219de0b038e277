package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/**
 * Group-wise top-k as a first-class operator: logical node → strategy →
 * physical exec, registered via `extraStrategies` — the full custom-
 * operator ladder (SURVEY.md §4 named this the only candidate class of
 * plan-level work; this is the demonstration instance).
 *
 * Why an operator instead of `row_number().over(window) <= k`:
 * WindowExec buffers each key's rows, projects a rank column, and a
 * Filter then discards most of them AFTER the full shuffle. This
 * operator emits at most k rows per key while scanning the sorted
 * stream, and — the scale win — runs ONCE per map partition BEFORE the
 * exchange (partial pass), so the shuffle carries at most
 * k·|keys-per-partition| rows instead of everything. Same
 * partial/final shape as aggregation.
 */
final case class TopKPerKeyNode(k: Int, keys: Seq[Expression],
                                order: Seq[SortOrder], child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

/**
 * Physical emit-first-k-per-key over a stream sorted by (keys, order).
 * `partial = true` runs on whatever partitioning the child has (map-side
 * prune); `partial = false` requires clustering by key (final pass).
 * Spark inserts the needed SortExec/Exchange to satisfy
 * requiredChildDistribution/Ordering.
 */
final case class TopKPerKeyExec(k: Int, keys: Seq[Expression],
                                order: Seq[SortOrder], partial: Boolean,
                                child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keys.map(SortOrder(_, Ascending)) ++ order)

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // localize everything the task needs: closing over `this` would drag
    // the child SparkPlan into the task closure (not serializable)
    val kLocal = k
    val keysLocal = keys
    val childOutput = child.output
    val keyTypes = keys.map(_.dataType)
    GraftSqlBridge.mapPartitionsInternal(child.execute()) { iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      // group boundaries must use the SAME logical ordering as the sort
      // (byte equality would split sort-equal keys with distinct binary
      // encodings, e.g. case-insensitive collated strings)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      var currentKey: UnsafeRow = null
      var seen = 0
      iter.filter { row =>
        val key = keyProj(row)
        if (currentKey == null || keyOrd.compare(key, currentKey) != 0) {
          currentKey = key.copy()
          seen = 0
        }
        seen += 1
        seen <= kLocal
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** Planner strategy: partial prune per map partition, then final pass
 * after the key exchange. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, partial = false,
        TopKPerKeyExec(k, keys, order, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Column-level API. */
object TopK {
  /** top-k rows per key, ordered by `order` within the key. Registers the
   * strategy on the session (idempotent). */
  def perKey(df: DataFrame, keyCols: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        TopKPerKeyStrategy +: spark.experimental.extraStrategies
    val sortOrders = order.map(c => GraftSqlBridge.expr(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    val node = TopKPerKeyNode(k, keyCols.map(c => GraftSqlBridge.expr(df(c))),
      sortOrders, df.queryExecution.analyzed)
    GraftSqlBridge.ofRows(spark, node)
  }
}
