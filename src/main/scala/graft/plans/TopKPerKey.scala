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
 * Physical per-key top-k in two flavors:
 *
 * `partial = true` — a SORT-FREE map-side prune on whatever
 * partitioning and ordering the child has: a hash map of per-key
 * bounded heaps (≤ k rows each, the heap ordered so its head is the
 * WORST kept row). The round-13 edge-build profile motivated this: the
 * old partial required the child sorted by (keys ++ order), so Spark
 * sorted the FULL pair-cardinality stream before the prune — 44 s of a
 * 65 s kNN edge build at 382M pairs was that sort; a row rejected by a
 * full heap costs one comparison and never allocates. Memory stays
 * bounded WITHOUT spill machinery because a partial top-k is a PRUNE —
 * any superset of the true per-key top-k is correct, the final pass
 * re-prunes — so when the buffered-row budget trips, the map flushes
 * its contents downstream and restarts empty (a key split across
 * flushes just emits ≤ k rows per flush). Declares no output ordering.
 *
 * `partial = false` — the final pass after the key exchange: requires
 * clustering by key AND the (keys ++ order) sort — by then the stream
 * is partial-pruned to ≤ k·keys rows, so the sort is graph-sized — and
 * emits the first k rows per key group, preserving the sorted output
 * (downstream windows reuse it via outputOrdering).
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
    if (partial) Seq(Nil)
    else Seq(keys.map(SortOrder(_, Ascending)) ++ order)

  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else requiredChildOrdering.head

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // localize everything the task needs: closing over `this` would drag
    // the child SparkPlan into the task closure (not serializable)
    val kLocal = k
    val keysLocal = keys
    val orderLocal = order
    val childOutput = child.output
    val keyTypes = keys.map(_.dataType)
    if (partial) GraftSqlBridge.mapPartitionsInternal(child.execute()) { iter =>
      if (kLocal <= 0) Iterator.empty
      else {
        // one volatile read per TASK, not per row (also anchors the
        // spec's knob write visibility at task start)
        val budget = TopKPerKeyExec.PARTIAL_ROW_BUDGET
        val keyProj = UnsafeProjection.create(keysLocal, childOutput)
        val ord = org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(orderLocal, childOutput)
        // head = the kept row that sorts LAST (the first to evict)
        val worstFirst = ord.reverse
        val heaps =
          new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        var buffered = 0L
        def drain(): Iterator[InternalRow] = {
          val out = new scala.collection.mutable.ArrayBuffer[InternalRow](
            math.min(buffered, Int.MaxValue.toLong).toInt)
          heaps.values.forEach { pq =>
            val it = pq.iterator(); while (it.hasNext) out += it.next()
          }
          heaps.clear(); buffered = 0L
          out.iterator
        }
        iter.flatMap { row =>
          val key = keyProj(row)
          var pq = heaps.get(key)
          if (pq == null) {
            pq = new java.util.PriorityQueue[InternalRow](
              math.max(1, math.min(kLocal, 16)), worstFirst)
            heaps.put(key.copy(), pq)
          }
          if (pq.size < kLocal) {
            pq.offer(row.copy())
            buffered += 1
            // ties at the boundary keep the first-buffered row (compare
            // must be strictly <) — same unspecified-choice contract as
            // the sorted scan, and immaterial to every caller (their
            // orderings are total per key)
            if (buffered > budget) drain()
            else Iterator.empty
          } else if (ord.compare(row, pq.peek()) < 0) {
            pq.poll(); pq.offer(row.copy())
            Iterator.empty
          } else Iterator.empty
        } ++ drain()
      }
    } else GraftSqlBridge.mapPartitionsInternal(child.execute()) { iter =>
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

object TopKPerKeyExec {
  /** Partial-pass buffered-row cap before a flush-and-restart: bounds
   * per-task memory to ~budget·(row + map/heap overhead) ≈ 100 MB at
   * typical pruned-row widths, with no spill machinery — flushing is
   * CORRECT (the final pass re-prunes), it only weakens the prune for
   * pathological key cardinalities. Every gate caller sits orders of
   * magnitude under it (the kNN edge build buffers ≤ splitRows·k ≈ 16k
   * rows per task). A mutable test knob ONLY so TopKPerKeySpec can
   * force the flush path at spec scale (local[*] shares the JVM, so
   * the task closure reads the updated value); never reassigned
   * outside that spec. @volatile: the spec writes from the driver
   * thread and task threads read — without it the JMM lets tasks see
   * the stale default and the flush test silently exercises the
   * normal path. */
  @volatile private[graft] var PARTIAL_ROW_BUDGET = 512L * 1024
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
   * strategy on the session (idempotent).
   *
   * ==Ordering contract==
   * `order` MUST be a total ordering of the rows within each key (no two
   * rows of a key may compare equal). Boundary ties are broken by an
   * unspecified, plan-dependent choice — the sort-free partial heap keeps
   * the first-buffered row, the sorted final pass keeps the first in scan
   * order — so a tie-prone ordering makes the RESULT nondeterministic
   * across plans and partition layouts, not merely the row order. Callers
   * with a non-unique primary sort must append a unique tiebreaker column
   * (every in-repo caller orders by a distance/score plus a unique id).
   * This is not mechanically checkable without a per-key uniqueness pass
   * over the data, so it is a documented contract, not a runtime check. */
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
