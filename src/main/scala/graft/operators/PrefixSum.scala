package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed prefix sums — the two-phase scan that replaces a global
 * (unpartitioned) running-sum window.
 *
 * `Window.orderBy(k)` with no partition spec funnels its whole input
 * through ONE task (Spark's `WindowExec: No Partition Defined` warning):
 * fine for a frame whose size is bounded by construction, a straggler —
 * and eventually a single-machine sort — for any frame that grows with
 * the data. The standard fix (optimization guide §2): range-partition by
 * the order key, compute per-partition partial sums, turn those into
 * per-partition offsets, then add a within-partition running sum.
 *
 * The offsets step here is a triangular broadcast join over the
 * per-partition totals (offset(p) = Σ totals of partitions < p). That
 * table has at most `spark.sql.shuffle.partitions` rows — CLUSTER-width,
 * not data-width — so the O(P²) pair fanout is bounded at any data
 * scale, and no unpartitioned window remains anywhere in the plan.
 *
 * Correctness: sums must be exact (integral) for the decomposition
 * offset + within-partition-prefix to be bit-identical to the flat
 * global cumsum; callers pass LONG columns. Partition ids come from
 * `spark_partition_id()` over the range exchange, whose row→partition
 * assignment is deterministic for a fixed input (boundaries are driver
 * computed once per execution with deterministic sampling seeds), and
 * any consistent assignment yields the same prefix sums.
 */
object PrefixSum {

  /** Add, for every `sumCols(i)`, a column `outCols(i)` holding the
   * EXCLUSIVE prefix sum (strictly-preceding rows) of that column over
   * the global `orderCol` ascending order. `orderCol` must be unique
   * per row (both call sites aggregate by it first); inclusive sums are
   * `outCols(i) + sumCols(i)`. */
  def exclusive(df: DataFrame, orderCol: String,
                sumCols: Seq[String], outCols: Seq[String]): DataFrame = {
    require(sumCols.length == outCols.length)
    val spark = df.sparkSession
    // pinned partition count (the session's shuffle width): AQE must not
    // coalesce the two consumers of the range exchange differently, or
    // spark_partition_id() would disagree between the totals branch and
    // the window branch
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pid = "__ps_pid"
    val ranged = df.repartitionByRange(n, col(orderCol))
      .withColumn(pid, spark_partition_id())
    // phase 1: per-partition totals (≤ n rows)
    val ptot = ranged.groupBy(col(pid))
      .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
      .toDF(pid +: sumCols.map(c => s"__pt_$c"): _*)
    // phase 2: offsets = totals of strictly-lower partitions. Triangular
    // broadcast join over ≤ n rows; left join keeps partition 0 (and any
    // partition with no lower non-empty one) at offset 0.
    val lower = ptot.toDF(("__lo_" + pid) +: sumCols.map(c => s"__lo_$c"): _*)
    val poff = ptot.join(broadcast(lower),
        col("__lo_" + pid) < col(pid), "left")
      .groupBy(col(pid))
      .agg(
        coalesce(sum(s"__lo_${sumCols.head}"), lit(0L))
          .as(s"__off_${sumCols.head}"),
        sumCols.tail.map(c =>
          coalesce(sum(s"__lo_$c"), lit(0L)).as(s"__off_$c")): _*)
    // phase 3: within-partition exclusive running sum + offset
    val w = Window.partitionBy(col(pid)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val joined = ranged.join(broadcast(poff), pid)
    sumCols.zip(outCols).foldLeft(joined) { case (d, (c, o)) =>
      d.withColumn(o,
        col(s"__off_$c") + coalesce(sum(col(c)).over(w), lit(0L)))
    }.drop(pid +: sumCols.map(c => s"__off_$c"): _*)
  }
}
