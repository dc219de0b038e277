package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) data layout: interleave the bits of two sort
 * keys so that range-partitioning + within-partition sorting on the
 * single interleaved value keeps BOTH dimensions locally clustered.
 *
 * Why it matters at 100 TB: parquet scans prune row groups / files on
 * footer min/max stats, but a layout sorted on one column gives the
 * other column full-range stats in every file — filters on it prune
 * nothing. A z-ordered layout bounds the per-file spread of both
 * columns, so two-sided range filters skip most files (the technique
 * behind Delta/Iceberg OPTIMIZE ZORDER, built here from vanilla Spark
 * ops: an expression + repartitionByRange + sortWithinPartitions).
 *
 * ZOrderSpec measures the per-file min/max spread of both dimensions
 * against a single-column-sorted layout; q_zorder_layout gate-checks
 * result invariance through the laid-out copy.
 */
object ZOrder {

  /** Morton value of the low `bits` bits of two non-negative keys:
   * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Plain
   * shift/and/or Column arithmetic — whole-stage-codegen friendly, no
   * UDF. Keys are clamped into [0, 2^bits) so out-of-range inputs
   * degrade locality, never correctness. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val max = lit((1L << bits) - 1L)
    val am = least(greatest(a.cast("long"), lit(0L)), max)
    val bm = least(greatest(b.cast("long"), lit(0L)), max)
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` z-ordered on (`colA`, `colB`) into `numFiles` parquet
   * files: min-max normalize both keys to the full `bits` width (raw
   * interleaving lets the wider-range dimension's high bits dominate
   * the curve — the narrow dimension would never cluster), build the
   * Morton value, range-partition on it (sampled boundaries → balanced
   * files), sort within each partition, drop the helper column. One
   * shuffle plus one scalar min/max aggregate — the same cost class as
   * any global sort layout (at scale the min/max can come from table
   * stats instead). */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    outPath: String, numFiles: Int, bits: Int = 12): Unit = {
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    val scale = ((1L << bits) - 1).toDouble
    def norm(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else ((c.cast("double") - lit(lo)) * lit(scale / (hi - lo))).cast("long")
    df.withColumn("__z",
        zValue(norm(col(colA), r.getDouble(0), r.getDouble(1)),
          norm(col(colB), r.getDouble(2), r.getDouble(3)), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outPath)
  }
}
