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

  /** Min/max of `colName` from the plan's COLUMN STATISTICS, if the
   * optimizer can provide them (catalog stats from `ANALYZE TABLE …
   * COMPUTE STATISTICS FOR COLUMNS`, propagated when CBO is enabled) —
   * the zero-scan path for the layout bounds at 100 TB, where the
   * min/max aggregate is itself a full-column pass over the table
   * being re-laid-out. Returns None (→ caller falls back to the
   * aggregate) when stats are absent, partial, or non-numeric. */
  private[graft] def statsMinMax(df: DataFrame,
                                 colName: String): Option[(Double, Double)] = {
    def num(v: Any): Option[Double] = v match {
      case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
      case n: java.lang.Number => Some(n.doubleValue())
      case _ => None
    }
    val plan = df.queryExecution.optimizedPlan
    for {
      attr <- plan.output.find(_.name == colName)
      cs <- plan.stats.attributeStats.get(attr)
      lo <- cs.min.flatMap(num)
      hi <- cs.max.flatMap(num)
    } yield (lo, hi)
  }

  /** Write `df` z-ordered on (`colA`, `colB`) into `numFiles` parquet
   * files: min-max normalize both keys to the full `bits` width (raw
   * interleaving lets the wider-range dimension's high bits dominate
   * the curve — the narrow dimension would never cluster), build the
   * Morton value, range-partition on it (sampled boundaries → balanced
   * files), sort within each partition, drop the helper column. One
   * shuffle plus the normalization bounds: catalog column stats when
   * the optimizer has them ([[statsMinMax]] — zero extra scan), else
   * one scalar min/max aggregate. A stats-derived range can only be
   * equal to or wider than the true range (stats go stale toward
   * wider data, never narrower values inside the old range — and even
   * a narrower-than-true range only costs locality: zValue clamps). */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    outPath: String, numFiles: Int, bits: Int = 12): Unit = {
    val bounds = for {
      (alo, ahi) <- statsMinMax(df, colA)
      (blo, bhi) <- statsMinMax(df, colB)
    } yield (alo, ahi, blo, bhi)
    val (aLo, aHi, bLo, bHi) = bounds.getOrElse {
      val r = df.agg(
        min(col(colA)).cast("double"), max(col(colA)).cast("double"),
        min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
      // an empty (or all-null-key) input has null extrema: degenerate
      // bounds write the empty/degenerate layout instead of NPE-ing the
      // job out of getDouble (r19 review)
      if (r.isNullAt(0) || r.isNullAt(2)) (0.0, 0.0, 0.0, 0.0)
      else (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    val scale = ((1L << bits) - 1).toDouble
    def norm(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else ((c.cast("double") - lit(lo)) * lit(scale / (hi - lo))).cast("long")
    df.withColumn("__z",
        zValue(norm(col(colA), aLo, aHi), norm(col(colB), bLo, bHi), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outPath)
  }
}
