package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ZOrder

/**
 * Pins the z-order layout's reason to exist: per-FILE min/max spread
 * stays bounded in BOTH dimensions, where a single-column sort gives
 * the second dimension full-range stats in every file (no skipping).
 * Also pins zValue's bit-interleaving on known values.
 */
class ZOrderSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("zValue interleaves bits (known values)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 16).as("z"))
    // morton(3,5) = interleave(a=0b011, b=0b101) = 0b100111 = 39
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 2L, 39L, (1L << 32) - 1))
  }

  /** mean per-file normalized spread of `c` over the files of `path` */
  private def spread(path: String, c: String): Double = {
    val df = spark.read.parquet(path)
    val g = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    val (lo, hi) = (g.getDouble(0), g.getDouble(1))
    val per = df.groupBy(input_file_name().as("f"))
      .agg(((max(col(c)) - min(col(c))).cast("double") / (hi - lo)).as("s"))
      .agg(avg(col("s"))).head().getDouble(0)
    per
  }

  test("z-order bounds per-file spread in both dimensions") {
    val src = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_date(CAST(o_orderdate AS DATE))").as("o_day"))
    val zDir = Files.createTempDirectory("graft-zorder").toString
    val sDir = Files.createTempDirectory("graft-sorted").toString
    ZOrder.writeZOrdered(src, "o_custkey", "o_day", zDir, numFiles = 8)
    // the comparison layout: globally sorted on custkey alone
    src.repartitionByRange(8, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(sDir)

    // layout must not change the data
    assert(spark.read.parquet(zDir).count() == src.count())

    val zDay = spread(zDir, "o_day")
    val sDay = spread(sDir, "o_day")
    val zCust = spread(zDir, "o_custkey")
    // single-column sort leaves the date dimension near full range in
    // every file; the z-layout must bound both dimensions
    assert(sDay > 0.9, s"comparison layout unexpectedly clustered: $sDay")
    assert(zDay < 0.75 * sDay, s"z-order date spread $zDay !< 0.75 × $sDay")
    assert(zCust < 0.9, s"z-order custkey spread not bounded: $zCust")
  }

  test("normalization bounds come from catalog column stats when present") {
    val tbl = "graft_zstats_orders"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_date(CAST(o_orderdate AS DATE))").as("o_day"))
      .write.mode("overwrite").saveAsTable(tbl)
    try {
      // no ANALYZE yet → no column stats → fall back to the aggregate
      assert(ZOrder.statsMinMax(spark.table(tbl), "o_custkey").isEmpty)
      spark.sql(
        s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR COLUMNS o_custkey, o_day")
      // attributeStats propagate to the plan only under CBO estimation
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val t = spark.table(tbl)
        val truth = t.agg(
          min(col("o_custkey")).cast("double"),
          max(col("o_custkey")).cast("double")).head()
        assert(ZOrder.statsMinMax(t, "o_custkey")
          .contains((truth.getDouble(0), truth.getDouble(1))))
        // end to end through the stats path: identical bounds → layout
        // byte-identical to the aggregate-scan path
        val statsDir = Files.createTempDirectory("graft-zstats").toString
        ZOrder.writeZOrdered(t, "o_custkey", "o_day", statsDir, numFiles = 4)
        spark.conf.set("spark.sql.cbo.enabled", "false")
        val scanDir = Files.createTempDirectory("graft-zscan").toString
        ZOrder.writeZOrdered(t, "o_custkey", "o_day", scanDir, numFiles = 4)
        val a = spark.read.parquet(statsDir)
          .orderBy("o_orderkey").collect().toSeq
        val b = spark.read.parquet(scanDir)
          .orderBy("o_orderkey").collect().toSeq
        assert(a == b)
      } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("an empty input writes an empty layout, not an NPE") {
    // the min/max normalization aggregate returns null extrema on an
    // empty frame; the old getDouble crashed the write job (r19 review)
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-zempty").toString
    val empty = spark.range(0).selectExpr("id AS a", "id AS b")
    ZOrder.writeZOrdered(empty, "a", "b", dir, numFiles = 2)
    assert(spark.read.parquet(dir).count() == 0)
  }
}
