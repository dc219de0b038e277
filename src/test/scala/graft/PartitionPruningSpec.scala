package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Partition-layout sink + partition pruning: at 100 TB, hive-style
 * partitioning on a low-cardinality column means a filtered read lists
 * and scans only the matching directories. The spec pins the plan-level
 * guarantee (PartitionFilters present, only matching files read).
 */
class PartitionPruningSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("partitionBy write + filtered read prunes to one partition") {
    val dir = Files.createTempDirectory("graft-part").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("lang") === "en")
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty,
      "lang filter should be a partition filter, not a data filter")
    val files = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files.map(_.getPath.toString))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"expected only lang=en files, got: ${files.take(3)}")

    // and the data round-trips
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang") === "en").count()
    assert(q.count() == expected && expected > 0)
  }
}
