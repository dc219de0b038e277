package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Operational read surfaces a 100 TB lake hits weekly:
 *  - schema evolution: partitions written months apart differ by added
 *    columns; mergeSchema unions them and back-fills nulls;
 *  - corrupt inputs: a truncated/garbage file in a table directory
 *    must be skippable (ignoreCorruptFiles) instead of failing the
 *    whole job.
 */
class OperationalReadSpec extends AnyFunSuite {
  import SparkTestBase.spark

  test("mergeSchema unions evolved schemas and null-fills old partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/p=old")
    Seq((2L, "b", 10.5)).toDF("id", "v1", "v2_added").write.parquet(s"$dir/p=new")
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.schema.fieldNames.toSet == Set("id", "v1", "v2_added", "p"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("v2_added")),
      "old partition must null-fill the added column")
    assert(rows(1).getDouble(rows(1).fieldIndex("v2_added")) == 10.5)
  }

  test("ignoreCorruptFiles skips garbage files instead of failing the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt").toString
    Seq((1L, "ok"), (2L, "fine")).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-corrupt.parquet"), "this is not parquet")
    // without the flag the scan must fail loudly (no silent data loss)
    val strict = intercept[Throwable](
      spark.read.schema("id LONG, v STRING").parquet(dir).count())
    assert(strict != null)
    val prev = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      val n = spark.read.schema("id LONG, v STRING").parquet(dir).count()
      assert(n == 2, s"expected the 2 good rows, got $n")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }
}
