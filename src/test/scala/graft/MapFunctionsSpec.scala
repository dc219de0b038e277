package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Map-typed column surface (SURVEY.md §2.B "array / map fns" row):
 * construction, key/value extraction, transformation. Spec-level rather
 * than oracle-level because DuckDB's MAP extraction semantics differ
 * across versions. */
class MapFunctionsSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("map construction, extraction, keys/values, transform") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("meta", map(lit("lang"), col("lang"), lit("source"), col("source")))
    val row = d.select(
        expr("element_at(meta, 'lang')").as("l"),
        map_keys(col("meta")).as("ks"),
        map_values(col("meta")).as("vs"),
        expr("map_entries(meta)[0].key").as("k0"),
        expr("transform_values(meta, (k, v) -> upper(v))['lang']").as("ul"),
        col("lang"))
      .head()
    assert(row.getAs[String]("l") == row.getAs[String]("lang"))
    assert(row.getSeq[String](1) == Seq("lang", "source"))
    assert(row.getAs[String]("k0") == "lang")
    assert(row.getAs[String]("ul") == row.getAs[String]("lang").toUpperCase)
  }

  test("map round-trips through parquet (CH Map DDL twin)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-map")
    try {
      spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("n_chars"),
          map(lit("n_chars"), col("n_chars")).as("stats"))
        .write.mode("overwrite").parquet(dir.toString)
      val back = spark.read.parquet(dir.toString)
      // values must survive the round trip, not just the row count
      val broken = back
        .filter(not(expr("element_at(stats, 'n_chars')") <=> col("n_chars")))
        .count()
      assert(broken == 0 && back.count() > 0)
      val ddl = graft.chschema.DdlRenderer.render(
        org.apache.spark.sql.types.StructType(
          Seq(back.schema("doc_id"), back.schema("stats"))), "m", "doc_id")
      assert(ddl.contains("stats Map (\n        String\n        , Int64\n    )"))
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }
}
