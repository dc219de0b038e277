package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The UDF row of SURVEY.md §2.B: the engine's policy is built-in
 * functions (codegen) over closures, so UDFs appear only here — one
 * registered Scala UDF proven equivalent to its native formulation, as
 * the escape hatch of last resort. */
class UdfSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("scala UDF registers and matches the native equivalent") {
    val vowels = udf((s: String) => s.count("aeiou".contains(_)))
    spark.udf.register("vowel_count", vowels)
    val d = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val viaUdf = d.selectExpr("doc_id", "vowel_count(text) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaNative = d.select(col("doc_id"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[aeiou]", ""))).cast("int").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaUdf.nonEmpty && viaUdf == viaNative)
  }
}
