package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions

/** FloatVecDot must be bit-identical to the HOF fold it replaced —
 * that equivalence is what keeps the DuckDB oracle matching. */
class VectorExpressionsSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  private lazy val emb = {
    VectorFunctions.register(spark)
    spark.read.parquet(s"$sf/embeddings.parquet")
  }

  test("vec_dot equals the zip_with/aggregate fold on every row") {
    val hof = expr(
      """aggregate(zip_with(embedding, embedding,
        |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
    val diff = emb
      .select(VectorFunctions.vecDot(col("embedding"), col("embedding")).as("k"),
        hof.as("h"))
      .filter(col("k") =!= col("h"))
      .count()
    assert(diff == 0)
  }

  test("vec_dot of orthogonal unit vectors") {
    val r = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |               array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS d""".stripMargin)
      .head.getDouble(0)
    assert(r == 0.0)
  }

  test("length mismatch and null element give null") {
    val r = spark.sql(
      """SELECT vec_dot(array(CAST(1.0 AS FLOAT)),
        |               array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS a,
        |       vec_dot(array(CAST(NULL AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS b""".stripMargin)
      .head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("non-float input is rejected at analysis") {
    VectorFunctions.register(spark)
    val ex = intercept[Exception] {
      spark.range(1).select(VectorFunctions.vecDot(col("id"), col("id"))).collect()
    }
    assert(ex.getMessage.contains("vec_dot expects"))
  }

  test("vec_cosine is bit-identical to the composed dot/norm form on every pair") {
    // self-join a small slice so both orders and distinct pairs are hit
    val a = emb.limit(40).select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val b = emb.limit(40).select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    val composed = VectorFunctions.vecDot(col("ea"), col("eb")) /
      (sqrt(VectorFunctions.vecDot(col("ea"), col("ea"))) *
        sqrt(VectorFunctions.vecDot(col("eb"), col("eb"))))
    val diff = a.crossJoin(b)
      .select(VectorFunctions.vecCosine(col("ea"), col("eb")).as("k"), composed.as("c"))
      .filter(col("k") =!= col("c"))
      .count()
    assert(diff == 0)
  }

  test("vec_cosine null semantics match vec_dot composition") {
    val r = spark.sql(
      """SELECT vec_cosine(array(CAST(1.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c,
        |       vec_cosine(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS cn""".stripMargin)
      .head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
