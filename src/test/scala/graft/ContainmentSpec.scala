package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the EXACTNESS claim of q_containment's PPJoin prefix filter: the
 * filtered result must equal brute-force all-pairs containment — same
 * pairs, same scores — on the real sf0.001 corpus (where brute force is
 * affordable in-JVM). The DuckDB oracle already pins this at sf0.01;
 * this spec makes the no-recall-loss property a unit-level invariant
 * that fails locally, before the gate, if the prefix-length bound or
 * the global probe order ever drifts.
 */
class ContainmentSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("prefix-filtered containment equals brute force on sf0.001") {
    val got = SparkEntry.queries("q_containment")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // brute force: all doc pairs, exact shingle containment
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sh", expr(graft.queries.LlmOps.shingleExpr))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"))
    val brute = docs.select(col("doc_id").as("a_id"), col("sh").as("sa"))
      .crossJoin(docs.select(col("doc_id").as("b_id"), col("sh").as("sb")))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("containment",
        size(array_intersect(col("sa"), col("sb"))).cast("double")
          / size(col("sa")))
      .filter(col("containment") >= 0.8)
      .select(col("a_id"), col("b_id"), round(col("containment"), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(got == brute,
      s"prefix filter lost/invented pairs: missing=${brute -- got}, " +
        s"extra=${got -- brute}")
    assert(got.nonEmpty, "vacuous: no containment pairs in the corpus")
  }

  test("a planted strict-subset doc is found at containment 1.0") {
    import spark.implicits._
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val small = (1 to 12).map(i => s"w$i").mkString(" ")  // strict prefix
    val dir = java.nio.file.Files.createTempDirectory("contain").toString
    Seq((1L, big), (2L, small), (3L, "completely different text entirely"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_containment")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((2L, 1L, 1.0)), rows.mkString(","))
  }
}
