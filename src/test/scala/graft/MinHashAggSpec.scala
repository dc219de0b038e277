package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MinHashAgg

class MinHashAggSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("signature is order- and partitioning-invariant, k slots, all set") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val mh = MinHashAgg.minhash(16)
    val one = toks.repartition(1).groupBy("doc_id").agg(mh(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val many = toks.repartition(13).groupBy("doc_id").agg(mh(col("h")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(one.nonEmpty && one == many)
    assert(one.values.forall(s => s.length == 16 && s.forall(_ != Long.MaxValue)))
  }

  test("near-identical docs collide on most slots, unrelated docs do not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"), // one token differs
      (3L, "q r s t u v w x y z")).toDF("id", "text")
    val toks = docs.select(col("id"), explode(split(col("text"), " ")).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val sig = toks.groupBy("id").agg(MinHashAgg.minhash(32)(col("h")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sig(1L), sig(2L)) >= 20) // Jaccard 9/11 → most slots agree
    assert(agree(sig(1L), sig(3L)) <= 5)  // disjoint sets → few/no collisions
  }

  test("registerAll exposes the aggregators to pure SQL") {
    graft.functions.GraftFunctions.registerAll(spark)
    val df = spark.read.parquet(s"$sf/documents.parquet").limit(20)
    df.createOrReplaceTempView("gf_docs")
    val r = spark.sql(
      """SELECT doc_id,
        |  minhash32(xxhash64(tok)) AS sig,
        |  simhash32(md5(tok)) AS sh
        |FROM (SELECT doc_id, explode(array_distinct(split(text, ' '))) AS tok
        |      FROM gf_docs)
        |GROUP BY doc_id""".stripMargin).collect()
    assert(r.length == 20)
    assert(r.forall(_.getSeq[Long](1).length == 32))
  }
}
