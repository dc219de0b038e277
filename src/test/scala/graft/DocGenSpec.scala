package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 corpus generator: deterministic under re-partitioning,
 * parallel by id range, and column-pruned at the reader. */
class DocGenSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private def gen(rows: Long, parts: Int, seed: Long = 42L) =
    spark.read.format("graft.sources.DocGen")
      .option("rows", rows).option("partitions", parts).option("seed", seed)
      .load()

  test("row count and schema") {
    val df = gen(1000, 8)
    assert(df.count() == 1000)
    assert(df.schema.fieldNames.toSeq ==
      Seq("doc_id", "lang", "source", "text", "n_chars"))
  }

  test("identical content at any partition count (splittable determinism)") {
    val a = gen(500, 3).orderBy("doc_id").collect().map(_.toSeq)
    val b = gen(500, 17).orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("seed changes content") {
    val a = gen(100, 4, seed = 1).select("text").collect().map(_.getString(0))
    val b = gen(100, 4, seed = 2).select("text").collect().map(_.getString(0))
    assert(a.toSeq != b.toSeq)
  }

  test("column pruning reaches the reader (count(*) plans a text-free scan)") {
    val df = gen(100, 4).groupBy("lang").count()
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSet == Set("lang"),
      scans.head.scan.readSchema().fieldNames.mkString(","))
  }

  test("generated text feeds the real operators (tokens in vocab, 20..100)") {
    val stats = gen(200, 4)
      .select(size(split(col("text"), " ")).as("n"))
      .agg(min("n"), max("n")).head()
    assert(stats.getInt(0) >= 20 && stats.getInt(1) <= 100)
  }

  test("parallelism: one task per id range") {
    assert(gen(1000, 8).rdd.getNumPartitions == 8)
  }

  test("micro-batch streaming: same corpus arrives in rowsPerBatch slices") {
    val qn = "docgen_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format("graft.sources.DocGen")
      .option("rows", 250).option("partitions", 4)
      .option("seed", 42).option("rowsPerBatch", 100)
      .load()
      .groupBy("lang").count()
      .writeStream.outputMode("complete").format("memory").queryName(qn).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(qn).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = gen(250, 4).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}
