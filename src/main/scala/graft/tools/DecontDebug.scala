package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage timing for q_decontaminate (kept with StarDebug as a
 * diagnosis harness; not part of the engine surface). */
object DecontDebug {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shingleExpr =
      """array_distinct(CASE WHEN size(toks) < 3 THEN array()
        |ELSE transform(sequence(0, size(toks) - 3),
        |               i -> concat_ws(' ', slice(toks, i + 1, 3))) END)""".stripMargin
    def shingles(pred: org.apache.spark.sql.Column) =
      spark.read.parquet(s"$dir/documents.parquet").filter(pred)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("sh", expr(shingleExpr))
        .select(col("doc_id"), explode(col("sh")).as("g"))
    def time(label: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[decont] $label rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }
    }
    def base = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 97 =!= 0)
      .withColumn("toks", split(col("text"), " "))
    time("shingle array only") {
      base.withColumn("sh", expr(shingleExpr))
        .agg(sum(size(col("sh")))).head().getLong(0)
    }
    time("explode, no distinct") {
      base.withColumn("sh", expr(shingleExpr.replace("array_distinct(", "(")))
        .select(explode(col("sh")).as("g"))
        .select(xxhash64(col("g")).as("h")).count()
    }
    time("hash inside array, then explode") {
      base.withColumn("sh", expr(shingleExpr))
        .select(explode(graft.functions.HashArray.arrayHash(col("sh"))).as("h"))
        .count()
    }
    time("trainG count") {
      shingles(col("doc_id") % 97 =!= 0)
        .select(xxhash64(col("g")).as("h")).count()
    }
    time("evalG count") {
      shingles(col("doc_id") % 97 === 0)
        .select(xxhash64(col("g")).as("h")).count()
    }
    time("join+agg") {
      val ev = shingles(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("eval_id"), xxhash64(col("g")).as("h"))
      val tr = shingles(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), xxhash64(col("g")).as("h"))
      tr.join(broadcast(ev), "h").groupBy("doc_id")
        .agg(countDistinct(col("h")).as("n_shared"),
          countDistinct(col("eval_id")).as("n_eval_docs"))
        .count()
    }
    spark.stop()
  }
}
