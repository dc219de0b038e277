package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-document microbench for the Gopher repetition rule: the
 * O(distinct × n) lambda form vs the token_max_run sorted-run kernel.
 *
 * Documents are synthesized at doubling token counts from a large
 * vocabulary (distinct ≈ n, the lambda's worst case — real prose has
 * smaller vocabularies but 100k-token documents, which lands in the
 * same regime). Work per size is held ~constant for the KERNEL column
 * (docs × n log n); the lambda column's wall then exposes the knee
 * directly. The lambda form is skipped above `hofCap` tokens — at 64k
 * tokens it is ~4×10⁹ interpreted comparisons per document.
 *
 * runMain graft.tools.TokenRunBench [hofCap]
 */
object TokenRunBench {
  def main(args: Array[String]): Unit = {
    val hofCap = if (args.length > 0) args(0).toInt else 16000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.TokenMaxRun.register(spark)

    val lambdaForm =
      "array_max(transform(array_distinct(toks), t -> size(filter(toks, x -> x = t))))"

    for (n <- Seq(1000, 4000, 16000, 64000)) {
      // ~constant corpus mass: 4M tokens per size bucket
      val nDocs = math.max(4, 4000000 / n)
      val docs = spark.range(nDocs)
        .withColumn("toks", expr(
          s"transform(sequence(1, $n), i -> substring(md5(concat(id, '-', i)), 1, 6))"))
        .cache()
      docs.count() // materialize generation outside the timed region
      def time(label: String, col: org.apache.spark.sql.Column): Unit = {
        val t0 = System.nanoTime()
        val s = docs.select(col.cast("long").as("m")).agg(sum("m")).head().getLong(0)
        println(f"[token-run] n=$n%6d docs=$nDocs%5d $label%-7s " +
          f"${(System.nanoTime() - t0) / 1e9}%8.2f s (sum=$s)")
      }
      time("kernel", graft.functions.TokenMaxRun.maxRunCol(col("toks")))
      if (n <= hofCap) time("lambda", expr(lambdaForm))
      else println(f"[token-run] n=$n%6d docs=$nDocs%5d lambda   skipped " +
        f"(~${n.toLong * n / 1000000000.0}%.1f G comparisons/doc)")
      docs.unpersist()
    }
    spark.stop()
  }
}
