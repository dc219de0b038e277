package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolation harness for the substr_hash_windows kernel vs the
 * transform-HOF formulation: same synthetic corpus, alternating order,
 * sum-of-hashes sink (cheapest possible consumer). Not part of the
 * gate — diagnostic only. */
object SubstrBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 60000L
    val chars = if (args.length > 1) args(1).toInt else 300
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.SubstrHash.register(spark)

    // ~`chars`-char pseudo-text per row, ASCII
    val docs = spark.range(rows).select(col("id"),
        expr(s"""concat_ws(' ', transform(sequence(0, ${chars / 6}),
                |  i -> substring(md5(concat(CAST(id AS STRING), '_', CAST(i AS STRING))), 1, 5)))""".stripMargin)
          .as("text"))
      .filter(length(col("text")) >= 30) // both arms assume >= 1 window
      .cache()
    val n = docs.count()
    if (n == 0) {
      println(s"[sb] no docs of >= 30 chars at chars=$chars — nothing to compare")
      spark.stop(); return
    }
    println(s"[sb] rows=$n avg_len=" +
      docs.agg(avg(length(col("text")))).head().getDouble(0))

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[sb] $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (sum=$r)")
    }
    def kernel(): Long = docs.select(explode(
        graft.functions.SubstrHash.windows(col("text"), 30)).as("h"))
      .agg(expr("coalesce(bit_xor(h), 0L)")).head().getLong(0)
    def hof(): Long = docs.select(explode(expr(
        """transform(sequence(1, length(text) - 29),
          |  i -> xxhash64(substring(text, i, 30)))""".stripMargin)).as("h"))
      .agg(expr("coalesce(bit_xor(h), 0L)")).head().getLong(0)

    time("kernel (1st)")(kernel())
    time("hof    (1st)")(hof())
    time("kernel (2nd)")(kernel())
    time("hof    (2nd)")(hof())
    spark.stop()
  }
}
