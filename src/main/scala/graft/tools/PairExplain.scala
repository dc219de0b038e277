package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Print the physical plan of the two-phase verify's output over a
 * small DocGen corpus — confirms the phase-1 shuffle-hash hints apply
 * (a silent fall-back to sort-merge re-introduces the 47M-row wide
 * sort this path exists to avoid). */
object PairExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Shingles.register(spark)
    val docs = spark.read.format("graft.sources.DocGen")
      .option("rows", 2000L).option("partitions", 4).option("seed", 11L)
      .load().select("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sh", graft.functions.Shingles.of(col("toks"), 3))
      .select("doc_id", "sh")
    graft.queries.LlmOps.neardupPairsFast(docs, 0.5) { df =>
      df.explain("formatted")
    }
    spark.stop()
  }
}
