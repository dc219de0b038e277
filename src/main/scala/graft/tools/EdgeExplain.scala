package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Print the physical plan of the kNN edge build over a small synthetic
 * embedding frame — the thing to check is the Sort feeding the partial
 * TopKPerKeyExec: if it still carries the two 64-float embedding arrays
 * (ea/eb survive past the cosine projection), the pair-cardinality sort
 * pays ~1 KB/row instead of ~36 B/row. */
object EdgeExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val e = spark.range(4096).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), i -> CAST(sin(id * 131 + i) AS FLOAT))")
        .as("embedding"))
      .withColumn("bucket",
        graft.sources.KnnGraphIndex.signBucket("embedding"))
    graft.sources.KnnGraphIndex.edgesFor(e, 2048L).explain("formatted")
    spark.stop()
  }
}
