package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off scan-parallelism probe (r21): partition count and per-partition
 * row distribution for each sf0.1 table under the bench session's configs. */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (t <- Seq("lineitem", "orders", "events", "embeddings", "documents",
      "customer", "part")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      val parts = df.rdd.getNumPartitions
      val dist = df.rdd.mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
        .collect().filter(_._2 > 0)
      println(s"PROBE $t: partitions=$parts nonEmpty=${dist.length} " +
        s"rows=${dist.map(_._2.toLong).sum} dist=${dist.take(8).mkString(",")}")
    }
    spark.stop()
  }
}
