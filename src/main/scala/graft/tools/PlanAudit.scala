package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_scan_filter", "q_agg_pricing", "q_join_5way")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"##### $name")
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case f: FileSourceScanExec =>
            val file = f.relation.location.inputFiles.headOption.getOrElse("?")
              .split("/").last
            println(s"  SCAN $file cols=${f.requiredSchema.fieldNames.mkString(",")}")
            println(s"       pushed=${f.metadata.getOrElse("PushedFilters", "?")}")
          case _ =>
        }
        p.children.foreach(walk)
        p.subqueries.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
    }
    spark.stop()
  }
}
