package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{TopK, TopKPerKeyExec}

class TopKPerKeySpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  test("TopK.perKey equals the window row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    val custom = TopK.perKey(orders, Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(_.toSeq).toSet
    assert(custom.nonEmpty && custom == windowed)
  }

  test("plan has partial + final TopKPerKeyExec with an exchange between") {
    val df = TopK.perKey(orders, Seq("o_custkey"), Seq(col("o_totalprice").desc), 2)
    df.count() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val execs = plan.collect { case t: TopKPerKeyExec => t }
    assert(execs.map(_.partial).sorted == Seq(false, true),
      s"expected partial+final, got:\n$plan")
    assert(plan.toString.contains("Exchange hashpartitioning"),
      s"expected key exchange between passes:\n$plan")
  }

  test("partial-pass flush path (budget trip) preserves the top-k result") {
    // the heap-based partial flushes-and-restarts when its buffered-row
    // budget trips — a key split across flushes emits up to k rows per
    // flush and the final pass re-prunes. Force the path at spec scale
    // with a tiny budget and pin equality against the window oracle.
    import org.apache.spark.sql.expressions.Window
    val saved = graft.plans.TopKPerKeyExec.PARTIAL_ROW_BUDGET
    graft.plans.TopKPerKeyExec.PARTIAL_ROW_BUDGET = 7L
    try {
      val custom = TopK.perKey(orders, Seq("o_custkey"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .collect().map(_.toSeq).toSet
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val windowed = orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .collect().map(_.toSeq).toSet
      assert(custom.nonEmpty && custom == windowed,
        "flush-path top-k diverged from the window oracle")
    } finally graft.plans.TopKPerKeyExec.PARTIAL_ROW_BUDGET = saved
  }

  test("k larger than any group passes everything; k=0 passes nothing") {
    val n = orders.count()
    assert(TopK.perKey(orders, Seq("o_custkey"),
      Seq(col("o_orderkey").asc), Int.MaxValue).count() == n)
    assert(TopK.perKey(orders, Seq("o_custkey"),
      Seq(col("o_orderkey").asc), 0).count() == 0)
  }
}
