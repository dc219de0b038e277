package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

class JoinsSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("salted join equals plain join (any salt assignment is correct)") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey"))
      .select("o_orderkey", "c_name").collect().toSet
    val salted = Joins.salted(o, c, "o_custkey", saltFactor = 4)
      .select("o_orderkey", "c_name").collect().toSet
    assert(plain.nonEmpty && salted == plain)
  }

  test("bucketed tables join without a shuffle") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey", "o_totalprice")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey AS o_orderkey", "l_quantity")
    Joins.writeBucketed(o, "b_orders", "o_orderkey", 8)
    Joins.writeBucketed(li, "b_lineitem", "o_orderkey", 8)
    // force the sort-merge path: at test scale Catalyst would broadcast,
    // which hides exactly the shuffle that bucketing removes at real scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Joins.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q_bucketed_join gate query: no shuffle on the join key") {
    // force SMJ so the bucket co-location (not a broadcast) carries the
    // join; the only Exchange allowed in the plan is the final group-by
    // on c_mktsegment — the join key must never be re-partitioned.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q_bucketed_join")(spark, sf)
      df.collect() // executedPlan below reflects the AQE final plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(custkey"),
        s"join key was shuffled despite bucketing:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
