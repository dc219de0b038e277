package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Production streaming state backend: at 100 TB-scale state (sessions
 * over hundreds of millions of users), the default in-heap
 * HDFS-backed store OOMs — RocksDB is the disk-spilling backend the
 * deployment would run. Pin that the session-window aggregation
 * produces identical results under both providers, so switching the
 * backend is a pure ops decision, never a semantics change.
 */
class StateBackendSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("session windows agree between default and RocksDB state stores") {
    val default = SparkEntry.queries("s_session")(spark, sf).collect().toSeq
    assert(default.nonEmpty)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = SparkEntry.queries("s_session")(spark, sf).collect().toSeq
      assert(rocks == default)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
