package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udaf

/**
 * One-call SQL surface for every custom graft function, so a pure-SQL
 * user gets the whole kit:
 *
 *   GraftFunctions.registerAll(spark)
 *   spark.sql("SELECT minhash32(xxhash64(tok)) FROM ... GROUP BY doc_id")
 *
 * The scalar kernels (vec_dot, vec_cosine) are also injectable
 * cluster-wide via [[graft.GraftExtensions]]; the aggregators ride the
 * session-level udaf registry (SparkSessionExtensions has no UDAF
 * injection point).
 */
object GraftFunctions {

  /** Is `name` absent from the session's FunctionRegistry? The ONE
   * probe every register() guard shares (r18 review backlog: nine
   * hand-rolled copies of this check had accreted across the function
   * modules). Guarding at all matters because re-running
   * createOrReplace per query invocation spammed every Bench/Verify
   * log with SimpleFunctionRegistry "replaced a previously registered
   * function" warnings that buried real ones; guarding per NAME
   * matters because a shared guard on one name silently skips its
   * siblings in a session that already carries the first (ADVICE r13
   * on HashArray). */
  private[graft] def absent(spark: SparkSession, name: String): Boolean =
    !spark.sessionState.functionRegistry.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name))

  /** Register `name` → `builder` as a session temp function iff
   * absent — the shared body behind every module's register(). */
  private[graft] def ensureTemp(spark: SparkSession, name: String)(
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
    if (absent(spark, name))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")

  def registerAll(spark: SparkSession): Unit = {
    // every module with a register(spark): the doc's "whole kit"
    // promise was false for six of them until the r18 review
    VectorFunctions.register(spark)
    MinHashSig.register(spark)
    SubstrHash.register(spark)
    Shingles.register(spark)
    HashArray.register(spark)
    BigramHashes.register(spark)
    TokenMaxRun.register(spark)
    SortedIntersect.register(spark)
    BloomFunctions.register(spark)
    // the udaf registry has no ensureTemp shape; same absent guard
    if (absent(spark, "minhash32"))
      spark.udf.register("minhash32", udaf(new MinHashAgg(32)))
    if (absent(spark, "simhash32"))
      spark.udf.register("simhash32", udaf(new SimHashAgg))
  }
}
