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
    // functionExists guards keep repeat registration silent (see
    // VectorFunctions.register doc)
    def absent(name: String): Boolean =
      !spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name))
    if (absent("minhash32"))
      spark.udf.register("minhash32", udaf(new MinHashAgg(32)))
    if (absent("simhash32"))
      spark.udf.register("simhash32", udaf(new SimHashAgg))
  }
}
