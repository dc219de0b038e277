package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Join patterns for hostile key distributions at scale. The reference has
 * no join layer (SURVEY.md §2.B); these are the two standard remedies a
 * 100 TB deployment needs beyond Catalyst's defaults:
 *
 *  - [[Joins.salted]]: skew-salting for a hot key joining a small-ish
 *    right side — the left's hot keys are spread over `saltFactor`
 *    sub-keys and the right side is replicated `saltFactor` times, so no
 *    single reducer owns a whole hot key. AQE's skew handling covers
 *    sort-merge joins; salting is the explicit fix when AQE can't help
 *    (e.g. aggregation-after-join keyed on the hot key).
 *
 *  - [[Joins.writeBucketed]] / co-located reads: pre-bucketing both fact
 *    tables on the join key makes every subsequent join/aggregation on
 *    that key shuffle-free — the classic amortization when one key joins
 *    many times a day.
 */
object Joins {

  /** Equi-join `left.key = right.key` with the left side salted across
   * `saltFactor` sub-keys. Result equals the plain inner join (verified
   * by spec + oracle); the plan differs: left gets a random-free,
   * DETERMINISTIC salt from hashing its whole row key, the right is
   * exploded once per salt value. */
  def salted(left: DataFrame, right: DataFrame, key: String,
             saltFactor: Int = 8): DataFrame = {
    // deterministic salt: stable across retries (a random salt would
    // break task re-execution under failure)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltFactor)))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit(_)): _*)))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a DataFrame as a bucketed, sorted managed table; subsequent
   * joins between tables bucketed on the same key with the same bucket
   * count run without a shuffle (spec asserts the Exchange-free plan). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a previous JVM may have left the managed location behind after the
    // in-memory catalog forgot the table — clear it or CTAS refuses.
    // Ask the catalog for the would-be location (handles case folding
    // and non-default databases) instead of guessing $warehouse/$table.
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Co-located join of two previously-bucketed tables. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
