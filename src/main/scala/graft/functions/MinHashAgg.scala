package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Single-pass MinHash signature aggregator (the custom aggregate flagged
 * in SURVEY.md §4): folds a stream of 64-bit shingle hashes into a
 * k-slot signature in ONE aggregation state, instead of k independent
 * `min(...)` aggregate columns.
 *
 * The k permutations are derived per input as xxhash64-style mixes of
 * the already-hashed shingle with the permutation index as seed — the
 * same family the expression-based formulation uses, so band collision
 * statistics are identical.
 *
 * Buffer is a plain Array[Long]; merge is element-wise min, so the
 * aggregate is map-side combinable and shuffles exactly k longs per
 * document regardless of document length — the property that matters at
 * corpus scale.
 */
class MinHashAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingleHash: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(shingleHash, i.toLong)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Column function: `minhash(k)(hashCol)` → array<long> signature. */
  def minhash(k: Int): Column => Column = {
    val fn = udaf(new MinHashAgg(k))
    (c: Column) => fn(c)
  }
}
