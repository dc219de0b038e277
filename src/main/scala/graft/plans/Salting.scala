package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Hot-group split for BLOCKED SELF-JOINS — the shared machinery behind
 * the kNN edge build's hot-bucket split (VERDICT r11 item 4) and
 * q_semdedup's hot-cluster split (VERDICT r12 item 1). A blocked
 * pairwise operator joins a frame to itself on a blocking key (LSH sign
 * bucket, kmeans cluster label), so one group's |G|² pair mass lands in
 * ONE shuffle task: a single dense group serializes the whole job
 * regardless of cluster width, and AQE's skew split cannot help — it
 * keys on pre-join partition BYTES and a few-MB hot partition that
 * EXPLODES in the join output looks healthy to it.
 *
 * The split: groups larger than `splitRows` subdivide the a-side by an
 * extra id hash into nsub = ceil(|G|/splitRows) sub-groups (capped at
 * `maxSub`); the b-side replicates to every sub-group, so each sub-task
 * probes the FULL parent group (the multiprobe side). Joining on
 * (key, sub) makes every in-group ordered pair (a, b) meet EXACTLY once
 * — in a's sub — so any downstream pair semantics (orientation filters
 * like `ai < bi`, top-k cuts keyed on a's id) are unchanged and the
 * result is row-identical to the unsplit join (KnnGraphIndexSpec and
 * SaltingSpec pin it). The quadratic mass spreads over nsub tasks of
 * ≤ ~splitRows a-rows each at linear replication cost (nsub·|G| extra
 * b-rows). Cold groups get nsub = 1 (sub ≡ 0) — the unsplit plan.
 *
 * Ceiling note (VERDICT r12 item 6): with maxSub = 64 the per-sub
 * a-side starts growing again past 64·splitRows rows in one group
 * (~131k at the kNN defaults). The next lever at that scale is a
 * second split level — recursive sub-split, or one more hash bit per
 * doubling — which changes only nsub's computation, not the join
 * shape; at gate and ScaleSmoke scales the cap is never approached.
 */
object Salting {

  /**
   * The two sides of a hot-group-split self-join over `df`, blocked on
   * `key` with row identity `id`. Both sides keep every original column
   * and gain `sub` (int); join them on (key, "sub"). `sizesIn`
   * optionally supplies per-group row counts as a (key, group_n) frame
   * when the caller has a cheaper source than re-aggregating `df` —
   * e.g. a cached narrow projection when `df`'s key column is COMPUTED
   * from a wide column that pruning cannot drop. The join against the
   * sizes frame is LEFT, with an absent group defaulting to nsub = 1:
   * a caller-supplied sizes frame that is stale or differently
   * filtered must degrade a group to the unsplit plan (still
   * row-identical output, just unprotected from skew), never silently
   * drop its rows from both sides — the whole contract here is
   * "row-identical to the unsplit join".
   */
  def saltedSelfSides(df: DataFrame, key: String, id: String,
                      splitRows: Long, maxSub: Int,
                      sizesIn: Option[DataFrame] = None)
      : (DataFrame, DataFrame) = {
    val sizes = sizesIn.getOrElse(
      df.groupBy(key).agg(count(lit(1)).as("group_n")))
    val sized = df.join(broadcast(sizes), Seq(key), "left")
      .withColumn("__nsub",
        least(lit(maxSub.toLong),
          greatest(lit(1L),
            ceil(coalesce(col("group_n"), lit(1L)) /
              lit(splitRows.toDouble))))
        .cast("int"))
    val a = sized
      .withColumn("sub", pmod(xxhash64(col(id)), col("__nsub")).cast("int"))
      .drop("group_n", "__nsub")
    val b = sized
      .withColumn("sub", explode(sequence(lit(0), col("__nsub") - 1)))
      .drop("group_n", "__nsub")
    (a, b)
  }
}
