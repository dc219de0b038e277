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
 * extra id hash into na = ceil(|G|/splitRows) sub-groups (capped at
 * `maxSub`); the b-side replicates to every sub-group, so each sub-task
 * probes the FULL parent group (the multiprobe side). Joining on
 * (key, sub) makes every in-group ordered pair (a, b) meet EXACTLY once
 * — in the one sub where a's chunk meets b's chunk — so any downstream
 * pair semantics (orientation filters like `ai < bi`, top-k cuts keyed
 * on a's id) are unchanged and the result is row-identical to the
 * unsplit join (KnnGraphIndexSpec and SaltingSpec pin it). The
 * quadratic mass spreads over tasks of ≤ ~splitRows a-rows each at
 * linear replication cost. Cold groups get one sub (sub ≡ 0) — the
 * unsplit plan.
 *
 * Past the old maxSub CEILING (VERDICT r12 item 6 — with maxSub = 64
 * the per-sub a-side started growing again past 64·splitRows rows in
 * one group, ~131k at the kNN defaults) the split now goes
 * TWO-DIMENSIONAL (round 13): when the needed chunk count N =
 * ceil(|G|/splitRows) exceeds maxSub, the b-side also chunks by a
 * second id hash into nb = ceil(N/maxSub) chunks (its own cap maxSub),
 * and sub becomes the GRID cell (a-chunk, b-chunk) — a-rows replicate
 * across the nb b-chunks, b-rows across the na a-chunks, and the
 * ordered pair (a, b) still meets exactly once, in cell (chunk(a),
 * chunk(b)). Per-task pair mass stays ≤ ~splitRows·|G|/ (na·nb/N)
 * ≈ splitRows·|G|/nb — the one-more-hash-bit-per-doubling lever the
 * r12 ceiling note named, now implemented; the knee moves from
 * maxSub·splitRows to maxSub²·splitRows (~8.4M rows/group at the kNN
 * defaults). Below the old knee nb = 1 and the shape — including hash
 * values and replication counts — is bit-identical to the
 * one-dimensional split, so no plan below the ceiling changes.
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
    // withColumn silently REPLACES a same-named caller column, so a
    // frame already carrying one of the helper's working names would
    // produce wrong splits with no error — fail loudly instead.
    val reserved =
      Set("sub", "group_n", "__nchunks", "__na", "__nb", "__sa", "__sb")
    val collisions = df.columns.filter(reserved.contains).toSeq
    require(collisions.isEmpty,
      s"saltedSelfSides: input columns ${collisions.mkString(", ")} " +
        "collide with the helper's reserved names " +
        s"(${reserved.toSeq.sorted.mkString(", ")}); rename them first")
    val sizes = sizesIn.getOrElse(
      df.groupBy(key).agg(count(lit(1)).as("group_n")))
    val sized = df.join(broadcast(sizes), Seq(key), "left")
      .withColumn("__nchunks",
        greatest(lit(1L),
          ceil(coalesce(col("group_n"), lit(1L)) /
            lit(splitRows.toDouble))))
      .withColumn("__na",
        least(lit(maxSub.toLong), col("__nchunks")).cast("int"))
      .withColumn("__nb",
        least(lit(maxSub.toLong),
          ceil(col("__nchunks") / lit(maxSub.toDouble))).cast("int"))
    // sub = grid cell (a-chunk · nb + b-chunk). An a-row sits in ONE
    // a-chunk and replicates across the nb b-chunks; a b-row sits in
    // ONE b-chunk (independent second hash) and replicates across the
    // na a-chunks — so the ordered pair (a, b) meets exactly once, in
    // cell (chunk(a), chunk(b)). nb = 1 until the group needs more
    // than maxSub chunks, which degenerates to the one-dimensional
    // split byte-for-byte (sub = a-chunk; b-side multiprobes all subs).
    val a = sized
      .withColumn("__sb", explode(sequence(lit(0), col("__nb") - 1)))
      .withColumn("sub",
        (pmod(xxhash64(col(id)), col("__na")).cast("int") * col("__nb") +
          col("__sb")).cast("int"))
      .drop("group_n", "__nchunks", "__na", "__nb", "__sb")
    val b = sized
      .withColumn("__sa", explode(sequence(lit(0), col("__na") - 1)))
      .withColumn("sub",
        (col("__sa") * col("__nb") +
          pmod(xxhash64(col(id), lit(1)), col("__nb")).cast("int"))
          .cast("int"))
      .drop("group_n", "__nchunks", "__na", "__nb", "__sa")
    (a, b)
  }
}
