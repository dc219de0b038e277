package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide frequency of a power-law key, attached to every row,
 * scale-safe under Zipf skew.
 *
 * The single-scan alternative — `sum(w) over (Window.partitionBy(key))`
 * — is the plan-minimal shape (one scan, one exchange) but a window
 * never partial-aggregates: every occurrence row of a hot key ("the",
 * "of the", a boilerplate 30-gram) lands in ONE WindowExec task, which
 * buffers and sorts the whole partition. At lake scale that task holds
 * ~n_docs rows and serializes the stage on one straggler. ZipfWindowProbe
 * measures the knee; this helper is the routed shape that removes it:
 *
 *  1. `freq = stream.groupBy(key).agg(sum(weight))` — a hash aggregate
 *     PARTIAL-combines map-side, so a hot key contributes one row per
 *     map task and the freq exchange is skew-immune. The frame is
 *     PERSISTED: its hot and cold consumers would otherwise each
 *     recompute the aggregate INCLUDING the corpus scan and any
 *     derivation beneath it (PlanAudit measured exactly that — the
 *     two branches' exchanges never unify, the same
 *     pruning-divergence that motivated the r14 window shapes), and
 *     freq is distinct-keys-sized (8+8 bytes per key), not
 *     corpus-sized — MEMORY_AND_DISK spills it per-executor at lake
 *     scale. The q_corpus_pipeline precedent: builders cache frames
 *     that multiple branches reference; the harness clears caches
 *     between entries.
 *  2. Keys with `freq >= hotMin` broadcast (bounded: at most
 *     total_weight / hotMin rows) and join map-side — hot occurrence
 *     rows NEVER shuffle by key.
 *  3. The cold tail shuffle-joins on the key; every hot row's join key
 *     is scattered to a deterministic per-row sentinel
 *     (`pmod(xxhash64(scatter), ways)` cast to the key type) so no
 *     reduce task inherits a hot partition. A sentinel that collides
 *     with a real cold key is harmless: the row already carries its
 *     broadcast frequency and the final coalesce prefers it, and the
 *     cold side has exactly one row per key so the join never
 *     multiplies.
 *
 * Cost: two corpus scans (freq + probe) and one skew-BOUNDED stream
 * exchange, vs the window's one scan and one skew-UNBOUNDED exchange.
 * `hotMin` is the declared knob: "route a key around the exchange when
 * its corpus mass alone exceeds a healthy reduce task's row budget".
 * Results are exact — routing changes where each frequency is computed,
 * never its value.
 */
object HotColdFreq {
  /** Default hot threshold: a key whose corpus mass exceeds ~2M rows
   * would dominate a reduce task on its own; below it, shuffling the
   * occurrences is safe. Env-overridable for probes. */
  val DefaultHotMin: Long =
    sys.env.get("SPARK_GRAFT_HOT_MIN").map(_.toLong).getOrElse(2000000L)

  /** Adds `freqName` = total `weight` of `keyCol` across `stream`.
   *
   * Contract: rows with a NULL key get a NULL frequency (they never
   * match either join side) — the window formulation would instead
   * count the null partition. The gate entries' keys are non-null by
   * construction (xxhash64 outputs, split tokens); callers with
   * nullable keys must decide their null semantics first.
   *
   * @param scatter deterministic per-row column (e.g. doc_id) used to
   *                spread hot rows' sentinel join keys; never randomness
   *                (plans must be replay-stable).
   */
  def withFreq(stream: DataFrame, keyCol: String, freqName: String,
               weight: Column, scatter: Column,
               hotMin: Long = DefaultHotMin, ways: Int = 64): DataFrame = {
    // reserved internals + the output column must not collide with the
    // caller's schema (the r14 Salting reserved-name precedent: fail
    // loudly, never silently shadow)
    for (c <- Seq("__hot_f", "__cold_f", "__ck", freqName))
      require(!stream.columns.contains(c),
        s"HotColdFreq.withFreq: stream already has a column named '$c'")
    val kt = stream.schema(keyCol).dataType
    val freq = stream.groupBy(col(keyCol))
      .agg(sum(weight).cast("long").as(freqName))
      .persist() // see scaladoc: shared by the hot and cold consumers
    val hot = broadcast(freq.filter(col(freqName) >= hotMin)
      .select(col(keyCol), col(freqName).as("__hot_f")))
    val cold = freq.filter(col(freqName) < hotMin)
      .select(col(keyCol).as("__ck"), col(freqName).as("__cold_f"))
    stream.join(hot, Seq(keyCol), "left")
      .withColumn("__ck",
        when(col("__hot_f").isNotNull,
          pmod(xxhash64(scatter), lit(ways.toLong)).cast(kt))
          .otherwise(col(keyCol)))
      .join(cold, Seq("__ck"), "left")
      .withColumn(freqName, coalesce(col("__hot_f"), col("__cold_f")))
      .drop("__hot_f", "__cold_f", "__ck")
  }
}
