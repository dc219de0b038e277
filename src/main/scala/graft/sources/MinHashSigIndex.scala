package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Q

/**
 * Content-stamped persisted MinHash signature table for the UNFILTERED
 * documents corpus — the second shared artifact of the round-8
 * build-once discipline (sibling of [[KnnGraphIndex]]): before it,
 * every LSH dedup entry (q_neardup_pairs, q_minhash_est,
 * q_dedup_clusters, q_dedup_clusters_star, q_cluster_rep,
 * q_split_leakage) re-ran the corpus-wide shingle explode +
 * 32-permutation MinHashAgg fold — the signature aggregation is the
 * one corpus-scale shuffle in the candidate path, repeated six times
 * for one logical artifact.
 *
 * Exactly what a production dedup pipeline materializes as its
 * "signature table": 32 longs per document, computed in one job,
 * reused by every banding/candidate consumer until the corpus content
 * changes (the stamp convention). The exact-Jaccard VERIFY step still
 * reads the documents table itself (it needs the shingle sets) — that
 * is a map-side scan, not a shuffle; only the aggregation is hoisted.
 *
 * Round 9 adds INCREMENTAL maintenance (VERDICT r8 item 4, the batch
 * twin of s_incr_dedup's ingest index): each signature row carries
 * `text_hash` = xxhash64(text), and when the corpus stamp changes
 * while a previous artifact survives, the build
 *
 *  1. keeps every previous row whose (doc_id, text_hash) still exists
 *     in the corpus (left-semi — removed/changed docs drop out),
 *  2. signs ONLY docs whose (doc_id, text_hash) the previous artifact
 *     does not cover (left-anti → the corpus-scale shingle explode +
 *     MinHash fold runs over the DELTA slice, not the corpus),
 *  3. unions and republishes atomically under the new stamp.
 *
 * Because a changed text changes its hash, no append-only assumption
 * is needed: incremental ≡ full rebuild UNCONDITIONALLY — q_incr_sigs
 * oracle-pins the equivalence in the gate, and tools/ScaleSmoke
 * measures the cost curve. The delta-detection joins shuffle 16-byte
 * (id, hash) keys plus the artifact's own 256-byte signature rows —
 * never document text. The COMPUTE is delta-proportional; the
 * republish still rewrites the whole signature table (corpus-sized
 * sequential parquet I/O, no shuffle) because the artifact is one
 * atomic dir — the production upgrade is a table format whose commit
 * reuses unchanged data files at the metadata level (the
 * SnapshotStore posture), at which point refresh I/O is delta-sized
 * too.
 *
 * Same publication contract as KnnGraphIndex: per-invocation staging +
 * one atomic rename ([[Q.ensureStampedIncr]]), stale stamps swept
 * post-publish, explicit read schema so an empty corpus round-trips
 * typed.
 */
object MinHashSigIndex {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType)),
    StructField("text_hash", LongType),
    StructField("n_sh", IntegerType)))

  /** The full-corpus signature-build plan (unpersisted) — exposed for
   * spec pins. */
  def buildPlan(s: SparkSession, dir: String): DataFrame =
    graft.queries.LlmOps.sigsPlan(s, dir)

  /** The persisted signature table for `dir`'s documents:
   * build-if-absent — incrementally against the previous artifact when
   * one survives — then a schema-pinned read. (`_v4_` in the prefix
   * versions the row layout — v3 added text_hash for incremental
   * delta detection, v4 added n_sh, the exact shingle-set size the
   * LSH length filter reads instead of re-scanning the corpus; an
   * older-layout artifact must never be served through a newer
   * schema.) */
  def sigs(s: SparkSession, dir: String): DataFrame = {
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val idx = Q.ensureStampedIncr(s"graft_minhash_sigs_v4_${tag}_",
      Q.contentStamp(dir, "documents")) { (staging, prev) =>
      val docs = Q.rd(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          xxhash64(col("text")).as("text_hash"))
      val plan = prev match {
        case Some(base) =>
          val old = s.read.schema(schema).parquet(base.toString)
          // delta detection runs entirely over 16-byte (id, hash) keys;
          // TEXT itself never crosses an exchange: freshKeys (the
          // delta-sized anti result) joins back against the corpus
          // scan, and AQE broadcasts it when the delta is small — the
          // common refresh case — leaving the text side map-side. A
          // huge delta falls back to a shuffle, at which point a full
          // rebuild would cost the same anyway.
          val dh = docs.select("doc_id", "text_hash")
          val keep = old.join(dh, Seq("doc_id", "text_hash"), "left_semi")
          val freshKeys = dh.join(old.select("doc_id", "text_hash"),
            Seq("doc_id", "text_hash"), "left_anti")
          val fresh = docs.join(freshKeys,
            Seq("doc_id", "text_hash"), "left_semi")
          keep.unionByName(
            graft.queries.LlmOps.sigsPlanFor(
              fresh.select("doc_id", "text")))
        case None =>
          graft.queries.LlmOps.sigsPlanFor(
            docs.select("doc_id", "text"))
      }
      plan.write.mode("overwrite").parquet(staging.toString)
    }
    s.read.schema(schema).parquet(idx.toString)
  }
}
