package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** One media payload: an opaque binary column plus typed metadata.
 * At 100 TB the payload column stays opaque through shuffles — only
 * decode/feature stages touch the bytes, partition-local. */
final case class MediaItem(doc_id: Long, kind: String, payload: Array[Byte])

/** Decoded metadata row (schema fixed so downstream SQL can run on it). */
final case class MediaMeta(doc_id: Long, kind: String, byte_len: Int,
                           width: Int, height: Int, n_frames: Int,
                           checksum: Long)

/**
 * Multimodal column plumbing (builder-prompt "multimodal columns"
 * requirement): images/audio/video ride as `binary` columns; decode /
 * feature-extraction runs partition-local over typed Datasets via
 * `mapPartitions` — the Scala analog of `mapInPandas` batch UDFs: one
 * iterator per partition, so a real decoder could amortize native-lib
 * init per batch exactly like an Arrow batch UDF would.
 *
 * ==== STUB NOTICE ====
 * The actual image/audio decode libraries are NOT in this container, so
 * [[MediaPipeline.decodeStub]] is a clearly-marked deterministic fake
 * (pure arithmetic over the payload bytes). Everything around it —
 * schema, encoders, partition-local batching, frame sampling,
 * aggregation — is real and tested; swapping in a real decoder changes
 * only the stub body.
 */
object MediaPipeline {

  /** STUB: deterministic fake "decode" — width/height/frames/checksum
   * derived from the bytes. Replace with a real decoder when the native
   * libs exist; the signature is the contract. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Long) = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum = checksum * 131 + (payload(i) & 0xff); i += 1 }
    checksum = checksum & Long.MaxValue
    val width = 64 + (checksum % 1216).toInt   // fake 64..1279 px
    val height = 64 + ((checksum >> 16) % 656).toInt
    val frames = 1 + ((checksum >> 32) % 240).toInt
    (width, height, frames, checksum)
  }

  /** Partition-local decode: iterator-in/iterator-out, the batch shape a
   * native decoder needs (per-partition init, streaming through rows). */
  def decode(items: Dataset[MediaItem]): Dataset[MediaMeta] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // real decoder would init native handles here, once per partition
      it.map { m =>
        val (w, h, f, sum) = decodeStub(m.payload)
        MediaMeta(m.doc_id, m.kind, m.payload.length, w, h, f, sum)
      }
    }
  }

  /** Deterministic frame-index sampling for video-ish payloads: k evenly
   * spaced frames (ceil spacing), always including frame 0. */
  def sampleFrames(nFrames: Int, k: Int): Seq[Int] =
    if (nFrames <= 0 || k <= 0) Seq.empty
    else if (nFrames <= k) 0 until nFrames
    else (0 until k).map(i => (i.toLong * nFrames / k).toInt)

  /** documents table → MediaItem dataset (text bytes stand in for media
   * payloads; kind derived from lang so the pipeline has a partition
   * key a real corpus would have). */
  def itemsFromDocuments(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id",
        "CASE WHEN lang IN ('en','es') THEN 'image' " +
          "WHEN lang IN ('de','fr') THEN 'audio' ELSE 'video' END AS kind",
        "CAST(text AS BINARY) AS payload")
      .as[MediaItem]
  }
}
