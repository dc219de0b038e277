package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSource V2 synthetic corpus generator:
 *
 *   spark.read.format("graft.sources.DocGen")
 *     .option("rows", 1e6.toLong).option("partitions", 64)
 *     .option("seed", 42).load()
 *
 * Yields the `documents` shape (doc_id, lang, source, text, n_chars)
 * deterministically from (seed, doc_id) — same rows at any partition
 * count, so plans can be benchmarked at arbitrary scale with NO input
 * files at all (the generator analog of Spark's built-in `rate` source,
 * for corpora).
 *
 * Scale properties, by construction:
 *  - the work is split into `partitions` independent id ranges — 1000
 *    executors generate 1000 ranges with zero coordination;
 *  - column pruning is pushed into the reader
 *    (SupportsPushDownRequiredColumns): `select count(*)` never
 *    materializes text (DocGenSpec pins this);
 *  - rows are generated lazily per `next()` — nothing is buffered.
 */
class DocGen extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DocGenTable(new CaseInsensitiveStringMap(properties))
}

object DocGen {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))

  private val langs = Array("en", "es", "de", "fr", "zh")
  private val vocab = Array(
    "the", "data", "row", "join", "merge", "sort", "query", "filter",
    "scan", "stream", "batch", "window", "hash", "key", "value", "shard",
    "index", "plan", "spill", "cache", "byte", "page", "block", "node")

  /** splittable 64-bit mix (same xxhash-style finalizer family the
   * engine's other derived hashes use) */
  private def mix(seed: Long, x: Long): Long = {
    var h = seed ^ (x * 0x9E3779B97F4A7C15L)
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^ (h >>> 33)
  }

  /** hash-derived fields, no text materialization */
  def langFor(seed: Long, id: Long): String = {
    val h = mix(seed, id)
    langs(java.lang.Long.remainderUnsigned(h, langs.length.toLong).toInt)
  }
  def sourceFor(seed: Long, id: Long): String =
    "src" + java.lang.Long.remainderUnsigned(mix(seed, id) >>> 8, 4L)

  /** deterministic text for (seed, id); independent of partitioning */
  def textFor(seed: Long, id: Long): String = {
    val h = mix(seed, id)
    val n = 20 + java.lang.Long.remainderUnsigned(h >>> 16, 81L).toInt // 20..100 tokens
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb += ' '
      sb ++= vocab(java.lang.Long.remainderUnsigned(mix(h, i.toLong), vocab.length.toLong).toInt)
      i += 1
    }
    sb.toString
  }

  /** deterministic doc for (seed, id); independent of partitioning */
  def docFor(seed: Long, id: Long): (String, String, String, Int) = {
    val text = textFor(seed, id)
    (langFor(seed, id), sourceFor(seed, id), text, text.length)
  }
}

private class DocGenTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_docgen"
  override def schema(): StructType = DocGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(
      rows = opts.getLong("rows", 1000L),
      parts = opts.getInt("partitions", 8),
      seed = opts.getLong("seed", 42L),
      rowsPerBatch = opts.getLong("rowsPerBatch", 100L))
}

private class DocGenScanBuilder(rows: Long, parts: Int, seed: Long,
                                rowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = DocGen.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new DocGenScan(rows, parts, seed, rowsPerBatch, required)
}

private class DocGenScan(rows: Long, parts: Int, seed: Long,
                         rowsPerBatch: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    DocGenScan.rangePartitions(0L, rows, parts)

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(seed, required)

  /** Micro-batch flavor: each trigger emits the next `rowsPerBatch` ids
   * until `rows` is exhausted — the corpus analog of the `rate` source,
   * for driving streaming operators with no input files. Offsets are
   * plain row counts, so restart-from-checkpoint replays exactly the
   * unprocessed id range (deterministic content ⇒ exactly-once output
   * with an idempotent sink). */
  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new DocGenMicroBatchStream(rows, parts, seed, rowsPerBatch, required)
}

private object DocGenScan {
  def rangePartitions(from: Long, until: Long, parts: Int): Array[InputPartition] = {
    val n = until - from
    if (n <= 0) return Array.empty
    val per = math.max(1L, (n + parts - 1) / parts)
    (from until until by per)
      .map(start => DocGenPartition(start, math.min(start + per, until)))
      .toArray[InputPartition]
  }
}

private case class DocGenOffset(rowId: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = rowId.toString
}

private class DocGenMicroBatchStream(rows: Long, parts: Int, seed: Long,
                                     rowsPerBatch: Long, required: StructType)
    extends streaming.MicroBatchStream
    with streaming.SupportsTriggerAvailableNow {

  override def initialOffset(): streaming.Offset = DocGenOffset(0L)
  override def deserializeOffset(json: String): streaming.Offset =
    DocGenOffset(json.toLong)

  // admission-control API: the engine hands us the last planned offset
  // and a read limit, so batch slicing is stateless here (progress is
  // the engine's offset log, which also makes checkpoint restart exact).
  // Implementing SupportsTriggerAvailableNow additionally lets
  // Trigger.AvailableNow drain the full id range in bounded batches and
  // terminate — the backfill/catch-up runner.
  override def getDefaultReadLimit: streaming.ReadLimit =
    streaming.ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: streaming.Offset,
                            limit: streaming.ReadLimit): streaming.Offset = {
    val from = start.asInstanceOf[DocGenOffset].rowId
    val step = limit match {
      case m: streaming.ReadMaxRows => m.maxRows()
      case _ => rowsPerBatch
    }
    DocGenOffset(math.min(rows, from + step))
  }

  // every id in [0, rows) is always "available"; nothing to snapshot
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def reportLatestOffset(): streaming.Offset = DocGenOffset(rows)

  override def latestOffset(): streaming.Offset =
    throw new UnsupportedOperationException(
      "admission-control source: latestOffset(start, limit) is used")

  override def commit(end: streaming.Offset): Unit = ()

  override def planInputPartitions(start: streaming.Offset,
                                   end: streaming.Offset): Array[InputPartition] =
    DocGenScan.rangePartitions(start.asInstanceOf[DocGenOffset].rowId,
      end.asInstanceOf[DocGenOffset].rowId, parts)

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(seed, required)

  override def stop(): Unit = ()
}

private case class DocGenPartition(start: Long, end: Long) extends InputPartition

private class DocGenReaderFactory(seed: Long, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[DocGenPartition]
    new PartitionReader[InternalRow] {
      private var id = part.start - 1
      // pruned projection: only requested fields are computed — in
      // particular, a scan that needs no text-derived column (text,
      // n_chars) never builds the token string at all
      private val fieldIdx = required.fieldNames
      override def next(): Boolean = { id += 1; id < part.end }
      override def get(): InternalRow = {
        lazy val text = DocGen.textFor(seed, id)
        val values = fieldIdx.map {
          case "doc_id" => id
          case "lang" => UTF8String.fromString(DocGen.langFor(seed, id))
          case "source" => UTF8String.fromString(DocGen.sourceFor(seed, id))
          case "text" => UTF8String.fromString(text)
          case "n_chars" => text.length
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
