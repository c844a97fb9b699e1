package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.dialect.Dialect._
import graft.operators.QueryDef
import graft.sources.Tables

/** A media payload: opaque bytes + typed metadata — the schema shape a
  * 100 TB multimodal corpus uses (content stays an un-decoded `binary`
  * column; only narrow typed metadata is materialized columnar).
  */
final case class MediaRecord(doc_id: Long, media_type: String, blob: Array[Byte])

/** Extracted features. In production `width/height/duration_ms` come from
  * an image/audio decoder; this container has no codec libraries, so the
  * decode step is STUBBED with a deterministic fake (below) while the
  * Spark-side plumbing — schema, encoders, per-partition batching — is
  * real and tested.
  */
final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Int,
    width: Int, height: Int, duration_ms: Long)

/** Multimodal columns: treat image/audio/video as opaque binary with
  * typed metadata; decode/feature-extract runs per-partition so a real
  * decoder would amortize native-library initialization across a batch
  * (the `mapPartitions` shape is exactly what a JNI/FFI decoder needs —
  * one init per partition, streaming over rows, no per-row overhead).
  */
/** Pluggable decoder boundary. A production implementation wraps a
  * native codec (JNI/FFI): `open()` runs once per partition to load and
  * initialize the library, `decode` is called per row, `close()` tears
  * down. Implementations must be `Serializable` (shipped to executors)
  * and `decode` must be thread-safe per instance copy.
  */
trait MediaDecoder extends Serializable {
  /** One-time per-partition initialization (native lib load, arena alloc). */
  def open(): Unit = ()
  /** (width, height, duration_ms) for the payload. */
  def decode(mediaType: String, blob: Array[Byte]): (Int, Int, Long)
  def close(): Unit = ()
}

/** STUB decoder — deterministic fake standing in for an image decode.
  * Real implementation would parse the container header; the fake
  * derives plausible dimensions from content bytes so tests are stable.
  * (This container ships no codec libraries; see Multimodal scaladoc.)
  */
object StubDecoder extends MediaDecoder {
  def decode(mediaType: String, blob: Array[Byte]): (Int, Int, Long) = {
    val n = blob.length
    val b0 = if (n > 0) blob(0) & 0xff else 0
    (64 + (n % 577), 64 + (b0 * 7 % 359), n.toLong * 3L)
  }
}

object Multimodal {

  /** Back-compat alias for the stub decode (tests, sampleFrames). */
  def decodeStub(blob: Array[Byte]): (Int, Int, Long) =
    StubDecoder.decode("application/octet-stream", blob)

  /** The media table derived from `documents` (text bytes as the opaque
    * payload — same plumbing as a real image column).
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        when(col("source") === "src0", "image/png")
          .when(col("source") === "src1", "audio/wav")
          .otherwise("video/mp4").as("media_type"),
        col("text").cast("binary").as("blob"))
      .as[MediaRecord]
  }

  /** Feature extraction over partitions of binary payloads. The decoder
    * opens once per partition; close is registered as a task-completion
    * listener so it fires on success, FAILURE, and early termination
    * (e.g. a limit that stops pulling the iterator) — an
    * exhaustion-triggered close would leak the native allocation on any
    * partially-consumed partition.
    */
  def extractFeatures(media: Dataset[MediaRecord],
                      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      decoder.open()
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => decoder.close())
      it.map { r =>
        val (w, h, d) = decoder.decode(r.media_type, r.blob)
        MediaFeatures(r.doc_id, r.media_type, r.blob.length, w, h, d)
      }
    }
  }

  /** A decoded frame/patch: sampled slice of the payload with its
    * timestamp offset — the row shape a video frame-sampler emits.
    */
  final case class Frame(doc_id: Long, frame_idx: Int, offset_ms: Long,
      frame_bytes: Array[Byte])

  /** Frame-sampling over binary payloads: emit `n` evenly-spaced slices
    * per record (a real sampler seeks keyframes; the slicing stub keeps
    * the fan-out/row-multiplication plumbing real). flatMap shape: one
    * input row → up to n frame rows, all computed map-side.
    */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.blob.length
      if (len == 0) Iterator.empty
      else {
        val step = math.max(len / n, 1)
        (0 until math.min(n, len)).iterator.map { i =>
          val from = i * step
          val until = math.min(from + step, len)
          // STUB: a real decoder would decode the container and seek;
          // offset_ms uses the stubbed duration for deterministic tests.
          Frame(r.doc_id, i, decodeStub(r.blob)._3 * i / math.max(n, 1),
            java.util.Arrays.copyOfRange(r.blob, from, until))
        }
      }
    }
  }

  /** Resize stub: deterministic downscale of the fake dimensions with
    * the payload untouched (a real implementation re-encodes bytes).
    * Runs through the same mapPartitions batch path as extractFeatures.
    */
  def resize(feats: Dataset[MediaFeatures], maxSide: Int): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.mapPartitions(_.map { f =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(f.width, f.height))
      f.copy(width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    })
  }

  /** Metadata query over the binary column using only engine-portable
    * functions (so DuckDB can oracle it); the mapPartitions decoder path
    * above is covered by ScalaTest instead (its stub is not ANSI SQL).
    */
  private val meta = QueryDef(
    "llm_multimodal_meta",
    (s, dir) => mediaTable(s, dir).toDF()
      .select(col("doc_id"), col("media_type"),
        length(col("blob")).as("n_bytes"),
        substring(md5(col("blob")), 1, 8).as("sig"),
        div(length(col("blob")), lit(1024)).as("kb_bucket"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
           |CASE WHEN source = 'src0' THEN 'image/png'
           |     WHEN source = 'src1' THEN 'audio/wav'
           |     ELSE 'video/mp4' END AS media_type,
           |CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           |substr(md5(text), 1, 8) AS sig,
           |CAST(floor(octet_length(encode(text)) / 1024.0) AS BIGINT) AS kb_bucket
           |FROM documents ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(meta)
}
