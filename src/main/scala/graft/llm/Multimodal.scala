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

/** Extracted features. `width/height/duration_ms` come from the header
  * decode: for images (width, height, 0); for audio the two int slots
  * carry (sample_rate, channels) and duration_ms is the PCM data length
  * over the byte rate.
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

/** Real container-header decoder, pure-JVM byte parsing (no codec
  * library): PNG IHDR gives (width, height, 0); WAV RIFF chunks give
  * (sample_rate, channels, data_bytes·1000/byte_rate); MP4/ISO-BMFF box
  * walking gives (tkhd width, tkhd height, mvhd duration·1000/timescale).
  * Dispatch is on the MAGIC BYTES, not the claimed media_type — corpus
  * metadata lies. Unparseable payloads throw `IllegalArgumentException`
  * (an honest decoder fails loudly; route dirty corpora through
  * [[tryDecode]]).
  */
object HeaderDecoder extends MediaDecoder {

  private val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u32be(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def u32beL(b: Array[Byte], i: Int): Long = u32be(b, i).toLong & 0xffffffffL
  private def u64be(b: Array[Byte], i: Int): Long =
    (u32beL(b, i) << 32) | u32beL(b, i + 4)
  private def u32le(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)).toLong | (u8(b, i + 3).toLong << 24)
  private def u16le(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def decode(mediaType: String, blob: Array[Byte]): (Int, Int, Long) = {
    if (blob.length >= 24 && blob.take(8).sameElements(pngSig) && tag(blob, 12) == "IHDR")
      // PNG: signature(8) + IHDR chunk (len 4, type 4, then width/height
      // as big-endian u32 at offsets 16 and 20).
      (u32be(blob, 16), u32be(blob, 20), 0L)
    else if (blob.length >= 44 && tag(blob, 0) == "RIFF" && tag(blob, 8) == "WAVE") {
      // WAV: walk [id(4) size(4 LE) payload(size, padded to even)]
      // chunks after the 12-byte RIFF header — a general walk, not a
      // fixed 44-byte layout, so LIST/fact chunks don't break parsing.
      var sampleRate = 0L; var channels = 0; var byteRate = 0L; var dataBytes = -1L
      // Long cursor: a crafted/corrupt chunk size near 2^32 would wrap an
      // Int cursor back into the buffer and loop; Long arithmetic walks
      // straight off the end and terminates.
      var i = 12L
      while (i + 8 <= blob.length && dataBytes < 0) {
        val id = tag(blob, i.toInt)
        val size = u32le(blob, i.toInt + 4)
        if (id == "fmt " && i + 8 + 16 <= blob.length) {
          channels = u16le(blob, i.toInt + 10)
          sampleRate = u32le(blob, i.toInt + 12)
          byteRate = u32le(blob, i.toInt + 16)
        } else if (id == "data") dataBytes = size
        i += 8L + size + (size & 1L)
      }
      if (byteRate <= 0 || dataBytes < 0)
        throw new IllegalArgumentException("WAV missing fmt/data chunk")
      (sampleRate.toInt, channels, dataBytes * 1000L / byteRate)
    } else if (blob.length >= 12 && tag(blob, 4) == "ftyp") {
      // MP4 / ISO-BMFF (ISO 14496-12): a tree of [size(4 BE) type(4)]
      // boxes. Walk top-level boxes to `moov`, then its children for
      // `mvhd` (movie timescale + duration) and each `trak`'s `tkhd`
      // (16.16 fixed-point presentation width/height; audio tracks carry
      // 0×0, so the max across tracks is the video size). A general
      // recursive walk like the WAV path — no fixed layout assumed —
      // with Long cursors so a crafted 32-bit size can't wrap.
      var timescale = 0L; var duration = -1L
      var width = 0; var height = 0
      def walk(from: Long, until: Long): Unit = {
        var i = from
        var ok = true
        while (ok && i + 8 <= until) {
          val size = u32beL(blob, i.toInt)
          val id = tag(blob, i.toInt + 4)
          // size 0 = box extends to end of enclosure; size 1 = 64-bit
          // largesize (only meaningful for >4 GiB mdat — out of scope
          // for an in-memory header parse, skip the walk honestly).
          val boxEnd = if (size == 0) until else i + size
          if (size == 1 || (size != 0 && size < 8) || boxEnd > until) ok = false
          else {
            id match {
              case "moov" | "trak" => walk(i + 8, boxEnd)
              case "mvhd" if boxEnd - i >= 32 =>
                if (u8(blob, i.toInt + 8) == 1 && boxEnd - i >= 44) {
                  timescale = u32beL(blob, i.toInt + 28)
                  duration = u64be(blob, i.toInt + 32)
                } else {
                  timescale = u32beL(blob, i.toInt + 20)
                  duration = u32beL(blob, i.toInt + 24)
                }
              case "tkhd" if boxEnd - i >= 92 =>
                val v1 = u8(blob, i.toInt + 8) == 1
                val (wOff, hOff) = if (v1) (96, 100) else (84, 88)
                if (boxEnd - i >= hOff + 4) {
                  width = math.max(width, u32be(blob, i.toInt + wOff) >>> 16)
                  height = math.max(height, u32be(blob, i.toInt + hOff) >>> 16)
                }
              case _ => ()
            }
            i = boxEnd
          }
        }
      }
      walk(0L, blob.length.toLong)
      if (timescale <= 0 || duration < 0)
        throw new IllegalArgumentException("MP4 missing moov/mvhd box")
      (width, height, duration * 1000L / timescale)
    } else throw new IllegalArgumentException(
      s"unrecognized container (media_type=$mediaType, ${blob.length} bytes)")
  }

  /** None instead of throwing — the dirty-corpus entry point. */
  def tryDecode(mediaType: String, blob: Array[Byte]): Option[(Int, Int, Long)] =
    try Some(decode(mediaType, blob)) catch { case _: IllegalArgumentException => None }
}

object Multimodal {

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
                      decoder: MediaDecoder = HeaderDecoder): Dataset[MediaFeatures] = {
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
    * per record (a real sampler seeks keyframes; the byte slicing keeps
    * the fan-out/row-multiplication plumbing real). `offset_ms` spaces
    * the container's header-decoded duration evenly across frames; a
    * container the decoder can't time (e.g. a still image or an unknown
    * format) gets offset 0 for every frame. flatMap shape: one input
    * row → up to n frame rows, all computed map-side.
    */
  def sampleFrames(media: Dataset[MediaRecord], n: Int,
                   decoder: MediaDecoder = HeaderDecoder): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      decoder.open()
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => decoder.close())
      it.flatMap { r =>
        val len = r.blob.length
        if (len == 0) Iterator.empty
        else {
          val duration =
            try decoder.decode(r.media_type, r.blob)._3
            catch { case _: IllegalArgumentException => 0L }
          val step = math.max(len / n, 1)
          (0 until math.min(n, len)).iterator.map { i =>
            val from = i * step
            val until = math.min(from + step, len)
            Frame(r.doc_id, i, duration * i / math.max(n, 1),
              java.util.Arrays.copyOfRange(r.blob, from, until))
          }
        }
      }
    }
  }

  /** Metadata resize: recompute the (width, height) columns for a
    * bounded box without touching payloads — the cheap planning pass a
    * pipeline runs before deciding what to re-encode. For the real
    * pixel transform see [[resizeImages]].
    */
  def resize(feats: Dataset[MediaFeatures], maxSide: Int): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.mapPartitions(_.map { f =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(f.width, f.height))
      f.copy(width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    })
  }

  /** REAL image resize — decode pixels, bilinear-downscale into a
    * bounded box, re-encode PNG — using only the JDK's built-in codecs
    * (`javax.imageio` decodes/encodes PNG natively; no external
    * library). Non-image or already-small payloads pass through
    * unchanged, so the operator is safe over a mixed corpus. Same
    * mapPartitions batch discipline as [[extractFeatures]]; at 100 TB
    * this is the pattern for any per-payload transcode: narrow map, no
    * shuffle, output blob replaces input blob.
    */
  def resizeImages(media: Dataset[MediaRecord], maxSide: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.blob))
        catch { case _: java.io.IOException => null }
      if (img == null) r // not decodable by the JDK — pass through
      else {
        val scale = math.min(1.0, maxSide.toDouble / math.max(img.getWidth, img.getHeight))
        if (scale >= 1.0) r
        else {
          val w = math.max(1, (img.getWidth * scale).toInt)
          val h = math.max(1, (img.getHeight * scale).toInt)
          // Preserve transparency: compositing an RGBA source onto an
          // RGB target would turn every transparent pixel opaque black.
          val imgType =
            if (img.getColorModel.hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
            else java.awt.image.BufferedImage.TYPE_INT_RGB
          val out = new java.awt.image.BufferedImage(w, h, imgType)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.setComposite(java.awt.AlphaComposite.Src)
          g.drawImage(img, 0, 0, w, h, null)
          g.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", baos)
          MediaRecord(r.doc_id, r.media_type, baos.toByteArray)
        }
      }
    })
  }

  /** Deterministic REAL media payloads for the decode oracle: tiny PNGs
    * (`javax.imageio` encoder) and PCM WAVs (`javax.sound.sampled`
    * writer) — both pure JDK, no codec library — written once to a
    * fixture parquet that BOTH engines read (same pattern as the NPO DAG
    * fixtures). Determinism across runs is not required: Spark and the
    * DuckDB oracle parse the SAME file, whatever the encoder emitted.
    */
  object MediaFixtures {
    private val version = "v2"
    // FIXED path, deliberately not conf-driven: the DuckDB oracle SQL is
    // a static string reading this exact location, so a relocatable root
    // would silently desynchronize the two engines. This is an oracle
    // fixture, not a production artifact (unlike the IVF index).
    val root = "/root/repo/fixtures/media"
    def ensure(s: SparkSession): String = synchronized {
      val path = s"$root/media_real.parquet"
      graft.sources.Artifacts.ensureOnce(s, root, s"_GRAFT_MEDIA_$version") {
        val pngs = (0 until 6).map { i =>
          val w = 3 + 5 * i
          val h = 2 + 3 * i
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (x <- 0 until w; y <- 0 until h)
            img.setRGB(x, y, (x * 31 + y * 7 + i * 131) & 0xffffff)
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          MediaRecord(i.toLong, "image/png", out.toByteArray)
        }
        val rates = Seq(8000, 11025, 16000, 22050, 32000, 44100)
        val wavs = rates.zipWithIndex.map { case (rate, i) =>
          val channels = 1 + (i % 2)
          val nFrames = rate / 50 + i * 17 // ~20ms + a ragged tail
          val fmt = new javax.sound.sampled.AudioFormat(
            rate.toFloat, 16, channels, true, false)
          val pcm = Array.tabulate(nFrames * channels * 2)(j => ((j * 37 + i) % 251).toByte)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          MediaRecord((10 + i).toLong, "audio/wav", out.toByteArray)
        }
        // Minimal REAL MP4 containers, hand-assembled (ISO 14496-12 is
        // pure box framing — no codec needed for header metadata): ftyp
        // + moov(mvhd v0 + trak(tkhd v0)) + trailing mdat. The writer
        // emits the canonical v0 layout, so moov field offsets are FIXED
        // (mdat last): timescale@44, duration@48, 16.16 width@224,
        // height@228 — which is what lets the DuckDB oracle re-derive
        // every field with static hex arithmetic while the Scala decoder
        // does an independent general box walk.
        def be(vs: Long*): Array[Byte] = {
          val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
          vs.foreach(v => bb.putInt(v.toInt))
          bb.array()
        }
        def mkBox(typ: String, body: Array[Byte]): Array[Byte] =
          be(8L + body.length) ++
            typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body
        val unity = Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
        val mp4Params = Seq( // (timescale, duration, width, height)
          (1000L, 2000L, 320L, 240L), (600L, 1234L, 640L, 360L),
          (90000L, 630000L, 1280L, 720L), (12288L, 8192L, 16L, 9L),
          (44100L, 44100L, 1920L, 1080L), (30L, 95L, 8L, 8L))
        val mp4s = mp4Params.zipWithIndex.map { case ((ts, dur, w, h), i) =>
          val mvhd = mkBox("mvhd", be(
            Seq(0L, 0L, 0L, ts, dur, 0x00010000L, 0x01000000L, 0L, 0L) ++ unity ++
              Seq(0L, 0L, 0L, 0L, 0L, 0L, 2L): _*))
          val tkhd = mkBox("tkhd", be(
            Seq(7L, 0L, 0L, 1L, 0L, dur, 0L, 0L, 0L, 0L) ++ unity ++
              Seq(w << 16, h << 16): _*))
          val moov = mkBox("moov", mvhd ++ mkBox("trak", tkhd))
          val mdat = mkBox("mdat",
            Array.tabulate(32 + i * 57)(j => ((j * 41 + i) % 253).toByte))
          val ftyp = mkBox("ftyp",
            "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ be(0L))
          MediaRecord((20 + i).toLong, "video/mp4", ftyp ++ moov ++ mdat)
        }
        import s.implicits._
        s.createDataset(pngs ++ wavs ++ mp4s).toDF()
          .coalesce(1).write.mode("overwrite").parquet(path)
      }
      path
    }
  }

  // DuckDB-side byte arithmetic over hex(blob): decode() would choke on
  // non-UTF8 bytes, so fields are read as hex-digit pairs. `off` is the
  // 0-BASED byte offset; hex chars are 1-based, byte k = chars 2k+1..2k+2.
  private def hxDigit(pos: String) = s"(strpos('0123456789ABCDEF', substr(h, $pos, 1)) - 1)"
  private def byteAt(off: Int) =
    s"(${hxDigit((2 * off + 1).toString)} * 16 + ${hxDigit((2 * off + 2).toString)})"
  private def u32be(off: Int) =
    s"(${byteAt(off)} * 16777216 + ${byteAt(off + 1)} * 65536 + ${byteAt(off + 2)} * 256 + ${byteAt(off + 3)})"
  private def u32le(off: Int) =
    s"(${byteAt(off)} + ${byteAt(off + 1)} * 256 + ${byteAt(off + 2)} * 65536 + ${byteAt(off + 3)} * 16777216)"
  private def u16le(off: Int) = s"(${byteAt(off)} + ${byteAt(off + 1)} * 256)"

  /** Header decode over REAL payloads, cross-checked: Spark parses the
    * binary in [[HeaderDecoder]] (JVM byte arithmetic inside the
    * mapPartitions batch path); the oracle re-derives every field with
    * DuckDB string/hex arithmetic over the same blobs — two independent
    * parsers agreeing on real encoder output. Byte offsets in the oracle
    * assume the writers' canonical layouts (IHDR first; RIFF+fmt+data
    * with no extra chunks; ftyp+moov before mdat with v0 mvhd/tkhd) —
    * which the fixtures guarantee; the Scala decoder does a general
    * chunk/box walk and is additionally unit-tested.
    */
  private val decodeQ = QueryDef(
    "llm_multimodal_decode",
    (s, dir) => {
      import s.implicits._
      val media = s.read.parquet(MediaFixtures.ensure(s)).as[MediaRecord]
      extractFeatures(media, HeaderDecoder).toDF().orderBy("doc_id")
    },
    Some(s"""WITH t AS (
           |  SELECT doc_id, media_type, blob, hex(blob) AS h
           |  FROM read_parquet('/root/repo/fixtures/media/media_real.parquet/*.parquet'))
           |SELECT doc_id, media_type,
           |  CAST(octet_length(blob) AS INTEGER) AS n_bytes,
           |  CAST(CASE WHEN media_type = 'image/png' THEN ${u32be(16)}
           |       WHEN media_type = 'audio/wav' THEN ${u32le(24)}
           |       ELSE ${u32be(224)} // 65536 END AS INTEGER) AS width,
           |  CAST(CASE WHEN media_type = 'image/png' THEN ${u32be(20)}
           |       WHEN media_type = 'audio/wav' THEN ${u16le(22)}
           |       ELSE ${u32be(228)} // 65536 END AS INTEGER) AS height,
           |  CAST(CASE WHEN media_type = 'image/png' THEN 0
           |       WHEN media_type = 'audio/wav' THEN (${u32le(40)} * 1000) // ${u32le(28)}
           |       ELSE (${u32be(48)} * 1000) // ${u32be(44)} END AS BIGINT) AS duration_ms
           |FROM t ORDER BY doc_id""".stripMargin))

  /** Metadata query over the binary column using only engine-portable
    * functions — byte length, content hash, size bucket — the narrow
    * typed-metadata projection a 100 TB multimodal corpus materializes
    * without ever decoding payloads ([[decodeQ]] covers the decode path).
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

  val all: Seq[QueryDef] = Seq(meta, decodeQ)
}
