package graft

import org.apache.spark.sql.functions._

import graft.llm.Multimodal

/** Operator-shape properties (SURVEY.md §5.4) exercised over seeded value
  * grids, + the multimodal mapPartitions plumbing.
  */
class OperatorSpec extends SparkSpec {

  test("UNION ALL conforming preserves row counts (property grid)") {
    for (na <- Seq(0, 1, 13, 50); nb <- Seq(0, 7, 50)) {
      val a = spark.range(na).select(col("id"), lit(null).cast("string").as("tag"))
      val b = spark.range(nb).select(col("id"), lit("x").as("tag"))
      assert(a.unionAll(b).count() === (na + nb).toLong, s"na=$na nb=$nb")
    }
  }

  test("explode multiplicity: N rows with k-element arrays -> N*k rows") {
    for (n <- Seq(0, 1, 10); k <- Seq(1, 2, 5)) {
      val df = spark.range(n).select(sequence(lit(1), lit(k)).as("arr"))
      assert(df.select(explode(col("arr"))).count() === (n.toLong * k), s"n=$n k=$k")
    }
  }

  test("explode_outer preserves rows with NULL/empty arrays") {
    val df = spark.createDataFrame(Seq(
      (1L, Seq("a", "b")), (2L, Seq.empty[String]))).toDF("id", "arr")
      .withColumn("arr", when(col("id") === 2, lit(null).cast("array<string>"))
        .otherwise(col("arr")))
    assert(df.select(col("id"), explode_outer(col("arr"))).count() === 3L)
    val empty = spark.createDataFrame(Seq((3L, Seq.empty[String]))).toDF("id", "arr")
    assert(empty.select(col("id"), explode_outer(col("arr"))).count() === 1L)
    assert(empty.select(col("id"), explode(col("arr"))).count() === 0L)
  }

  test("window dedup keeps exactly one row per key (seeded property)") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val keys = List.fill(1 + rnd.nextInt(40))(1 + rnd.nextInt(8))
      val df = spark.createDataFrame(keys.zipWithIndex).toDF("k", "i")
      val deduped = df.withColumn("rn",
        row_number().over(Window.partitionBy("k").orderBy("i")))
        .filter(col("rn") === 1)
      assert(deduped.count() === keys.distinct.size.toLong, s"trial=$trial")
    }
  }

  /** Real encoder output, pure JDK: a wxh RGB PNG via ImageIO. */
  private def makePng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 13 + y) & 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real 16-bit PCM WAV via javax.sound: `frames` frames at `rate` Hz. */
  private def makeWav(rate: Int, channels: Int, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](frames * channels * 2)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("multimodal header decode extracts real PNG and WAV metadata") {
    import spark.implicits._
    val png = makePng(5, 3)
    val wav = makeWav(8000, 1, 800) // 1600 data bytes / 16000 B/s = 100 ms
    val media = Seq(
      graft.llm.MediaRecord(1L, "image/png", png),
      graft.llm.MediaRecord(2L, "audio/wav", wav)).toDS()
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats(0).n_bytes === png.length)
    assert((feats(0).width, feats(0).height, feats(0).duration_ms) === ((5, 3, 0L)))
    // Audio rides the int slots as (sample_rate, channels).
    assert((feats(1).width, feats(1).height, feats(1).duration_ms) === ((8000, 1, 100L)))
    // Schema carries through the Dataset encoder.
    val df = Multimodal.extractFeatures(media).toDF()
    assert(df.schema.fieldNames.toSeq ===
      Seq("doc_id", "media_type", "n_bytes", "width", "height", "duration_ms"))
    // Dispatch is on magic bytes: a lying media_type must not flip the parser.
    val lied = Seq(graft.llm.MediaRecord(3L, "audio/wav", png)).toDS()
    assert(Multimodal.extractFeatures(lied).collect().head.width === 5)
    // Garbage fails loudly through decode, quietly through tryDecode.
    assert(graft.llm.HeaderDecoder.tryDecode("image/png", "hello".getBytes("UTF-8")).isEmpty)
    intercept[IllegalArgumentException] {
      graft.llm.HeaderDecoder.decode("image/png", "hello".getBytes("UTF-8"))
    }
  }

  test("multimodal header decode walks real MP4 boxes: v0, v1, and mdat-first layouts") {
    def be32(vs: Long*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
      vs.foreach(v => bb.putInt(v.toInt)); bb.array()
    }
    def be64(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putLong(v).array()
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ typ.getBytes("US-ASCII") ++ body
    val unity = Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0L))
    def mvhd0(ts: Long, dur: Long) = box("mvhd",
      be32(Seq(0L, 0L, 0L, ts, dur, 0x00010000L, 0x01000000L, 0L, 0L) ++ unity ++
        Seq(0L, 0L, 0L, 0L, 0L, 0L, 2L): _*))
    def tkhd0(w: Long, h: Long, dur: Long) = box("tkhd",
      be32(Seq(7L, 0L, 0L, 1L, 0L, dur, 0L, 0L, 0L, 0L) ++ unity ++
        Seq(w << 16, h << 16): _*))
    val mdat = box("mdat", Array.fill(100)(42.toByte))

    // v0, canonical order: 90000-tick timescale, 7 s of ticks.
    val v0 = ftyp ++ box("moov", mvhd0(90000L, 630000L) ++ box("trak", tkhd0(1280L, 720L, 630000L))) ++ mdat
    assert(graft.llm.HeaderDecoder.decode("video/mp4", v0) === ((1280, 720, 7000L)))

    // mdat BEFORE moov (streaming-unfriendly but legal): the general box
    // walk must find moov regardless of position.
    val mdatFirst = ftyp ++ mdat ++ box("moov", mvhd0(1000L, 2500L) ++ box("trak", tkhd0(320L, 240L, 2500L)))
    assert(graft.llm.HeaderDecoder.decode("video/mp4", mdatFirst) === ((320, 240, 2500L)))

    // v1 mvhd/tkhd: 64-bit times; duration past 2^32 ticks.
    val bigDur = 0x100000000L + 90000L // 2^32 + 1 s of 90k ticks
    val mvhd1 = box("mvhd",
      be32(0x01000000L) ++ be64(0L) ++ be64(0L) ++ be32(90000L) ++ be64(bigDur) ++
        be32(Seq(0x00010000L, 0x01000000L, 0L, 0L) ++ unity ++
          Seq(0L, 0L, 0L, 0L, 0L, 0L, 2L): _*))
    val tkhd1 = box("tkhd",
      be32(0x01000007L) ++ be64(0L) ++ be64(0L) ++ be32(1L, 0L) ++ be64(bigDur) ++
        be32(Seq(0L, 0L, 0L, 0L) ++ unity ++ Seq(640L << 16, 480L << 16): _*))
    val v1 = ftyp ++ box("moov", mvhd1 ++ box("trak", tkhd1)) ++ mdat
    assert(graft.llm.HeaderDecoder.decode("video/mp4", v1) ===
      ((640, 480, bigDur * 1000L / 90000L)))

    // ftyp with no moov anywhere: honest failure, None through tryDecode.
    intercept[IllegalArgumentException] {
      graft.llm.HeaderDecoder.decode("video/mp4", ftyp ++ mdat)
    }
    assert(graft.llm.HeaderDecoder.tryDecode("video/mp4", ftyp ++ mdat).isEmpty)
  }

  test("multimodal decoder is pluggable and open/close bracket each partition") {
    import spark.implicits._
    val opens = spark.sparkContext.longAccumulator("opens")
    val closes = spark.sparkContext.longAccumulator("closes")
    val decodes = spark.sparkContext.longAccumulator("decodes")
    class CountingDecoder extends graft.llm.MediaDecoder {
      override def open(): Unit = opens.add(1)
      def decode(mediaType: String, blob: Array[Byte]): (Int, Int, Long) = {
        decodes.add(1); (320, 240, 1000L)
      }
      override def close(): Unit = closes.add(1)
    }
    val media = Seq.tabulate(8)(i =>
      graft.llm.MediaRecord(i.toLong, "image/png", Array.fill(i)(i.toByte)))
      .toDS().repartition(2)
    val feats = Multimodal.extractFeatures(media, new CountingDecoder).collect()
    assert(feats.forall(f => f.width === 320 && f.height === 240 && f.duration_ms === 1000L))
    assert(decodes.value === 8L)           // one decode per row
    assert(opens.value === 2L)             // one init per partition, not per row
    assert(closes.value === opens.value)   // every open matched by a close

    // Early termination (limit stops pulling the iterator mid-partition):
    // the task-completion listener must still close every opened decoder.
    opens.reset(); closes.reset(); decodes.reset()
    Multimodal.extractFeatures(media, new CountingDecoder).limit(3).collect()
    assert(opens.value > 0L)
    assert(closes.value === opens.value,
      "close must fire on early termination, not only on exhaustion")
  }

  test("approx_count_distinct tracks the exact count within its rsd bound") {
    val ev = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "events")
    val both = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    both.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: exact=$e approx=$a")
    }
  }

  test("multimodal frame-sample fans out deterministic slices; resize caps dimensions") {
    import spark.implicits._
    val payload = (0 until 100).map(_.toByte).toArray
    val media = Seq(
      graft.llm.MediaRecord(1L, "video/mp4", payload),
      graft.llm.MediaRecord(2L, "video/mp4", Array.emptyByteArray)).toDS()
    val frames = Multimodal.sampleFrames(media, 4).collect().sortBy(f => (f.doc_id, f.frame_idx))
    assert(frames.map(_.doc_id).toSet === Set(1L)) // empty payload yields no frames
    assert(frames.length === 4)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 1, 2, 3))
    // Slices tile the payload without overlap, in order.
    assert(frames.flatMap(_.frame_bytes).take(100).toSeq === payload.take(100).toSeq)
    // An untimeable container gets offset 0 on every frame.
    assert(frames.map(_.offset_ms).toSeq === Seq(0L, 0L, 0L, 0L))

    // A decodable WAV spaces offsets evenly across its real duration.
    val wav = Seq(graft.llm.MediaRecord(3L, "audio/wav", makeWav(8000, 1, 800))).toDS()
    val wframes = Multimodal.sampleFrames(wav, 4).collect().sortBy(_.frame_idx)
    assert(wframes.map(_.offset_ms).toSeq === Seq(0L, 25L, 50L, 75L))

    val feats = Multimodal.extractFeatures(
      Seq(graft.llm.MediaRecord(4L, "image/png", makePng(100, 40))).toDS())
    val resized = Multimodal.resize(feats, 64).collect()
    assert(resized.head.width === 64)
    assert(resized.head.height === 25) // 40 * 64/100, floored
  }

  test("winnowing locality: docs sharing a >= k+w-1 substring share a fingerprint") {
    import graft.llm.TextOps
    val rnd = new scala.util.Random(23)
    def randText(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val guarantee = TextOps.winnowK + TextOps.winnowW - 1 // 11 chars
    for (trial <- 1 to 20) {
      val shared = randText(guarantee + rnd.nextInt(20))
      val a = randText(rnd.nextInt(40)) + shared + randText(rnd.nextInt(40))
      val b = randText(rnd.nextInt(40)) + shared + randText(rnd.nextInt(40))
      val fa = TextOps.winnowFingerprint(a)._2.toSet
      val fb = TextOps.winnowFingerprint(b)._2.toSet
      assert(fa.intersect(fb).nonEmpty,
        s"trial=$trial: the published winnowing guarantee (shared substring of " +
          s"length >= $guarantee contributes a shared fingerprint) must hold")
    }
    // Degenerate inputs: empty / null / shorter than k.
    assert(TextOps.winnowFingerprint("")._2.isEmpty)
    assert(TextOps.winnowFingerprint(null)._2.isEmpty)
    assert(TextOps.winnowFingerprint("short")._1 === 0)
  }

  test("resizeImages re-encodes real pixels into the bounded box") {
    import spark.implicits._
    val media = Seq(
      graft.llm.MediaRecord(1L, "image/png", makePng(100, 40)),
      graft.llm.MediaRecord(2L, "image/png", makePng(10, 10)), // already small
      graft.llm.MediaRecord(3L, "audio/wav", makeWav(8000, 1, 800))).toDS()
    val out = Multimodal.resizeImages(media, 64).collect().sortBy(_.doc_id)
    // The resized payload is a REAL new PNG: header-decode proves it.
    val (w, h, _) = graft.llm.HeaderDecoder.decode("image/png", out(0).blob)
    assert((w, h) === ((64, 25)))
    // Already-bounded and non-image payloads pass through byte-identical.
    assert(out(1).blob.toSeq === makePng(10, 10).toSeq)
    assert(out(2).blob.length === makeWav(8000, 1, 800).length)
  }

  test("train/val/test split is ~90/5/5 and every doc lands in exactly one") {
    val out = SparkEntry.queries("llm_train_split")(spark, "/root/testdata/sf0.01")
      .groupBy("split").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = out.values.sum
    assert(out.keySet === Set("train", "val", "test"))
    assert(total === 500L, "every document must land in exactly one split")
    // e6/100 ≈ 0.898, (f3-e6)/100 ≈ 0.051 — allow sampling noise on 500 docs.
    assert(out("train") > total * 0.85 && out("train") < total * 0.94)
    assert(out("val") > 0 && out("test") > 0)
  }

  test("ngram top-k is rank-consistent: counts descend, ties lexicographic") {
    val rows = SparkEntry.queries("llm_ngram_topk")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.length === 20)
    assert(rows.map(_._1).toSeq === (1 to 20))
    rows.sliding(2).foreach { case Array((_, t1, n1), (_, t2, n2)) =>
      assert(n1 > n2 || (n1 === n2 && t1 < t2), s"($t1,$n1) before ($t2,$n2)")
    }
  }
}
