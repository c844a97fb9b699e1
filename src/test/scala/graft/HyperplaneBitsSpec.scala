package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Bit-exactness regression for the fused `hyperplane_bits` Catalyst
  * expression against an independent exact-arithmetic reference: the
  * driver-side BigInt fmix32 below never wraps, so it validates the
  * expression's wrap-and-mask long arithmetic (and the codegen loop,
  * bit packing, and plane-offset indexing) rather than sharing its
  * shortcuts. The band buckets — and so the candidate pair set of
  * `llm_cosine_neardup` — only stay oracle-stable if every sign bit
  * matches this reference exactly.
  */
class HyperplaneBitsSpec extends SparkSpec {
  import spark.implicits._

  /** Exact fmix32 via BigInt — no dependence on Java long wrap. */
  private def hvRef(p: Int, d: Int): Double = {
    val m32 = BigInt(1) << 32
    var h = BigInt(p * 64 + d)
    h = h ^ (h >> 16); h = (h * BigInt("85ebca6b", 16)) mod m32
    h = h ^ (h >> 13); h = (h * BigInt("c2b2ae35", 16)) mod m32
    h = h ^ (h >> 16)
    h.toDouble / 4294967296.0 * 2.0 - 1.0
  }

  private def maskRef(emb: Array[Float], planes: Int, offset: Int): Long = {
    var mask = 0L
    for (p <- 0 until planes) {
      var acc = 0.0
      for (d <- emb.indices) acc += emb(d).toDouble * hvRef(offset + p, d)
      if (acc > 0.0) mask |= 1L << p
    }
    mask
  }

  test("mask bits equal the exact-BigInt reference on the real embeddings fixture") {
    GraftFunctions.register(spark)
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val got = emb.select(col("vec_id"),
        col("embedding"), expr("hyperplane_bits(embedding, 16)").as("mask"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val e = r.getSeq[Float](1).toArray
      assert(r.getLong(2) === maskRef(e, 16, 0),
        s"mask mismatch for vec_id ${r.getLong(0)}")
    }
  }

  test("plane-offset form extracts the same bits as the flat mask") {
    GraftFunctions.register(spark)
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // band b of a 4x16 geometry computed via offset must equal bits
    // b*16..b*16+15 of the single 64-plane mask — the equivalence that
    // lets cosinePairs hash each band independently past 64 total planes.
    val bad = emb.select(
        expr("hyperplane_bits(embedding, 64)").as("m64"),
        expr("hyperplane_bits(embedding, 16, 0)").as("b0"),
        expr("hyperplane_bits(embedding, 16, 16)").as("b1"),
        expr("hyperplane_bits(embedding, 16, 32)").as("b2"),
        expr("hyperplane_bits(embedding, 16, 48)").as("b3"))
      .filter(expr(
        """(m64 & 65535) != b0 OR (shiftright(m64, 16) & 65535) != b1 OR
          |(shiftright(m64, 32) & 65535) != b2 OR (shiftright(m64, 48) & 65535) != b3""".stripMargin))
      .count()
    assert(bad === 0L)
  }

  test("offset planes beyond 64 match the exact reference (no mask ceiling)") {
    GraftFunctions.register(spark)
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50)
    val got = emb.select(col("embedding"),
        expr("hyperplane_bits(embedding, 20, 80)").as("m"))
      .collect()
    got.foreach { r =>
      val e = r.getSeq[Float](0).toArray
      assert(r.getLong(1) === maskRef(e, 20, 80))
    }
  }

  test("NULL array yields NULL; float and double element types both accepted") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Option(Array(1.0f, -2.0f, 0.5f))),
      (2L, None)
    ).toDF("id", "embedding")
    val out = df.select(col("id"), expr("hyperplane_bits(embedding, 16)").as("m"))
      .orderBy("id").collect()
    assert(!out(0).isNullAt(1))
    assert(out(1).isNullAt(1))
    // double elements take the other getter branch of the codegen
    val d = Seq(Array(0.25, -1.0, 3.0)).toDF("embedding")
      .select(expr("hyperplane_bits(embedding, 16)")).head().getLong(0)
    val f = Seq(Array(0.25f, -1.0f, 3.0f)).toDF("embedding")
      .select(expr("hyperplane_bits(embedding, 16)")).head().getLong(0)
    assert(d === f, "exact-representable values must produce identical masks across element types")
  }

  test("interpreted eval path agrees with codegen") {
    GraftFunctions.register(spark)
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp =
      try emb.select(col("vec_id"), expr("hyperplane_bits(embedding, 16, 32)").as("m"))
        .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      finally {
        spark.conf.unset("spark.sql.codegen.wholeStage")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    val gen = emb.select(col("vec_id"), expr("hyperplane_bits(embedding, 16, 32)").as("m"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(interp === gen)
  }

  test("plane count outside [1, 64] and negative offsets are rejected") {
    GraftFunctions.register(spark)
    val df = Seq(Array(1.0f)).toDF("embedding")
    intercept[Exception] { df.select(expr("hyperplane_bits(embedding, 65)")).head() }
    intercept[Exception] { df.select(expr("hyperplane_bits(embedding, 0)")).head() }
    intercept[Exception] { df.select(expr("hyperplane_bits(embedding, 16, -1)")).head() }
  }

  test("64-plane mask: low 16 bits equal the 16-plane mask; high bits populated") {
    GraftFunctions.register(spark)
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val both = emb.select(
      expr("hyperplane_bits(embedding, 64)").as("m64"),
      expr("hyperplane_bits(embedding, 16)").as("m16"))
    assert(both.filter(expr("(m64 & 65535) != m16")).count() === 0L,
      "plane p's sign bit must not depend on the total plane count")
    assert(both.filter(expr("shiftright(m64, 32) != 0")).count() > 0L,
      "planes above 32 must land in the high half of the long mask")
  }

  test("auto-scaled band width tracks the corpus count (VERDICT r7 #1)") {
    import graft.llm.SimilarityOps.autoLshBpb
    assert(autoLshBpb(0L) === 4)
    assert(autoLshBpb(500L) === 5)    // sf0.001 / sf0.01 embeddings
    assert(autoLshBpb(2000L) === 7)   // sf0.1 embeddings
    assert(autoLshBpb(256L) === 4)    // 16 buckets still fits 16/bucket
    assert(autoLshBpb(257L) === 5)    // exact boundary: ceil(257/16)=17 -> 5 bits
    assert(autoLshBpb(600000L) === 16)  // sf10p embeddings
    assert(autoLshBpb(1L << 40) === 24,
      "band width caps at 24 bits (~268M rows/band at occupancy 16); " +
        "per-band plane offsets removed the old 64-bit single-mask ceiling")
    // exact powers of two must not wobble (the float-log2 hazard the
    // integer formula avoids): ceil(log2(1024)) = 10 exactly
    assert(autoLshBpb(16384L) === 10)
  }
}
