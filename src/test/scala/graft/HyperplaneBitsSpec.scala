package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Bit-exactness regression for the fused `hyperplane_bits` Catalyst
  * expression against the interpreted transform/aggregate HOF
  * formulation it replaced on the LSH banding hot path: the band buckets
  * (and so the candidate pair set of `llm_cosine_neardup`) only stay
  * oracle-stable if every sign bit matches the sequential-fold
  * semantics exactly.
  */
class HyperplaneBitsSpec extends SparkSpec {
  import spark.implicits._

  // The HOF formulation the expression replaced, verbatim from round 6.
  private val hofBits =
    """transform(sequence(0, 15), p ->
      |  CASE WHEN aggregate(sequence(0, size(embedding) - 1), CAST(0.0 AS DOUBLE),
      |    (acc, d) -> acc + CAST(embedding[d] AS DOUBLE) *
      |      ((CAST((p * 64 + d) * 2654435761 % 1000003 AS DOUBLE) / 1000003.0) * 2.0 - 1.0)
      |  ) > 0.0 THEN 1 ELSE 0 END)""".stripMargin

  test("mask bits equal the interpreted HOF fold on the real embeddings fixture") {
    GraftFunctions.register(spark)
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val both = emb.select(
      expr("hyperplane_bits(embedding, 16)").as("mask"),
      expr(hofBits).as("bits"))
    val bad = both.filter(expr(
      "exists(sequence(0, 15), p -> (shiftright(mask, p) & 1) != bits[p])")).count()
    assert(bad === 0L, "every plane's sign bit must match the HOF fold bit-for-bit")
  }

  test("nibble extraction equals the positional band hash of the HOF version") {
    GraftFunctions.register(spark)
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val bad = emb.select(
        expr("hyperplane_bits(embedding, 16)").as("mask"),
        expr(hofBits).as("bits"))
      .select(explode(sequence(lit(0), lit(3))).as("b"), col("mask"), col("bits"))
      .filter(expr(
        "(shiftright(mask, b * 4) & 15) != bits[b*4] + bits[b*4+1]*2 + bits[b*4+2]*4 + bits[b*4+3]*8"))
      .count()
    assert(bad === 0L)
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
      try emb.select(col("vec_id"), expr("hyperplane_bits(embedding, 16)").as("m"))
        .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      finally {
        spark.conf.unset("spark.sql.codegen.wholeStage")
        spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    val gen = emb.select(col("vec_id"), expr("hyperplane_bits(embedding, 16)").as("m"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(interp === gen)
  }

  test("plane count outside [1, 64] is rejected") {
    GraftFunctions.register(spark)
    val df = Seq(Array(1.0f)).toDF("embedding")
    intercept[Exception] { df.select(expr("hyperplane_bits(embedding, 65)")).head() }
    intercept[Exception] { df.select(expr("hyperplane_bits(embedding, 0)")).head() }
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
    assert(autoLshBpb(1L << 40) === 16, "band width caps at the 64-bit mask ceiling")
    // exact powers of two must not wobble (the float-log2 hazard the
    // integer formula avoids): ceil(log2(1024)) = 10 exactly
    assert(autoLshBpb(16384L) === 10)
  }
}
