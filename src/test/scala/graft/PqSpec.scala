package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.SimilarityOps

/** Product-quantization ADC quality: recall@5 against exact quantized
  * squared-L2 top-5, on both fixture scales. The pipeline is fully
  * deterministic, so the measured recall is a constant of the data.
  * The fixture embeddings are near-isotropic random vectors — PQ's
  * adversarial case (no manifold for the codebooks to exploit), so the
  * meaningful pin is a large multiple of the RANDOM-guess baseline
  * (5/(N−1) ≈ 1–2%), not a production-grade absolute: it proves the
  * ADC table-sum ranking carries real distance signal end-to-end.
  * Measured at change time: 0.225 (sf0.001, random 0.102×…) and 0.30
  * (sf0.01) — 10×+ the baseline at both scales.
  */
class PqSpec extends SparkSpec {

  private def recallAt5(dir: String): Double = {
    val adc = SimilarityOps.pqAdc(spark, dir).select("query_id", "item_id")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))").as("qx"))
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("qx").as("qq"))
    val exact = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("d",
        expr("aggregate(zip_with(qx, qq, (x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d"), col("vec_id"))))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("vec_id").as("item_id"))
    val hits = adc.join(exact, Seq("query_id", "item_id")).count()
    hits.toDouble / exact.count()
  }

  private def randomBaseline(dir: String): Double = {
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    5.0 / (n - 1)
  }

  test("ADC recall@5 is 10x the random-guess baseline at sf0.001") {
    val r = recallAt5("/root/testdata/sf0.001")
    val base = randomBaseline("/root/testdata/sf0.001")
    info(s"recall@5 sf0.001 = $r (random baseline $base)")
    assert(r >= 10 * base, s"recall $r under 10x random baseline $base")
  }

  test("ADC recall@5 is 10x the random-guess baseline at sf0.01") {
    val r = recallAt5("/root/testdata/sf0.01")
    val base = randomBaseline("/root/testdata/sf0.01")
    info(s"recall@5 sf0.01 = $r (random baseline $base)")
    assert(r >= 10 * base, s"recall $r under 10x random baseline $base")
  }

  test("incremental PQ maintenance is idempotent: replaying the delta batch is a no-op") {
    val dir = "/root/testdata/sf0.01"
    val tmp = java.nio.file.Files.createTempDirectory("graft-pqinc-test").toString
    spark.conf.set("spark.graft.pqIncRoot", tmp)
    try {
      val root = SimilarityOps.PqIndex.ensureIncremental(spark, dir)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val codes0 = spark.read.parquet(s"$root/codes")
        .select("vec_id", "m", "cluster").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(codes0.map(_._1).size === emb.count(),
        "every vector must be encoded after the incremental build")
      val cut = emb.agg(expr("(max(vec_id) * 9) div 10").as("c")).head().getLong(0)
      SimilarityOps.PqIndex.addVectors(spark, emb.filter(col("vec_id") >= cut), root)
      val codes1 = spark.read.parquet(s"$root/codes")
        .select("vec_id", "m", "cluster").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(codes1 === codes0, "replaying an already-encoded batch must not move codes")
    } finally {
      spark.conf.unset("spark.graft.pqIncRoot")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
