package graft

import org.apache.spark.sql.functions._

import graft.llm.PrivacyOps

/** PII redaction, URL canonicalization, and int8 quantization
  * properties beyond the oracle hash (which pins the happy path at
  * sf0.01): redaction completeness, URL edge shapes the derived
  * fixture column never produces, and the quantization error bound.
  */
class PrivacyOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pii redaction is complete: no email/phone/IP survives") {
    val out = SparkEntry.queries("llm_pii_redact")(spark, sf).cache()
    val n = out.count()
    assert(n > 0)
    // Every derived row carries exactly one of each PII kind.
    assert(out.filter(col("n_email") === 1 && col("n_phone") === 1 &&
      col("n_ip") === 1).count() === n)
    // And the redacted text matches none of the patterns any more.
    val leftover = out.filter(
      col("redacted").rlike(PrivacyOps.emailRe) ||
      col("redacted").rlike(PrivacyOps.phoneRe) ||
      col("redacted").rlike(PrivacyOps.ipRe))
    assert(leftover.count() === 0L)
    assert(out.filter(col("redacted").contains("<EMAIL>") &&
      col("redacted").contains("<PHONE>") &&
      col("redacted").contains("<IP>")).count() === n)
    out.unpersist()
  }

  test("url canonicalization edge shapes") {
    val urls = Seq(
      // no query, no fragment, default port, trailing slash
      "https://WWW.Example.COM:443/A/B/" -> "https://example.com/A/B",
      // only tracking params -> no '?' at all
      "http://site.org/p?utm_source=x&utm_medium=y" -> "https://site.org/p",
      // tracking param in the middle; non-utm params keep order
      "https://a.net/x?b=2&utm_c=3&a=1#frag" -> "https://a.net/x?b=2&a=1",
      // bare host, no path
      "https://Host.io" -> "https://host.io",
      // non-default port is preserved
      "https://h.co:8443/y" -> "https://h.co:8443/y")
    val df = spark.createDataFrame(urls).toDF("raw", "expected")
      .withColumn("canon", PrivacyOps.canonicalizeUrl(col("raw")))
    val bad = df.filter(col("canon") =!= col("expected")).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("int8 quantization: values in [-127,127], dequant error within bound") {
    val q = SparkEntry.queries("llm_embed_quantize")(spark, sf)
      .withColumn("qv", split(col("q8"), ",").cast("array<int>"))
    val stats = q.select(
      max(expr("array_max(transform(qv, v -> abs(v)))")).as("qmax"),
      min(expr("array_min(qv)")).as("qmin")).head()
    assert(stats.getAs[Int]("qmax") <= 127)
    // Round-trip: |q/scale - x| <= 0.5/scale (+ tiny fp slack). Uses the
    // unrounded scale recomputed from the source vectors.
    val src = graft.sources.Tables.load(spark, sf, "embeddings")
      .withColumn("maxabs",
        expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"))
    val joined = src.join(q.select(col("vec_id"), col("qv")), "vec_id")
      .withColumn("maxerr", expr(
        """array_max(zip_with(embedding, qv,
          |  (x, v) -> abs(CAST(v AS DOUBLE) / (127.0 / maxabs) - CAST(x AS DOUBLE))))""".stripMargin))
      .withColumn("bound", col("maxabs") / 254.0 * 1.0000001)
    assert(joined.filter(col("maxerr") > col("bound")).count() === 0L)
  }

  test("int8 quantization of an all-zero vector: scale 0, q8 all zeros (no NaN)") {
    import spark.implicits._
    val out = PrivacyOps.quantizeInt8(
      Seq((1L, Array(0f, 0f, 0f)), (2L, Array(0f, -2f, 1f))).toDF("vec_id", "embedding"))
      .select("vec_id", "scale_r", "q8").collect().sortBy(_.getLong(0))
    assert(out(0).getDouble(1) === 0.0)
    assert(out(0).getString(2) === "0,0,0")
    assert(out(1).getDouble(1) === 63.5)
    assert(out(1).getString(2) === "0,-127,64") // floor(63.5+0.5)=64
  }

  test("quantized top-5 retrieval recalls the exact float top-5") {
    val exact = SparkEntry.queries("llm_cosine_topk")(spark, sf)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val q8 = SparkEntry.queries("llm_cosine_topk_q8")(spark, sf)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q8.size === exact.size)
    val recall = (exact & q8).size.toDouble / exact.size
    assert(recall >= 0.8,
      f"int8 top-5 must substantially agree with float top-5, recall=$recall%.2f")
  }
}
