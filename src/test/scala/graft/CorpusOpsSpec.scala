package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the corpus-statistics rows beyond the oracle
  * hash: LM scores are proper log-probabilities, TF-IDF ranking honors
  * its contract, set ops partition correctly, and the centroid-outlier
  * scores behave like cosines.
  */
class CorpusOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("unigram LM scores are negative log-probs with sane token counts") {
    val out = SparkEntry.queries("llm_unigram_lm")(spark, sf).cache()
    val n = out.count()
    assert(n > 0)
    // log10 p < 0 for every word (no word IS the whole corpus), so the
    // weighted mean must be strictly negative; and every document's
    // token count is positive.
    assert(out.filter(col("avg_logp") >= 0 || col("n_tokens") <= 0).count() === 0L)
    // Token totals agree with the independent whitespace tokenizer row.
    val tok = SparkEntry.queries("llm_token_count")(spark, sf)
      .select(col("doc_id"), col("ws_tokens").cast("long").as("n_tokens"))
    val lm = out.select(col("doc_id"), col("n_tokens"))
    assert(lm.except(tok).count() === 0L)
    out.unpersist()
  }

  test("tfidf top-k keeps at most 3 ranked keywords per doc, scores descending") {
    val out = SparkEntry.queries("llm_tfidf_topk")(spark, sf).cache()
    assert(out.count() > 0)
    val bad = out.groupBy("doc_id")
      .agg(count(lit(1)).as("k"), max("rank").as("maxr"),
        min("rank").as("minr"))
      .filter(col("k") > 3 || col("maxr") =!= col("k") || col("minr") =!= 1)
    assert(bad.count() === 0L)
    // Within a doc, score never increases as rank increases.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("rank")
    val inc = out.withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev"))
    assert(inc.count() === 0L)
    out.unpersist()
  }

  test("intersect/except partition the 1995 cohort") {
    val out = SparkEntry.queries("u3_intersect_except")(spark, sf).cache()
    val retained = out.filter(col("op") === "retained").count()
    val churned = out.filter(col("op") === "churned").count()
    assert(retained > 0 && churned > 0)
    // retained ∪ churned = 1995 actives, disjointly.
    val y95 = graft.sources.Tables.load(spark, sf, "orders")
      .filter(year(col("o_orderdate")) === 1995)
      .select("o_custkey").distinct().count()
    assert(retained + churned === y95)
    assert(out.select("o_custkey").distinct().count() === y95)
    out.unpersist()
  }

  test("unpivot melts the four measures with full row counts") {
    val out = SparkEntry.queries("p9_unpivot")(spark, sf).cache()
    val li = graft.sources.Tables.load(spark, sf, "lineitem").count()
    assert(out.count() === 4L)
    assert(out.filter(col("n") =!= li).count() === 0L)
    out.unpersist()
  }

  test("embedding centroid outliers are a proper cosine in [-1, 1]") {
    val out = SparkEntry.queries("llm_embed_outlier")(spark, sf).cache()
    val emb = graft.sources.Tables.load(spark, sf, "embeddings").count()
    assert(out.count() === emb)
    assert(out.filter(col("cos_centroid") < -1 || col("cos_centroid") > 1).count() === 0L)
    // The flag is exactly the sign test on the rounded score.
    assert(out.filter(col("is_outlier") =!= (col("cos_centroid") < 0.0)).count() === 0L)
    // Not everything is an outlier: class means correlate with members.
    assert(out.filter(!col("is_outlier")).count() > out.filter(col("is_outlier")).count())
    out.unpersist()
  }

  test("bigram counts are exactly words-minus-one per document") {
    val out = SparkEntry.queries("llm_bigram_lm")(spark, sf).cache()
    assert(out.count() > 0)
    // Conditional log-probs are never positive.
    assert(out.filter(col("avg_logp2") > 0).count() === 0L)
    val tok = SparkEntry.queries("llm_token_count")(spark, sf)
      .select(col("doc_id"), (col("ws_tokens").cast("long") - 1).as("n_bigrams"))
      .filter(col("n_bigrams") >= 1)
    assert(out.select("doc_id", "n_bigrams").except(tok).count() === 0L)
    assert(tok.except(out.select("doc_id", "n_bigrams")).count() === 0L)
    out.unpersist()
  }

  test("char entropy is bounded by log10 of the alphabet size") {
    val out = SparkEntry.queries("llm_char_entropy")(spark, sf).cache()
    assert(out.count() > 0)
    // 0 <= H <= log10(k) for k distinct symbols (uniform maximizes), with
    // a small allowance for the per-term 1e-6 quantization.
    val bad = out.filter(col("entropy10") < 0 ||
      col("entropy10") > log10(col("distinct_chars")) + 0.001)
    assert(bad.count() === 0L)
    // Char totals agree with the raw text length.
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars_counted"))
    assert(out.select("doc_id", "n_chars_counted").except(docs).count() === 0L)
    out.unpersist()
  }

  test("mode picks the maximal count with the smallest-value tiebreak") {
    val out = SparkEntry.queries("a20_mode")(spark, sf).cache()
    val counts = graft.sources.Tables.load(spark, sf, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("c")).cache()
    val maxc = counts.groupBy("o_orderstatus").agg(max("c").as("mc"))
    // Reported count is the group max, and no tied value sorts earlier.
    val joined = out.join(maxc, "o_orderstatus")
    assert(joined.filter(col("cnt") =!= col("mc")).count() === 0L)
    val earlierTie = out.join(counts, "o_orderstatus")
      .filter(col("c") === col("cnt") && col("o_orderpriority") < col("mode_priority"))
    assert(earlierTie.count() === 0L)
    counts.unpersist(); out.unpersist()
  }

  test("pagerank keeps mass bounded and gives isolated docs exactly the base share") {
    val out = SparkEntry.queries("llm_dup_pagerank")(spark, sf).cache()
    val n = out.count()
    assert(n > 0)
    val base = 150000000000L / n
    // Isolated docs (degree 0, no inbound mass) sit exactly at the
    // damped base; every doc is at or above it.
    assert(out.filter(col("degree") === 0 && col("pr3") =!= base).count() === 0L)
    assert(out.filter(col("pr3") < base).count() === 0L)
    // Total mass: bounded above by the full 1e12 scale, below by the
    // damped base floor — mass held by isolated docs evaporates each
    // iteration by design (no dangling redistribution; see scaladoc),
    // so the total sits between base·N and 1e12.
    val total = out.agg(sum("pr3")).head.getLong(0)
    assert(total <= 1000000000000L && total >= base * n)
    // Connected docs strictly exceed the base (they receive inbound mass).
    assert(out.filter(col("degree") > 0 && col("pr3") <= base).count() === 0L)
    out.unpersist()
  }

  test("lag/lead navigation agrees with a self-join reconstruction") {
    val out = SparkEntry.queries("w9_lag_lead")(spark, sf)
      .select("user_id", "event_id", "prev_value").cache()
    // Reconstruct lag(value) independently: join each event to the
    // max-(ts,event_id) predecessor within the same user.
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val recon = ev
      .withColumn("rn", row_number().over(w))
      .as("a")
      .join(ev.withColumn("rn", row_number().over(w)).as("b"),
        col("a.user_id") === col("b.user_id") && col("a.rn") === col("b.rn") + 1,
        "left")
      .select(col("a.user_id").as("user_id"), col("a.event_id").as("event_id"),
        col("b.value").as("prev_value"))
    assert(out.except(recon).count() === 0L)
    assert(recon.except(out).count() === 0L)
    out.unpersist()
  }

  test("quality buckets respect the 30/70 quotas and score ordering") {
    val out = SparkEntry.queries("llm_quality_buckets")(spark, sf).cache()
    val n = out.count()
    // Every scored document lands in exactly one bucket.
    assert(n === SparkEntry.queries("llm_unigram_lm")(spark, sf).count())
    val head = out.filter(col("bucket") === "head").count()
    val mid = out.filter(col("bucket") === "middle").count()
    assert(head + mid < n, "tail must be non-empty on the fixture corpus")
    // All-or-nothing grid cells: quotas are upper bounds, never exceeded.
    assert(head * 10 <= n * 3, s"head=$head of $n exceeds the 30% quota")
    assert((head + mid) * 10 <= n * 7, s"head+middle=${head + mid} of $n exceeds 70%")
    assert(head > 0 && mid > 0, "fixture scores must spread across the grid")
    // Buckets are score-ordered: worst head >= best middle > ... strictly
    // at the quantized grid, so >= on the displayed 1e-4 score is safe.
    val minHead = out.filter(col("bucket") === "head").agg(min("avg_logp")).head.getDouble(0)
    val maxMid = out.filter(col("bucket") === "middle").agg(max("avg_logp")).head.getDouble(0)
    val maxTail = out.filter(col("bucket") === "tail").agg(max("avg_logp")).head.getDouble(0)
    assert(minHead > maxMid && maxMid > maxTail)
    out.unpersist()
  }
}
