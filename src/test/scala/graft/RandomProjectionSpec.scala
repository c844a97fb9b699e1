package graft

import org.apache.spark.sql.functions._

/** The property the oracle cannot express: signed random projection must
  * PRESERVE GEOMETRY (Johnson–Lindenstrauss / Achlioptas ±1 matrices),
  * not just reproduce deterministic arithmetic. Norms and pairwise
  * distances in the 16-d projected space must track the 64-d originals
  * within the loose-but-killing-regressions statistical bounds — a sign
  * matrix gone correlated (the round-9 Weyl-sequence lesson) collapses
  * these ratios even while the exact-arithmetic oracle stays green.
  */
class RandomProjectionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("projection preserves norms and pairwise distances statistically (JL property)") {
    val proj = SparkEntry.queries("llm_random_projection")(spark, dir)
      .groupBy("vec_id").agg(collect_list(struct(col("j"), col("proj"))).as("ps"))
      .select(col("vec_id"), expr("transform(array_sort(ps), p -> p.proj)").as("pv"))
    val orig = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val both = orig.join(proj, "vec_id").limit(64).collect().map { r =>
      (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getSeq[Double](2).toArray)
    }
    assert(both.length >= 32, "need a sample to test on")
    def norm2(v: Array[Double]) = v.map(x => x * x).sum
    // Norm preservation: E[||Px||^2] = ||x||^2; per-vector ratios stay
    // in a wide JL band and their MEAN is close to 1.
    val ratios = both.map { case (_, o, p) => norm2(p) / norm2(o) }
    assert(ratios.forall(r => r > 0.25 && r < 2.5),
      s"per-vector norm ratio out of the JL band: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean drifted from 1")
    // Pairwise distance preservation on the sample.
    val dRatios = for {
      a <- both.indices; b <- (a + 1) until both.length
      d0 = norm2(both(a)._2.zip(both(b)._2).map { case (x, y) => x - y })
      if d0 > 1e-9
      d1 = norm2(both(a)._3.zip(both(b)._3).map { case (x, y) => x - y })
    } yield d1 / d0
    val dMean = dRatios.sum / dRatios.size
    assert(dMean > 0.8 && dMean < 1.2, s"mean distance ratio $dMean drifted from 1")
    assert(dRatios.count(r => r < 0.2 || r > 5.0) == 0,
      "no pair may collapse or explode — correlated signs would do both")
  }

  test("two-stage rerank recalls the exact top-5 well above chance") {
    // sf0.01, not sf0.001: at 500 vectors the top-5 neighbor margins
    // are noise-thin and recall measures the corpus, not the cascade.
    val mdir = "/root/testdata/sf0.01"
    def pairs(name: String) =
      SparkEntry.queries(name)(spark, mdir).select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("llm_cosine_topk")
    val staged = pairs("llm_rp_rerank")
    assert(exact.size === 40)
    val recall = staged.intersect(exact).size.toDouble / exact.size
    // sf0.01 measures 0.80 with the 100-candidate coarse stage; chance
    // through a random 100-candidate filter would be ~corpus_frac. A
    // collapsed projection (correlated signs) drops this to noise.
    assert(recall >= 0.6, s"two-stage recall@5 degraded to $recall")
  }
}
