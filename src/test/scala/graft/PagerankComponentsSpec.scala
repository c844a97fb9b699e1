package graft

import org.apache.spark.sql.functions._

import graft.llm.DedupOps

/** Semantics pins for the component-partitioned PageRank
  * (`llm_dup_pagerank_comp`): with uniform teleport the recurrence is
  * block-diagonal over connected components, so per-component in-task
  * solves must (a) coincide BIT-FOR-BIT with the global
  * round-synchronized loop on a connected graph with no isolated docs
  * (identical block schedule, identical integer arithmetic), (b) agree
  * within the eps tolerance on multi-component graphs (each component
  * stops on its OWN L1 delta, at least as converged as the global
  * stop), (c) give isolated docs the closed-form base share exactly,
  * and (d) route oversized components through the distributed loop
  * with the CORPUS-global teleport share, keeping per-task memory
  * bounded by the conf.
  */
class PagerankComponentsSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1000000L

  private def components(nDocs: Long, pairs: Seq[(Long, Long)]) =
    DedupOps.pagerankComponents(
      (0L until nDocs).toDF("doc_id"), pairs.toDF("doc_a", "doc_b"), eps)

  private def global(nDocs: Long, pairs: Seq[(Long, Long)]) =
    DedupOps.pagerankConvergedStats(
      (0L until nDocs).toDF("doc_id"), pairs.toDF("doc_a", "doc_b"), eps)._1

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
    df.select("doc_id", "pr", "degree").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("connected graph, no isolated docs: bit-identical to the global loop") {
    // a 6-node connected graph with a hub and a tail
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (3L, 4L), (4L, 5L), (1L, 2L))
    val got = ranks(components(6, pairs))
    val want = ranks(global(6, pairs))
    assert(got === want, "single-component solve must replay the global schedule exactly")
  }

  test("multi-component graph: within-eps agreement, exact degrees, exact isolated base") {
    // three components of different shapes + 4 isolated docs
    val pairs = Seq(
      (0L, 1L), (1L, 2L), (0L, 2L),          // triangle
      (3L, 4L),                              // pair
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L) // 4-cycle
    )
    val n = 13L
    val got = ranks(components(n, pairs))
    val want = ranks(global(n, pairs))
    assert(got.keySet === want.keySet)
    got.foreach { case (d, (pr, deg)) =>
      assert(deg === want(d)._2, s"degree mismatch for doc $d")
      assert(math.abs(pr - want(d)._1) <= eps,
        s"rank drift ${math.abs(pr - want(d)._1)} > eps for doc $d")
    }
    val base = 150000000000L / n
    (9L until 13L).foreach { d =>
      assert(got(d) === ((base, 0L)), s"isolated doc $d must take the closed-form base share")
    }
    // (No total-mass check: without dangling-mass redistribution the
    // fixed point does NOT sum to 1e12 when isolated docs exist — they
    // sit at the base share. The within-eps agreement against the
    // global loop above is the value pin.)
  }

  test("oversized components route to the distributed loop with the corpus-global share") {
    // force EVERY component over the threshold: results must still agree
    // with the default-conf per-component solves within eps, and the
    // isolated doc must still get the global-n base (the nOverride —
    // without it the subgraph's smaller n would inflate every rank).
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L))
    val n = 6L
    val dflt = ranks(components(n, pairs))
    spark.conf.set("spark.graft.pagerankLocalMaxEdges", "1")
    val forced =
      try ranks(components(n, pairs))
      finally spark.conf.unset("spark.graft.pagerankLocalMaxEdges")
    assert(forced.keySet === dflt.keySet)
    forced.foreach { case (d, (pr, deg)) =>
      assert(deg === dflt(d)._2)
      assert(math.abs(pr - dflt(d)._1) <= eps, s"routing changed doc $d beyond tolerance")
    }
    val base = 150000000000L / n
    assert(forced(5L) === ((base, 0L)))
    assert(dflt(5L) === ((base, 0L)))
  }

  test("conv sampling: K-heaviest cross-check agrees with the full loop; full is the escape hatch") {
    // The llm_dup_pagerank_conv row's bounded form: the global block
    // loop runs on the K heaviest components only, the rest solves
    // through pagerankComponents at the corpus-global share. Ranks must
    // agree within eps with the whole-graph loop, degrees exactly, and
    // the sampled loop's delta must still certify convergence.
    val pairs = Seq(
      (0L, 1L), (1L, 2L), (0L, 2L), (2L, 9L), (9L, 10L), // 5-node comp (heaviest)
      (3L, 4L),                                          // pair
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L))            // 4-cycle
    val n = 13L
    val docs = (0L until n).toDF("doc_id")
    val pdf = pairs.toDF("doc_a", "doc_b")
    val want = ranks(DedupOps.pagerankConvergedStats(docs, pdf, eps)._1)
    spark.conf.set("spark.graft.pagerankConvSampleComponents", "1")
    val (got, delta) =
      try {
        val (r, d) = DedupOps.pagerankConvSampled(docs, pdf, eps)
        (ranks(r), d)
      } finally spark.conf.unset("spark.graft.pagerankConvSampleComponents")
    assert(delta <= eps, "the sampled loop must still converge")
    assert(got.keySet === want.keySet, "every doc must be ranked")
    got.foreach { case (d, (pr, deg)) =>
      assert(deg === want(d)._2, s"degree mismatch for doc $d")
      assert(math.abs(pr - want(d)._1) <= eps, s"rank drift beyond eps for doc $d")
    }
    val base = 150000000000L / n
    (11L until 13L).foreach(d => assert(got(d) === ((base, 0L))))
    // full / auto-at-small-scale: identical to the plain global loop.
    spark.conf.set("spark.graft.pagerankConvSampleComponents", "full")
    val fullGot =
      try ranks(DedupOps.pagerankConvSampled(docs, pdf, eps)._1)
      finally spark.conf.unset("spark.graft.pagerankConvSampleComponents")
    assert(fullGot === want)
    assert(ranks(DedupOps.pagerankConvSampled(docs, pdf, eps)._1) === want,
      "auto below the driver tier keeps the exact historical behavior")
  }
}
