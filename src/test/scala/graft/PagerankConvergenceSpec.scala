package graft

import org.apache.spark.sql.functions._

import graft.llm.DedupOps

/** Convergence + exactness regression for the iterate-until-stable
  * PageRank (`llm_dup_pagerank_conv`). The arithmetic is pure BIGINT
  * (1e12 total mass, truncating `div`, damping 85/100), so the iteration
  * is bit-deterministic: a driver-side Long replay of the identical
  * recurrence — including the lazy block schedule, which determines how
  * many rounds run past the convergence crossing — must produce EXACTLY
  * the same ranks, round count, and final L1 delta as the distributed
  * loop, not approximately. Damping contracts the summed |Δrank| (L1)
  * geometrically (the contribution operator is column-stochastic over
  * out-degreed nodes), which is what bounds rounds at
  * log(delta0/eps)/log(100/85) independent of graph size; the specs pin
  * that bound so a future edit that accidentally breaks the contraction
  * (e.g. dropping the damping from the delta path) fails loudly instead
  * of running to maxRounds on 100 TB.
  */
class PagerankConvergenceSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replay of the exact integer recurrence over an
    * undirected pair list, mirroring the distributed loop's block
    * schedule: returns (doc_id -> rank, rounds, final L1 delta).
    */
  private def replay(nDocs: Long, pairs: Seq[(Long, Long)], eps: Long,
      maxRounds: Int = 200): (Map[Long, Long], Int, Long) = {
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base = 150000000000L / nDocs
    var pr = (0L until nDocs).map(d => d -> 1000000000000L / nDocs).toMap
    var delta = Long.MaxValue
    var rounds = 0
    while (delta > eps && rounds < maxRounds) {
      val k = DedupOps.pagerankBlockRounds(delta, eps)
      var lastPrev = pr
      for (_ <- 1 to k) {
        lastPrev = pr
        val contrib = scala.collection.mutable.LongMap.empty[Long].withDefaultValue(0L)
        for ((src, dst) <- edges) contrib(dst) += lastPrev(src) / outdeg(src)
        pr = lastPrev.map { case (d, _) => d -> (base + 85L * contrib(d) / 100L) }
      }
      rounds += k
      delta = pr.map { case (d, v) => math.abs(v - lastPrev(d)) }.sum
    }
    (pr, rounds, delta)
  }

  private def run(nDocs: Long, pairs: Seq[(Long, Long)], eps: Long,
      maxRounds: Int = 200, forceDistributed: Boolean = false) = {
    val docs = (0L until nDocs).toDF("doc_id")
    val pairDf = pairs.toDF("doc_a", "doc_b")
    if (forceDistributed) {
      spark.conf.set("spark.graft.pagerankLocalMaxEdges", "0")
      try DedupOps.pagerankConvergedStats(docs, pairDf, eps, maxRounds)
      finally spark.conf.unset("spark.graft.pagerankLocalMaxEdges")
    } else DedupOps.pagerankConvergedStats(docs, pairDf, eps, maxRounds)
  }

  // A path, a triangle, and an isolated doc: mixed degrees, a dangling
  // mass sink (the isolated doc keeps only its base share).
  private val graph = Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
  private val nDocs = 8L

  test("distributed ranks exactly equal the driver-side integer replay") {
    val eps = 1000L // tight epsilon => a meaningful number of rounds
    val (df, rounds, delta) = run(nDocs, graph, eps, forceDistributed = true)
    val (expected, expRounds, expDelta) = replay(nDocs, graph, eps)
    assert(rounds === expRounds)
    assert(delta === expDelta)
    val got = df.select("doc_id", "pr").as[(Long, Long)].collect().toMap
    assert(got === expected, "BIGINT arithmetic must be bit-identical across implementations")
  }

  test("local tier agrees bit-for-bit with the distributed tier") {
    // The graph is under the default pagerankLocalMaxEdges threshold, so
    // the plain run takes the driver-side array loop; forcing the
    // threshold to 0 runs the checkpointed distributed loop on the same
    // input. Ranks, round counts, and final deltas must be identical —
    // the same tier-agreement contract as ConnectedComponentsSpec.
    val eps = 1000L
    val (ldf, lRounds, lDelta) = run(nDocs, graph, eps)
    val (ddf, dRounds, dDelta) = run(nDocs, graph, eps, forceDistributed = true)
    assert(lRounds === dRounds)
    assert(lDelta === dDelta)
    val l = ldf.select("doc_id", "n_docs", "pr", "degree")
      .as[(Long, Long, Long, Long)].collect().toSet
    val d = ddf.select("doc_id", "n_docs", "pr", "degree")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(l === d)
  }

  test("round count respects the geometric contraction bound") {
    val eps = 1000L
    val (_, rounds, delta) = run(nDocs, graph, eps)
    assert(delta <= eps)
    // Initial L1 delta <= 2x total mass (every node can at most swap its
    // full share); 85/100 damping contracts it at least geometrically,
    // so log(2e12/eps)/log(100/85) bounds the crossing round — plus up
    // to blockRounds-1 = 15 overshoot rounds from block granularity.
    val bound = math.ceil(math.log(2e12 / eps) / math.log(100.0 / 85.0)).toInt + 16
    assert(rounds <= bound,
      s"$rounds rounds exceeds the damping contraction bound $bound — is the 85/100 damping still applied?")
    assert(rounds >= 3, "eps=1000 on this graph must take several rounds — a 1-round exit means the delta test is broken")
  }

  test("degree column matches the undirected degree of each doc") {
    val (df, _, _) = run(nDocs, graph, 1000000L)
    val deg = df.select("doc_id", "degree").as[(Long, Long)].collect().toMap
    assert(deg === Map(0L -> 1L, 1L -> 2L, 2L -> 2L, 3L -> 1L,
      4L -> 2L, 5L -> 2L, 6L -> 2L, 7L -> 0L))
  }

  test("maxRounds exhaustion fails fast") {
    val e = intercept[IllegalStateException] { run(nDocs, graph, 10L, maxRounds = 1) }
    assert(e.getMessage.contains("did not converge"))
  }

  test("every rank stays within [base, total mass]") {
    val (df, _, _) = run(nDocs, graph, 1000000L)
    val base = 150000000000L / nDocs
    val bad = df.filter(col("pr") < base || col("pr") > 1000000000000L).count()
    assert(bad === 0L,
      "base share is a hard floor (every doc receives it each round) and total mass a hard ceiling")
  }

  test("many isolated docs: local tier engages on the edge guard and stays exact") {
    // docs ≫ edges — the realistic post-cleaning 100 TB shape. The edge
    // guard (6 pairs ≪ 100k default) keeps the local tier engaged; the
    // fix means only edge-participating ids (10 here) reach the driver,
    // isolated docs get the closed-form base rank distributedly, and the
    // first block's measured delta carries their init→base move — so
    // rounds, delta, and every rank must STILL match the full replay
    // bit-for-bit.
    val bigN = 50000L
    val eps = 1000L
    val (df, rounds, delta) = run(bigN, graph, eps)
    val (expected, expRounds, expDelta) = replay(bigN, graph, eps)
    assert(rounds === expRounds)
    assert(delta === expDelta)
    val base = 150000000000L / bigN
    val participating = graph.flatMap(p => Seq(p._1, p._2)).toSet
    val got = df.filter(col("doc_id") < 10 || col("pr") =!= base || col("degree") =!= 0L)
      .select("doc_id", "pr").as[(Long, Long)].collect().toMap
    // Every doc outside the filter is an isolated doc at exactly base/0,
    // and the surviving rows must match the replay entry-for-entry.
    got.foreach { case (d, pr) =>
      assert(pr === expected(d), s"doc $d")
      if (!participating.contains(d)) assert(pr === base)
    }
    assert(df.count() === bigN)
  }

  test("pairs with an endpoint outside docs are dropped by both tiers alike") {
    val noisy = graph :+ ((3L, 999L)) :+ ((998L, 997L))
    val eps = 1000L
    val (ldf, lRounds, lDelta) = run(nDocs, noisy, eps)
    val (ddf, dRounds, dDelta) = run(nDocs, noisy, eps, forceDistributed = true)
    assert(lRounds === dRounds)
    assert(lDelta === dDelta)
    val l = ldf.select("doc_id", "pr", "degree").as[(Long, Long, Long)].collect().toSet
    val d = ddf.select("doc_id", "pr", "degree").as[(Long, Long, Long)].collect().toSet
    assert(l === d)
    // The dangling edge must not resurrect doc 999 or corrupt doc 0's
    // rank (the old HashMap null-unboxing aliased missing ids to index 0).
    assert(ldf.filter(col("doc_id") > 7).count() === 0)
  }

  test("empty docs frame fails fast instead of dividing by zero") {
    val e = intercept[IllegalArgumentException] { run(0L, Seq((0L, 1L)), 1000L) }
    assert(e.getMessage.contains("empty docs"))
  }

  test("block schedule: 1 until first measurement, capped at 16, tapering near convergence") {
    assert(DedupOps.pagerankBlockRounds(Long.MaxValue, 1000L) === 1)
    assert(DedupOps.pagerankBlockRounds(1000000000000L, 1000L) === 16)
    // delta just above eps: one confirming round, not a full block.
    assert(DedupOps.pagerankBlockRounds(1100L, 1000L) === 1)
    assert(DedupOps.pagerankBlockRounds(2000L, 1000L) <= 5)
  }
}
