package graft

import org.apache.spark.sql.functions._

/** The LSH hot-bucket dial (`spark.graft.lshMaxBucketRows`, round 13):
  * band buckets larger than the cap emit STAR candidate edges (c−1)
  * around the bucket's min doc instead of the C(c,2) clique — the
  * Zipf-duplicate-class deployment dial. Default off must keep the
  * candidate set byte-identical; on, connectivity through a hot bucket
  * must survive (a star spans its bucket) while the pair count drops
  * to linear.
  */
class LshBucketCapSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("default off: the candidate pair set is the exact clique semantics") {
    val base = graft.llm.DedupOps.candidatePairs(spark, dir).collect().toSet
    spark.conf.set("spark.graft.lshMaxBucketRows", "0")
    try {
      val off = graft.llm.DedupOps.candidatePairs(spark, dir).collect().toSet
      assert(off === base)
    } finally spark.conf.unset("spark.graft.lshMaxBucketRows")
  }

  test("cap on: hot buckets contribute linear star edges; connectivity is preserved") {
    val base = graft.llm.DedupOps.candidatePairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.graft.lshMaxBucketRows", "2")
    try {
      val capped = graft.llm.DedupOps.candidatePairs(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // The capped candidate set is a SUBSET of the clique set (stars
      // never invent pairs) and is never larger.
      assert(capped.subsetOf(base),
        s"capped pairs invented edges: ${(capped -- base).take(5)}")
      // Connectivity: union-find closure over capped edges equals the
      // closure over clique edges — a star spans every bucket it caps.
      def components(edges: Set[(Long, Long)]): Map[Long, Long] = {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        parent.keys.map(k => k -> find(k)).toMap
      }
      assert(components(capped) === components(base),
        "capping changed the candidate-graph closure")
    } finally spark.conf.unset("spark.graft.lshMaxBucketRows")
  }

  test("rankEdgeCap auto policy: exact at oracle scale, 1024-star-capped above 2^17 docs, explicit 0 forces exact") {
    import graft.llm.DedupOps.rankEdgeCap
    // auto (default): below the corpus threshold the global conf rules
    // (0 = exact), above it the 1024 guard engages (sized so worst
    // sub-cap cliques stay inside the 16M in-task component tier).
    assert(rankEdgeCap(spark, 10000L) === 0L)
    assert(rankEdgeCap(spark, (1L << 17)) === 0L)
    assert(rankEdgeCap(spark, (1L << 17) + 1) === 1024L)
    // An explicit global lsh cap composes: honored below, tightens above.
    spark.conf.set("spark.graft.lshMaxBucketRows", "100")
    try {
      assert(rankEdgeCap(spark, 10000L) === 100L)
      assert(rankEdgeCap(spark, 1000000L) === 100L)
    } finally spark.conf.unset("spark.graft.lshMaxBucketRows")
    // Explicit pagerank conf wins over auto — including 0 = published
    // exact cliques at any scale.
    spark.conf.set("spark.graft.pagerankMaxBucketRows", "0")
    try assert(rankEdgeCap(spark, 100000000L) === 0L)
    finally spark.conf.unset("spark.graft.pagerankMaxBucketRows")
    spark.conf.set("spark.graft.pagerankMaxBucketRows", "17")
    try assert(rankEdgeCap(spark, 10L) === 17L)
    finally spark.conf.unset("spark.graft.pagerankMaxBucketRows")
  }
}
