package graft

import org.apache.spark.sql.functions._

import graft.llm.DedupOps

/** O(log n) convergence regression for the alternating large-star/
  * small-star connected components (Kiveris et al., SoCC 2014). The
  * killer property is that round count scales with log(n), NOT graph
  * diameter: a min-label-propagation implementation (the algorithm this
  * one replaced) needs ~n rounds on an n-node chain, which at 100 TB is
  * the difference between ~a dozen shuffles and thousands.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Path graph 0-1-2-...-(n-1): the worst case for diameter-bound
    * algorithms (diameter = n-1), component minimum 0.
    */
  private def chain(n: Int) =
    (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")

  /** Force the DISTRIBUTED tier (threshold 0) — these tests pin the
    * large-star/small-star loop, not the small-graph union-find.
    */
  private def distributed[A](body: => A): A = {
    spark.conf.set("spark.graft.ccLocalMaxEdges", "0")
    try body finally spark.conf.unset("spark.graft.ccLocalMaxEdges")
  }

  test("1000-node chain converges in O(log n) rounds, all labels = component min") {
    val (labels, rounds) = distributed(DedupOps.connectedComponentsStats(chain(1000)))
    assert(rounds >= 1, "threshold 0 must engage the distributed loop")
    assert(rounds <= 12,
      s"chain/1000 took $rounds rounds — large-star/small-star must be O(log n), not O(diameter)")
    val rows = labels.collect()
    assert(rows.length === 1000)
    assert(rows.forall(_.getLong(1) == 0L),
      "every node of a connected graph must label with the component minimum")
  }

  test("a single edge resolves in one round") {
    val (labels, rounds) = distributed(DedupOps.connectedComponentsStats(
      Seq((7L, 3L)).toDF("doc_a", "doc_b")))
    assert(rounds === 1)
    assert(labels.orderBy("doc_id").as[(Long, Long)].collect()
      === Array((3L, 3L), (7L, 3L)))
  }

  test("disjoint components each get their own minimum") {
    val pairs = (chain(50): org.apache.spark.sql.DataFrame)
      .unionAll(chain(50).select(col("doc_a") + 1000, col("doc_b") + 1000))
    val (labels, _) = distributed(DedupOps.connectedComponentsStats(pairs))
    val byLabel = labels.groupBy("canonical_id").count()
      .as[(Long, Long)].collect().toMap
    assert(byLabel === Map(0L -> 50L, 1000L -> 50L))
  }

  test("maxRounds exhaustion fails fast instead of looping forever") {
    val e = intercept[IllegalStateException] {
      distributed(DedupOps.connectedComponentsStats(chain(1000), maxRounds = 1))
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("small-graph tier (driver union-find) agrees with the distributed loop") {
    // A mixed graph: two chains, a star, an isolated edge.
    val pairs = (chain(40): org.apache.spark.sql.DataFrame)
      .unionAll(chain(30).select(col("doc_a") + 500, col("doc_b") + 500))
      .unionAll(Seq((900L, 901L), (900L, 902L), (900L, 903L), (950L, 951L))
        .toDF("doc_a", "doc_b"))
    val (localL, localRounds) = DedupOps.connectedComponentsStats(pairs)
    assert(localRounds === 0, "under the threshold the local tier must engage")
    val (distL, _) = distributed(DedupOps.connectedComponentsStats(pairs))
    val l = localL.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val d = distL.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(l === d, "both tiers must produce identical labelings")
  }
}
