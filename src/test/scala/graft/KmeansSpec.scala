package graft

import org.apache.spark.sql.functions._

import graft.llm.SimilarityOps

/** The deterministic k-means rows: Lloyd-objective monotonicity across
  * rounds (the defining property of the algorithm — each update+assign
  * pass cannot increase the summed within-cluster distance; BIGINT
  * truncation in the centroid update perturbs at the 1e-6 element
  * scale, far below any distance gap), full-coverage assignment, and
  * cluster-id bounds.
  */
class KmeansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("SSE is non-increasing across Lloyd rounds") {
    val sse = (1 to 3).map { r =>
      SimilarityOps.kmeansRounds(spark, dir, r)
        .agg(sum("dist")).collect()(0).getLong(0)
    }
    assert(sse(1) <= sse(0), s"round2 SSE ${sse(1)} > round1 ${sse(0)}")
    assert(sse(2) <= sse(1), s"round3 SSE ${sse(2)} > round2 ${sse(1)}")
  }

  test("every vector is assigned exactly once, to a cluster in [0, 8)") {
    val out = SimilarityOps.kmeansRounds(spark, dir, 3)
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.count() === n)
    assert(out.select(countDistinct("vec_id")).collect()(0).getLong(0) === n)
    val cl = out.select(min("cluster"), max("cluster")).collect()(0)
    assert(cl.getInt(0) >= 0 && cl.getInt(1) <= 7)
    assert(out.filter(col("dist") < 0).count() === 0)
  }
}
