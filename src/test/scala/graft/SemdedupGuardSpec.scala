package graft

import org.apache.spark.sql.functions._

import graft.llm.SimilarityOps

/** The SemDeDup cluster-size guard (VERDICT r12 #6): oversized clusters
  * sub-split along their max-variance dimension at the median until
  * every cluster fits `spark.graft.semdedupMaxClusterRows`, bounding
  * the within-cluster pairwise stage at ~maxRows² per cluster. Default
  * off; splitting must preserve membership and only SUBDIVIDE (each
  * capped cluster maps back to exactly one original cluster).
  */
class SemdedupGuardSpec extends SparkSpec {

  private def synth(hot: Int, cold: Int) = {
    import spark.implicits._
    // One hot cluster (0) with `hot` members, one cold (1) with `cold`.
    // qx values vary per vector so every split dimension is non-degenerate.
    val rows = (0 until hot).map(i =>
      (i.toLong, 0, 100L + i, Seq(i.toLong, (i * 7 % 997).toLong, 5L))) ++
      (0 until cold).map(i =>
        (10000L + i, 1, 50L + i, Seq(-i.toLong, (i * 13 % 31).toLong, -9L)))
    val asg = rows.map(r => (r._1, r._2, r._3)).toDF("vec_id", "cluster", "dist")
    val emb = rows.map(r => (r._1, r._4)).toDF("vec_id", "qx")
    (asg, emb)
  }

  test("capClusters bounds every cluster at maxRows, preserves membership and dist") {
    val (asg, emb) = synth(hot = 1000, cold = 50)
    val capped = SimilarityOps.capClusters(spark, asg, emb, maxRows = 100)
    val sizes = capped.groupBy("cluster").count().collect().map(_.getLong(1))
    assert(sizes.max <= 100,
      s"a cluster of ${sizes.max} rows survived the 100-row cap")
    // Same vectors, same dists — the guard only relabels clusters.
    val before = asg.select("vec_id", "dist").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val after = capped.select("vec_id", "dist").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before)
    // Subdivision only: every capped cluster's members came from ONE
    // original cluster (no merging across kmeans clusters).
    val mixed = capped.join(asg.select(col("vec_id"), col("cluster").as("orig")), "vec_id")
      .groupBy("cluster").agg(countDistinct("orig").as("n"))
      .filter(col("n") > 1).count()
    assert(mixed === 0L, "a capped cluster mixed members of two original clusters")
  }

  test("capClusters is a no-op below the cap and tolerates degenerate clusters") {
    import spark.implicits._
    val (asg, emb) = synth(hot = 50, cold = 20)
    val capped = SimilarityOps.capClusters(spark, asg, emb, maxRows = 100)
    assert(capped.select("vec_id", "cluster", "dist").collect().toSet ===
      asg.select(col("vec_id"), col("cluster").cast("long"), col("dist")).collect().toSet)
    // A degenerate oversized cluster (every vector identical) cannot
    // split; the guard must return rather than loop.
    val dAsg = (0 until 300).map(i => (i.toLong, 0, 1L)).toDF("vec_id", "cluster", "dist")
    val dEmb = (0 until 300).map(i => (i.toLong, Seq(7L, 7L))).toDF("vec_id", "qx")
    val dOut = SimilarityOps.capClusters(spark, dAsg, dEmb, maxRows = 100)
    assert(dOut.count() === 300L)
    assert(dOut.select("cluster").distinct().count() === 1L)
  }

  test("auto default: the guard stays OFF below 2^16 vectors (oracle scales) and an explicit 0 forces off") {
    // At fixture scale the auto threshold must not engage: the row's
    // output with the default conf equals the output with the guard
    // explicitly forced off.
    val dir = "/root/testdata/sf0.001"
    spark.conf.unset("spark.graft.semdedupMaxClusterRows")
    val auto = SparkEntry.queries("llm_semdedup_kmeans")(spark, dir).collect().toSeq
    spark.conf.set("spark.graft.semdedupMaxClusterRows", "0")
    try {
      val off = SparkEntry.queries("llm_semdedup_kmeans")(spark, dir).collect().toSeq
      assert(auto === off, "auto engaged below the 2^16-vector threshold")
    } finally spark.conf.unset("spark.graft.semdedupMaxClusterRows")
  }

  test("the guard conf bounds the semdedup pair stage without changing the keep contract shape") {
    // Run the full row on the fixture with an aggressively low cap: it
    // must still produce one keep per group and cover every vector.
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.graft.semdedupMaxClusterRows", "8")
    try {
      val out = SparkEntry.queries("llm_semdedup_kmeans")(spark, dir)
      val n = out.count()
      assert(n === graft.sources.Tables.load(spark, dir, "embeddings").count())
      val badGroups = out.groupBy("group_id")
        .agg(sum(when(col("keep"), 1).otherwise(0)).as("keeps"))
        .filter(col("keeps") =!= 1).count()
      assert(badGroups === 0L, "every duplicate group keeps exactly one member")
    } finally spark.conf.unset("spark.graft.semdedupMaxClusterRows")
  }
}
