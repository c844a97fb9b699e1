package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dialect.Dialect._
import graft.functions.GraftFunctions
import graft.llm.SimilarityOps
import graft.sources.Tables

/** Approximation-quality measurement for the IVF ANN path: recall@5
  * against exact brute-force cosine top-5, and the recall-vs-nprobe
  * trade the inverted-file design promises (probing more cells can only
  * add candidates, so recall is monotone in nprobe while the scanned
  * fraction stays nprobe/#cells).
  */
class AnnQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val k = 5

  private lazy val queries = Tables.load(spark, dir, "embeddings")
    .filter(col("vec_id") < 8)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exact: Set[(Long, Long)] = {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    pairs(emb.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("cos_sim",
        roundTo(call_function("cosine_sim", col("qv"), col("embedding")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= k))
  }

  private def recall(nprobe: Int): Double = {
    val got = pairs(SimilarityOps.ivfSearch(spark, dir, queries, k, nprobe))
    got.intersect(exact).size.toDouble / exact.size
  }

  test("IVF recall@5 improves monotonically with nprobe and reaches 1.0 at full probe") {
    val r1 = recall(1)
    val r2 = recall(2)
    val rAll = recall(10) // 10 cells in the corpus: probing all = exact
    info(f"recall@5: nprobe=1 $r1%.3f, nprobe=2 $r2%.3f, nprobe=10 $rAll%.3f")
    assert(r1 > 0.0, "single-probe IVF must find a nonzero share of true neighbors")
    assert(r2 >= r1, "probing more cells must not lose candidates")
    assert(rAll === 1.0, "probing every cell must reproduce the exact top-k")
  }

  test("incremental IVF maintenance is idempotent: replaying the delta batch is a no-op") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfinc-test").toString
    spark.conf.set("spark.graft.ivfIncRoot", tmp)
    try {
      val (corpusPath, centPath) = SimilarityOps.IvfIndex.ensureIncremental(spark, dir)
      val emb = Tables.load(spark, dir, "embeddings")
      val n0 = spark.read.parquet(corpusPath).count()
      assert(n0 === emb.count(), "incremental build must index the whole corpus")
      val cent0 = spark.read.parquet(centPath).collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      // Replay the newest-10% delta: already-known vec_ids filter out,
      // so neither the corpus nor the centroids may move.
      val cut = emb.agg(expr("(max(vec_id) * 9) div 10").as("c")).head().getLong(0)
      val root = new java.io.File(corpusPath).getParent
      SimilarityOps.IvfIndex.addVectors(spark, emb.filter(col("vec_id") >= cut), root)
      assert(spark.read.parquet(corpusPath).count() === n0)
      // The replay republishes a NEW pointer-flipped centroid generation
      // (that's what repairs a crashed half-applied batch), so resolve
      // the live generation — its CONTENT must be unchanged.
      val cent1 = spark.read.parquet(SimilarityOps.IvfIndex.centroidsPath(spark, root))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      assert(cent1.keySet === cent0.keySet)
      cent1.foreach { case (label, c) =>
        c.zip(cent0(label)).foreach { case (a, b) =>
          assert(math.abs(a - b) < 1e-12,
            s"replaying an already-applied batch must not move centroid values (cell $label)")
        }
      }
    } finally {
      spark.conf.unset("spark.graft.ivfIncRoot")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("index root is conf-driven: a temp-dir spark.graft.ivfRoot builds a fresh index") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-test").toString
    spark.conf.set("spark.graft.ivfRoot", tmp)
    try {
      val got = pairs(SimilarityOps.ivfSearch(spark, dir, queries, k, nprobe = 10))
      assert(got === exact, "full-probe search over the relocated index must match exact top-k")
      val built = new java.io.File(tmp).listFiles()
      assert(built != null && built.nonEmpty, "the index must have been built under the conf root")
    } finally {
      spark.conf.unset("spark.graft.ivfRoot")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
