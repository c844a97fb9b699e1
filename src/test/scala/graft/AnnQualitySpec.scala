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

  test("the oracle row's cellsOverride pins k=8 regardless of the ivfKmeansCells dial") {
    // The DuckDB replay is hard-wired to the k=8 Lloyd trajectory; the
    // session dial must not be able to desync the Spark side from it.
    spark.conf.set("spark.graft.ivfKmeansCells", "64")
    try {
      val (corpus, cents) =
        SimilarityOps.IvfIndex.ensureKmeans(spark, dir, cellsOverride = Some(8))
      assert(corpus.contains("/k8/"), corpus)
      assert(cents.contains("/k8/"), cents)
      // Without the override the dial applies (and gets its own root —
      // two cell counts never serve each other's layouts even under a
      // conf-supplied ivfKmRoot).
      val kmTmp = java.nio.file.Files.createTempDirectory("graft_kmroot").toString
      spark.conf.set("spark.graft.ivfKmRoot", kmTmp)
      try {
        spark.conf.set("spark.graft.ivfKmeansCells", "4")
        val (c4, _) = SimilarityOps.IvfIndex.ensureKmeans(spark, dir)
        assert(c4.startsWith(s"$kmTmp/k4/"), c4)
      } finally spark.conf.unset("spark.graft.ivfKmRoot")
    } finally spark.conf.unset("spark.graft.ivfKmeansCells")
  }

  test("kmeansAssignK at k=8 replays kmeansRounds exactly (the oracle-pinned trajectory)") {
    // The generalized struct-min argmin must agree with the arithmetic
    // dist*100+cluster encoding wherever the latter is defined — the
    // DuckDB-replayed trajectory then covers the general form too.
    val emb = SimilarityOps.quantEmb(spark, dir)
    val got = SimilarityOps.kmeansAssignK(emb, 8, 3)
      .select("vec_id", "cluster", "dist").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = SimilarityOps.kmeansRounds(spark, dir, 3)
      .select("vec_id", "cluster", "dist").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("k-means cells route better than geometry-blind label cells at nprobe=1") {
    // On the synthetic corpus the label column is uncorrelated with the
    // embedding geometry, so label-cell recall ~ nprobe/#cells; k-means
    // cells are the structural fix (llm_ann_ivf_kmeans).
    val labelGot = pairs(SimilarityOps.ivfSearch(spark, dir, queries, k, 1))
    val kmGot = pairs(SimilarityOps.ivfSearchKmeans(spark, dir, queries, k, 1))
    val labelR = labelGot.intersect(exact).size.toDouble / exact.size
    val kmR = kmGot.intersect(exact).size.toDouble / exact.size
    info(f"recall@5 nprobe=1: label cells $labelR%.3f, kmeans cells $kmR%.3f")
    assert(kmR >= labelR,
      "geometric cells must not route worse than geometry-blind label cells")
  }

  test("IVF recall@5 improves monotonically with nprobe and reaches 1.0 at full probe") {
    val r1 = recall(1)
    val r2 = recall(2)
    val r3 = recall(3) // the oracle-pinned multi-probe row's configuration
    val rAll = recall(10) // 10 cells in the corpus: probing all = exact
    info(f"recall@5: nprobe=1 $r1%.3f, nprobe=2 $r2%.3f, nprobe=3 $r3%.3f, nprobe=10 $rAll%.3f")
    assert(r1 > 0.0, "single-probe IVF must find a nonzero share of true neighbors")
    assert(r2 >= r1, "probing more cells must not lose candidates")
    assert(r3 >= r2, "probing more cells must not lose candidates")
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

  // ---- drift: cell-split policy keeps recall from decaying --------------

  /** Deterministic pseudo-noise in [-0.05, 0.05) from (id, dim). */
  private def noise(id: Long, d: Int): Float =
    ((((id * 2654435761L + d * 40503L) % 1000L + 1000L) % 1000L) / 1000.0f - 0.5f) * 0.1f

  private def vecNear(center: Array[Float], id: Long): Seq[Float] =
    center.indices.map(i => center(i) + noise(id, i)).toSeq

  private def unit(ix: Int, dim: Int = 8): Array[Float] =
    Array.tabulate(dim)(i => if (i == ix) 1f else 0f)
  private def mix(a: Array[Float], wa: Double, b: Array[Float], wb: Double): Array[Float] = {
    val raw = a.indices.map(i => (a(i) * wa + b(i) * wb).toFloat).toArray
    val n = math.sqrt(raw.map(x => x * x).sum.toDouble).toFloat
    raw.map(_ / n)
  }

  /** Base corpus: cell 0 tight at e0, cell 1 tight at (e0+e1)/√2.
    * Drift batches sit at normalize(0.2·e0 + e2): every drifted vector
    * is (slightly) closer to cell 0 than to cell 1, so without splits
    * 1000 of them pile into cell 0, the cell centroid smears toward e2
    * (e0-fraction ≈ 0.33/0.88 ≈ 0.37), and a query in the ORIGINAL e0
    * region now routes to cell 1 (cos ≈ 0.707 beats 0.37) — whose
    * points are not its neighbors. With the split policy the drift
    * mass peels off into its own cells, the base region keeps a tight
    * ≈e0 centroid, and routing recovers.
    */
  private def driftExperiment(splitMaxRows: Long): Double = {
    import spark.implicits._
    val a = unit(0)
    val b = mix(unit(0), 1.0, unit(1), 1.0)
    val base =
      ((0L until 200L).map(i => (i, 0, vecNear(a, i))) ++
        (200L until 400L).map(i => (i, 1, vecNear(b, i))))
        .toDF("vec_id", "label", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft-ivfdrift").toString + "/idx"
    SimilarityOps.IvfIndex.buildInto(spark, base, root)
    if (splitMaxRows > 0)
      spark.conf.set("spark.graft.ivfCellMaxRows", splitMaxRows.toString)
    try {
      var all = base.select("vec_id", "embedding")
      val c = mix(unit(0), 0.2, unit(2), 1.0)
      (1 to 10).foreach { bi =>
        val ids = (1000L + bi * 100L) until (1000L + bi * 100L + 100L)
        val batch = ids.map(i => (i, vecNear(c, i))).toDF("vec_id", "embedding")
        SimilarityOps.IvfIndex.addVectorsAssigned(spark, batch, root)
        all = all.unionAll(batch)
      }
      // 20 queries in the ORIGINAL cell-0 region — the points a smeared
      // centroid orphans.
      val qs = (5000L until 5020L).map(i => (i, vecNear(a, i)))
        .toDF("qid", "qv")
      GraftFunctions.register(spark)
      val truth = pairs(all.join(broadcast(qs))
        .withColumn("cos_sim",
          roundTo(call_function("cosine_sim", col("qv"), col("embedding")), 6))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))))
        .filter(col("rank") <= k)
        .select(col("qid"), col("vec_id")))
      val got = pairs(SimilarityOps.ivfSearchAt(spark,
        (s"$root/corpus", SimilarityOps.IvfIndex.centroidsPath(spark, root)),
        qs, k, nprobe = 1))
      got.intersect(truth).size.toDouble / truth.size
    } finally spark.conf.unset("spark.graft.ivfCellMaxRows")
  }

  test("cell splits keep recall@5 from decaying over 10 drifting delta batches") {
    val without = driftExperiment(0L)
    val withSplits = driftExperiment(250L)
    info(f"recall@5 after 10 drift batches: no-split $without%.3f, split-policy $withSplits%.3f")
    assert(withSplits > without,
      "the split policy must beat frozen cells under drift")
    assert(without < 0.9, "the no-split index must measurably decay (else the drift probe is too weak)")
    assert(withSplits >= 0.9, "split cells must keep routing the original region correctly")
  }

  test("PQ drift probe rises under drift and maybeRetrain restores the error baseline") {
    import spark.implicits._
    // PQ's layout is fixed at 8 subvectors x 8 dims = 64-dim vectors.
    val a = unit(0, 64)
    val base = (0L until 256L).map(i => (i, vecNear(a, i))).toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft-pqdrift").toString + "/idx"
    SimilarityOps.PqIndex.buildInto(spark, base, root)
    assert(SimilarityOps.PqIndex.driftRatio(spark, root) === 1.0,
      "no delta batches yet -> ratio 1.0 by definition")
    // In-distribution batch: ratio stays near 1.
    val inDist = (300L until 400L).map(i => (i, vecNear(a, i))).toDF("vec_id", "embedding")
    SimilarityOps.PqIndex.addVectors(spark, inDist, root)
    val inRatio = SimilarityOps.PqIndex.driftRatio(spark, root)
    info(f"in-distribution drift ratio: $inRatio%.2f")
    assert(inRatio < 2.0, "an in-distribution batch must not trigger the retrain threshold")
    assert(!SimilarityOps.PqIndex.maybeRetrain(spark, base.unionAll(inDist), root))
    // Off-distribution drift: quantization error explodes vs baseline.
    val off = mix(unit(2, 64), 1.0, unit(3, 64), 1.0)
    val drifted = (500L until 700L).map(i => (i, vecNear(off, i))).toDF("vec_id", "embedding")
    SimilarityOps.PqIndex.addVectors(spark, drifted, root)
    val offRatio = SimilarityOps.PqIndex.driftRatio(spark, root)
    info(f"off-distribution drift ratio: $offRatio%.2f")
    assert(offRatio >= 2.0, "off-distribution mass must push the probe past the threshold")
    val corpus = base.unionAll(inDist).unionAll(drifted)
    assert(SimilarityOps.PqIndex.maybeRetrain(spark, corpus, root),
      "the probe must trigger a retrain")
    assert(SimilarityOps.PqIndex.driftRatio(spark, root) === 1.0,
      "retrain resets the drift log to the new baseline")
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
