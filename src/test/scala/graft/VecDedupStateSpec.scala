package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.llm.SimilarityOps.VecDedupState
import graft.sources.Tables

/** Deployment-contract pins for the persisted VECTOR dedup state — the
  * embedding-side twin of the text DedupState: multi-batch folds equal
  * a full recompute, replay of any crash prefix repairs (appends key
  * off the whole batch and anti-join their own target), and the pinned
  * band geometry reports — never silently absorbs — corpus growth.
  */
class VecDedupStateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def fullAssignment(emb: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val dir = Files.createTempDirectory("graft_vds_full").toFile.getAbsolutePath
    VecDedupState.buildInto(spark, emb, dir,
      Some(graft.llm.SimilarityOps.autoLshBpb(emb.count())))
    VecDedupState.assignment(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("two-batch fold equals a from-scratch build over everything ingested") {
    val emb = Tables.load(spark, sf, "embeddings")
    val bpb = graft.llm.SimilarityOps.autoLshBpb(emb.count())
    val c1 = emb.agg(expr("(max(vec_id) * 7) div 10")).head().getLong(0)
    val c2 = emb.agg(expr("(max(vec_id) * 85) div 100")).head().getLong(0)
    val dir = Files.createTempDirectory("graft_vds").toFile.getAbsolutePath
    VecDedupState.buildInto(spark, emb.filter(col("vec_id") < c1), dir, Some(bpb))
    VecDedupState.applyBatch(spark, emb.filter(col("vec_id") >= c1 && col("vec_id") < c2), dir)
    VecDedupState.applyBatch(spark, emb.filter(col("vec_id") >= c2), dir)
    val folded = VecDedupState.assignment(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(folded === fullAssignment(emb))
  }

  test("replaying an already-applied batch is a no-op (crash-prefix repair)") {
    val emb = Tables.load(spark, sf, "embeddings")
    val bpb = graft.llm.SimilarityOps.autoLshBpb(emb.count())
    val cut = emb.agg(expr("(max(vec_id) * 9) div 10")).head().getLong(0)
    val dir = Files.createTempDirectory("graft_vds_replay").toFile.getAbsolutePath
    VecDedupState.buildInto(spark, emb.filter(col("vec_id") < cut), dir, Some(bpb))
    val batch = emb.filter(col("vec_id") >= cut)
    VecDedupState.applyBatch(spark, batch, dir)
    def snap() = (
      VecDedupState.assignment(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      spark.read.parquet(s"$dir/corpus").count(),
      spark.read.parquet(s"$dir/bandindex").count())
    val before = snap()
    VecDedupState.applyBatch(spark, batch, dir) // at-least-once delivery
    assert(snap() === before, "a replayed batch must change nothing")
    // simulate a crash that committed corpus but lost the bandindex
    // append: replay must REPAIR the index, not skip it
    val lost = spark.read.parquet(s"$dir/bandindex")
      .filter(col("vec_id") < cut)
    lost.write.mode("overwrite").parquet(s"$dir/bandindex-tmp")
    spark.read.parquet(s"$dir/bandindex-tmp").write.mode("overwrite")
      .parquet(s"$dir/bandindex")
    VecDedupState.applyBatch(spark, batch, dir)
    assert(snap()._3 === before._3,
      "replay after a torn bandindex append must restore the index rows")
  }

  test("needsReband fires only when the corpus outgrows the pinned width") {
    val emb = Tables.load(spark, sf, "embeddings")
    val dir = Files.createTempDirectory("graft_vds_reband").toFile.getAbsolutePath
    // pin the geometry UNDER the corpus's natural width: probe must fire
    VecDedupState.buildInto(spark, emb, dir, Some(4))
    val natural = graft.llm.SimilarityOps.autoLshBpb(emb.count())
    if (natural > 4) assert(VecDedupState.needsReband(spark, dir))
    // pinned at (or above) the natural width: no false alarm
    val dir2 = Files.createTempDirectory("graft_vds_reband2").toFile.getAbsolutePath
    VecDedupState.buildInto(spark, emb, dir2, Some(natural))
    assert(!VecDedupState.needsReband(spark, dir2))
  }
}
