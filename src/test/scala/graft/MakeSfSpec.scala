package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.tools.MakeSf

/** The 10× bench-data generator must scale fact tables by `copies`
  * while PRESERVING per-copy join selectivity — a key domain that
  * shifts on one side but not the other would silently turn the scaled
  * bench into a join-miss benchmark.
  */
class MakeSfSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  test("MakeSf scales facts by copies, keeps dims fixed, preserves join selectivity") {
    val dst = java.nio.file.Files.createTempDirectory("graft-makesf").toString
    try {
      MakeSf.run(spark, src, dst, copies = 2)

      def n(dir: String, t: String): Long = Tables.load(spark, dir, t).count()
      assert(n(dst, "orders") === 2 * n(src, "orders"))
      assert(n(dst, "lineitem") === 2 * n(src, "lineitem"))
      assert(n(dst, "documents") === 2 * n(src, "documents"))
      assert(n(dst, "nation") === n(src, "nation"), "dims must not scale")
      assert(n(dst, "region") === n(src, "region"), "dims must not scale")

      // Join domains shift together: the scaled join yields exactly
      // copies× the base join (no cross-copy matches, no misses).
      def joined(dir: String): Long =
        Tables.load(spark, dir, "orders").join(
          Tables.load(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined(dst) === 2 * joined(src))
      def evJoined(dir: String): Long =
        Tables.load(spark, dir, "events").join(
          Tables.load(spark, dir, "customer"),
          col("user_id") === col("c_custkey")).count()
      assert(evJoined(dst) === 2 * evJoined(src))

      // Texts are verbatim: every doc has exactly one twin at copies=2.
      val twins = Tables.load(spark, dst, "documents")
        .groupBy("text").count().select("count").distinct()
        .collect().map(_.getLong(0)).toSet
      // (base data may itself contain duplicate texts, so counts are
      // multiples of copies — never odd)
      assert(twins.forall(_ % 2 == 0), s"per-text counts must be 2x base: $twins")

      // The re-materialized events table round-trips through Tables.load
      // (the ts conversion gates on type, not name).
      assert(Tables.load(spark, dst, "events").schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst))
    }
  }

  test("--perturb: one light near-dup twin per doc, heavy copies decorrelated, deterministic") {
    val dst = java.nio.file.Files.createTempDirectory("graft-makesfp").toString
    val dst2 = java.nio.file.Files.createTempDirectory("graft-makesfp2").toString
    try {
      MakeSf.run(spark, src, dst, copies = 4, perturb = true)

      val docs = Tables.load(spark, dst, "documents")
        .select(col("doc_id"), pmod(col("doc_id"), lit(MakeSf.stride)).as("base_id"),
          (col("doc_id") / lit(MakeSf.stride)).cast("int").as("k"), col("text"))
      // token-level Jaccard of each copy vs its copy-0 original
      val base = docs.filter(col("k") === 0)
        .select(col("base_id"), col("text").as("t0"))
      val sims = docs.filter(col("k") > 0).join(base, "base_id")
        .withColumn("j", expr(
          """size(array_intersect(split(text, ' '), split(t0, ' '))) /
            |size(array_union(split(text, ' '), split(t0, ' ')))""".stripMargin))
        .groupBy("base_id")
        .agg(max("j").as("best"), sum(when(col("j") >= 0.7, 1).otherwise(0)).as("n_near"))
        .collect()
      assert(sims.nonEmpty)
      sims.foreach { r =>
        assert(r.getAs[Long]("n_near") === 1L,
          s"doc ${r.get(0)}: exactly one copy must stay a near-duplicate, got ${r.getAs[Long]("n_near")}")
        assert(r.getAs[Double]("best") >= 0.7,
          s"doc ${r.get(0)}: the light twin must be token-near its original")
      }

      // embeddings: one high-cosine twin, the rest near-orthogonal
      graft.functions.GraftFunctions.register(spark)
      val emb = Tables.load(spark, dst, "embeddings")
        .select(col("vec_id"), pmod(col("vec_id"), lit(MakeSf.stride)).as("base_id"),
          (col("vec_id") / lit(MakeSf.stride)).cast("int").as("k"), col("embedding"))
      val e0 = emb.filter(col("k") === 0).select(col("base_id"), col("embedding").as("v0"))
      val cos = emb.filter(col("k") > 0).join(e0, "base_id")
        .withColumn("c", expr("cosine_sim(embedding, v0)"))
        .groupBy("base_id")
        .agg(sum(when(col("c") >= 0.9, 1).otherwise(0)).as("n_hi"),
          sum(when(abs(col("c")) < 0.5, 1).otherwise(0)).as("n_lo"))
        .collect()
      cos.foreach { r =>
        assert(r.getAs[Long]("n_hi") === 1L, s"vec ${r.get(0)}: one high-cosine twin")
        assert(r.getAs[Long]("n_lo") === 2L, s"vec ${r.get(0)}: heavy copies decorrelate")
      }

      // determinism: a second run produces byte-identical content
      MakeSf.run(spark, src, dst2, copies = 4, perturb = true)
      val a = spark.read.parquet(s"$dst/documents.parquet")
        .orderBy("doc_id").collect().map(_.toString).toSeq
      val b = spark.read.parquet(s"$dst2/documents.parquet")
        .orderBy("doc_id").collect().map(_.toString).toSeq
      assert(a === b, "perturbation must be deterministic across runs")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst2))
    }
  }

  test("--zipf: FK columns skew Zipf-like, stay inside the scaled dim domain, PKs untouched") {
    val dst = java.nio.file.Files.createTempDirectory("graft-makesfz").toString
    try {
      MakeSf.run(spark, src, dst, copies = 2, zipf = true)

      // Referential integrity survives the remap: every skewed FK value
      // exists in the scaled dimension (anti-join is empty).
      val misses = Tables.load(spark, dst, "lineitem").select("l_partkey")
        .join(Tables.load(spark, dst, "part"),
          col("l_partkey") === col("p_partkey"), "left_anti").count()
      assert(misses === 0L, "every zipf l_partkey must exist in scaled part")
      val custMisses = Tables.load(spark, dst, "orders").select("o_custkey")
        .join(Tables.load(spark, dst, "customer"),
          col("o_custkey") === col("c_custkey"), "left_anti").count()
      assert(custMisses === 0L, "every zipf o_custkey must exist in scaled customer")

      // Skew: at s=1.1 the hottest key draws ~6.7% of rows — orders of
      // magnitude above the uniform share (1/|keys|). Assert ≥3% on the
      // hottest and a heavy head overall (top-10 ≥ 10%).
      val li = Tables.load(spark, dst, "lineitem")
      val total = li.count().toDouble
      val top = li.groupBy("l_partkey").count()
        .orderBy(col("count").desc).limit(10)
        .collect().map(_.getLong(1).toDouble)
      assert(top.head / total > 0.03,
        f"hottest part carries ${top.head / total}%.4f of rows — expected Zipf head ~0.067")
      assert(top.sum / total > 0.10, "top-10 parts must carry >10% of all rows")

      // PK association untouched: lineitem still joins orders 1:1 on
      // orderkey with zero misses, and per-copy counts match the base.
      val liMisses = Tables.load(spark, dst, "lineitem").select("l_orderkey")
        .join(Tables.load(spark, dst, "orders"),
          col("l_orderkey") === col("o_orderkey"), "left_anti").count()
      assert(liMisses === 0L, "l_orderkey keeps its order association")

      // Deterministic: a second run draws identical keys.
      val dst2 = java.nio.file.Files.createTempDirectory("graft-makesfz2").toString
      try {
        MakeSf.run(spark, src, dst2, copies = 2, zipf = true)
        val a = spark.read.parquet(s"$dst/orders.parquet")
          .orderBy("o_orderkey").select("o_custkey").collect().map(_.getLong(0)).toSeq
        val b = spark.read.parquet(s"$dst2/orders.parquet")
          .orderBy("o_orderkey").select("o_custkey").collect().map(_.getLong(0)).toSeq
        assert(a === b, "zipf draw must be deterministic across runs")
      } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst2))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst))
    }
  }

  test("--zipfdocs: duplicate-class sizes are Zipf (one hot class), replicas are single-edit near-dups") {
    val dst = java.nio.file.Files.createTempDirectory("graft-makesfzd").toString
    try {
      MakeSf.run(spark, src, dst, copies = 12, zipfDocs = true)
      val base = Tables.load(spark, src, "documents")
      val docs = Tables.load(spark, dst, "documents")
      val nBase = base.count()
      assert(docs.count() === 12 * nBase)

      // Recover each replica's class via the SAME deterministic draw the
      // generator used, then check the hottest class holds the Zipf(1.1)
      // head share (~6.7%) of the replica mass.
      val kCol = floor(col("doc_id") / lit(MakeSf.stride)).cast("int")
      val unshifted = col("doc_id") - kCol.cast("long") * lit(MakeSf.stride)
      val reps = docs.filter(col("doc_id") >= MakeSf.stride)
        .withColumn("tgt",
          MakeSf.zipfKey(hash(unshifted, kCol, lit("zipfdocs")), nBase, 1))
      val repTotal = reps.count().toDouble
      val sizes = reps.groupBy("tgt").count().orderBy(col("count").desc)
        .limit(3).collect().map(_.getLong(1).toDouble)
      assert(sizes.head / repTotal > 0.04,
        f"hottest duplicate class carries ${sizes.head / repTotal}%.4f of replicas — expected ~0.067")

      // Near-dup guarantee: every replica carries exactly ONE injected
      // token and its token-set Jaccard against its class's base doc is
      // high (single edit on v distinct tokens ⇒ J ≥ (v−1)/(v+1)).
      val injected = reps.filter(
        size(expr("filter(split(text, ' '), w -> w RLIKE '^pz[0-9]+$')")) =!= 1).count()
      assert(injected === 0L, s"$injected replicas lack exactly one injected token")
      val paired = reps.join(
        base.select(col("doc_id").as("tgt"), col("text").as("btext")), "tgt")
      val minJ = paired.select(
        (size(array_intersect(array_distinct(split(col("text"), " ")),
                              array_distinct(split(col("btext"), " ")))).cast("double") /
         size(array_union(array_distinct(split(col("text"), " ")),
                          array_distinct(split(col("btext"), " "))))).as("j"))
        .agg(min(col("j"))).head().getDouble(0)
      assert(minJ > 0.6, f"replica-vs-target token Jaccard fell to $minJ%.3f — not a near-dup class")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dst))
    }
  }
}
