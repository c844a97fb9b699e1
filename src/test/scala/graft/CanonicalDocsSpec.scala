package graft

import org.apache.spark.sql.functions._

/** Semantic contract of `llm_canonical_docs` (representative selection
  * after near-dup grouping) beyond the oracle hash: one row per
  * duplicate cluster, the kept document is a member with the cluster's
  * maximum quality (n_chars), and ties break to the lowest doc_id.
  */
class CanonicalDocsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("one representative per dedup group, quality-argmax with min-id tiebreak") {
    val out = SparkEntry.queries("llm_canonical_docs")(spark, sf).cache()
    val groups = SparkEntry.queries("llm_dedup_groups")(spark, sf).cache()
    assert(out.count() > 0)

    // Exactly the groups dedupGroups emits, with matching membership counts.
    val sizes = groups.groupBy("canonical_id").agg(count(lit(1)).as("n"))
    val mismatched = out.join(sizes, "canonical_id")
      .filter(col("group_size") =!= col("n"))
    assert(mismatched.count() === 0L)
    assert(out.count() === sizes.count())

    // The kept doc is a member of its group...
    val membership = out.join(groups,
      out("kept_doc") === groups("doc_id") &&
        out("canonical_id") === groups("canonical_id"), "left_anti")
    assert(membership.count() === 0L, "kept_doc must belong to its own group")

    // ...carries the group's max n_chars, and is the min doc_id among
    // members attaining it (independent recomputation).
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"))
    val expected = groups.join(docs, "doc_id")
      .groupBy("canonical_id").agg(max("n_chars").as("mx"))
      .join(groups.join(docs, "doc_id"), "canonical_id")
      .filter(col("n_chars") === col("mx"))
      .groupBy("canonical_id")
      .agg(min("doc_id").as("kept_doc"), max("mx").as("kept_n_chars"))
    val got = out.select("canonical_id", "kept_doc", "kept_n_chars")
    assert(got.except(expected).count() === 0L)
    assert(expected.except(got).count() === 0L)

    groups.unpersist(); out.unpersist()
  }

  test("semantic dedup labels close over the verified cosine pair graph") {
    val pairs = SparkEntry.queries("llm_cosine_neardup")(spark, sf).cache()
    val labels = SparkEntry.queries("llm_semantic_dedup")(spark, sf).cache()
    assert(pairs.count() > 0 && labels.count() > 0)
    // Both endpoints of every verified pair carry the SAME cluster label.
    val la = labels.select(col("vec_id").as("vec_a"), col("canonical_id").as("ca"))
    val lb = labels.select(col("vec_id").as("vec_b"), col("canonical_id").as("cb"))
    val split = pairs.join(la, "vec_a").join(lb, "vec_b")
      .filter(col("ca") =!= col("cb"))
    assert(split.count() === 0L, "a verified pair must never straddle clusters")
    // Labels are component minima: every label is <= its members and is
    // itself a member of the cluster.
    assert(labels.filter(col("canonical_id") > col("vec_id")).count() === 0L)
    val labelRows = labels.select(col("canonical_id").as("vec_id")).distinct()
    assert(labelRows.join(labels.select("vec_id"), Seq("vec_id"), "left_anti")
      .count() === 0L)
    pairs.unpersist(); labels.unpersist()
  }
}
