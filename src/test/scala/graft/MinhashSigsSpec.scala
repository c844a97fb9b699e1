package graft

import org.apache.spark.sql.functions._

import graft.dialect.Dialect.splitLit
import graft.llm.{DedupOps, Grams}

/** Pins the round-14 native `minhash_sigs` expression bit-equal to the
  * relational formulation it replaced (explode → groupBy with
  * min(md5('<s>:' ‖ shingle)) per seed + collect_set(xxhash64)) — the
  * LSH-family kernel, so any drift here would silently move EVERY
  * candidate pair downstream.
  */
class MinhashSigsSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (3L, "too short"),                                   // <3 words: no row
      (4L, "a a a a a"),                                   // repeated shingles
      (5L, "unicode wörds héré too yes"),                  // multi-byte UTF-8
      (6L, "x  y  z w"),                                   // double spaces -> empty words
      (7L, "one two three")                                // exactly one shingle
    ).toDF("doc_id", "text")
  }

  /** The historical aggregate form, kept here as the reference. */
  private def oldSigs = {
    val sh = Grams.ngrams(docs, splitLit(col("text"), " "), 3)
      .select(col("doc_id"), col("gram").as("shingle"))
    def mh(seed: Int) =
      min(md5(concat(lit(s"$seed:"), col("shingle")))).as(s"mh$seed")
    sh.groupBy("doc_id")
      .agg(mh(0), mh(1), mh(2), mh(3), mh(4), mh(5), mh(6), mh(7),
        collect_set(xxhash64(col("shingle"))).as("shset"))
  }

  test("native signatures equal the aggregate form on every seed and doc") {
    val got = DedupOps.sigsOfDocs(docs).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getString)).toMap
    val want = oldSigs.collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getString)).toMap
    assert(got.keySet === want.keySet)          // doc 3 absent from both
    assert(!got.contains(3L))
    want.foreach { case (id, sigs) => assert(got(id) === sigs, s"doc $id") }
  }

  test("carried shingle-hash SET equals collect_set(xxhash64(shingle))") {
    val got = DedupOps.sigsOfDocs(docs, withShset = true).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](9).toSet).toMap
    val want = oldSigs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](9).toSet).toMap
    assert(got === want)
  }

  test("band fold over native signatures reproduces the oracle-pinned band hashes") {
    // End to end through bandsOfDocs: same band rows as folding the old
    // aggregate's signatures.
    val got = DedupOps.bandsOfDocs(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val want = {
      val sigs = oldSigs.drop("shset")
      DedupOps.bandsOfSigs(sigs).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    }
    assert(got === want)
  }
}
