package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scale-up generator for bench-only data: writes `copies`× the source
  * scale factor by unioning key-shifted copies (stride 1e9 per copy, far
  * above any real key). Key shifts are applied consistently across every
  * table of a join domain — orders.o_custkey, customer.c_custkey, and
  * events.user_id all shift together — so join selectivity per copy is
  * preserved and the result behaves like a genuinely larger dataset, not
  * ten disjoint ones. Dimension tables (nation/region) are NOT scaled,
  * matching how dims grow in real warehouses.
  *
  * Two content modes for documents/embeddings (VERDICT r7 #6):
  *  - verbatim (default): each document gains copies−1 exact twins, so
  *    every near-dup metric is OUTPUT-QUADRATIC by construction — any
  *    exact algorithm pays the true-pair blowup. Good for exercising
  *    the distributed CC tier; useless for separating candidate-side
  *    growth from true-pair growth.
  *  - `--perturb`: deterministic token/element noise keyed off
  *    (id, copy index) — no rand(). Exactly ONE designated copy per
  *    source doc/vector is LIGHTLY perturbed (a single token edit /
  *    tiny element jitter → still a near-duplicate); every other copy
  *    is HEAVILY perturbed (7/8 of distinct tokens rewritten /
  *    hash-keyed sign flips → decorrelated, effectively a new
  *    document). True near-dup pairs therefore stay ≈ |source corpus|
  *    (bounded rate, linear in scale) while the candidate side grows
  *    with the corpus — the separation a scale probe needs.
  *
  * Usage: runMain graft.tools.MakeSf <srcSfDir> <dstDir> <copies> [--perturb]
  * (bench data only — no oracle covers the scaled output.)
  */
object MakeSf {
  val stride = 1000000000L

  def main(args: Array[String]): Unit = {
    val (src, dst, copies) = (args(0), args(1), args(2).toInt)
    val perturb = args.drop(3).contains("--perturb")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, copies, perturb)
    spark.stop()
  }

  /** Light iff this copy is the source row's ONE designated near-dup
    * twin: k == 1 + (hash(id) mod (copies-1)). Copy 0 is the verbatim
    * original in both modes.
    */
  private def isLightTwin(idCol: String, k: Int, copies: Int) =
    lit(k) === lit(1) + pmod(hash(col(idCol)), lit(math.max(copies - 1, 1)))

  /** Light perturbation: EXACTLY ONE token position (hash-chosen per
    * (id, copy)) rewritten to a copy-tagged replacement — the canonical
    * single-edit near-duplicate, with token-set Jaccard ≥ (v−1)/(v+1)
    * guaranteed for a doc of v distinct tokens regardless of its length
    * or repetition structure.
    */
  private[graft] def perturbText(textCol: String, idCol: String,
                                 k: Int): org.apache.spark.sql.Column =
    array_join(
      expr(s"transform(split($textCol, ' '), (w, i) -> " +
        s"IF(i = pmod(hash($idCol, $k), size(split($textCol, ' '))), " +
        s"concat('pz', pmod(hash(w, $k), 997)), w))"),
      " ")

  /** Heavy perturbation: 7/8 of DISTINCT tokens rewritten — the flip is
    * keyed per (id, copy, token), so EVERY occurrence of a flipped word
    * changes and the token SET keeps only ~1/8 of the original (these
    * short synthetic docs are highly repetitive, so per-position
    * flipping would leave the set nearly intact). Replacements are
    * salted by (token, copy) only, so heavy copies across different
    * docs still share a common pseudo-vocabulary (df distributions stay
    * corpus-like) without recreating the original's content.
    */
  private[graft] def scrambleText(textCol: String, idCol: String,
                                  k: Int): org.apache.spark.sql.Column =
    array_join(
      expr(s"transform(split($textCol, ' '), w -> " +
        s"IF(pmod(hash($idCol, $k, w), 8) != 0, concat('pz', pmod(hash(w, $k), 997)), w))"),
      " ")

  def run(spark: SparkSession, src: String, dst: String, copies: Int,
          perturb: Boolean = false): Unit = {

    def write(name: String, keys: Seq[String]): Unit = {
      val base = Tables.load(spark, src, name)
      def content(df: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame =
        if (!perturb || k == 0) df
        else name match {
          case "documents" =>
            val light = isLightTwin("doc_id", k, copies)
            df.withColumn("text",
              when(light, perturbText("text", "doc_id", k))
                .otherwise(scrambleText("text", "doc_id", k)))
          case "embeddings" =>
            val light = isLightTwin("vec_id", k, copies)
            // light: ±0.5% element jitter (cosine stays ~1); heavy: a
            // hash-keyed component ROTATION + per-dim sign flips — the
            // rotation breaks alignment with the original's mass
            // distribution (sign flips alone leave cos = Σ s_d·x_d²/‖x‖²,
            // which stays large for skewed vectors), driving cosine well
            // below the 0.4 near-dup threshold.
            df.withColumn("embedding",
              when(light, expr(s"transform(embedding, (x, i) -> CAST(x * " +
                s"(1.0 + (pmod(hash(vec_id, $k, i), 11) - 5) / 1000.0) AS FLOAT))"))
                .otherwise(expr(s"transform(embedding, (x, i) -> CAST(" +
                  s"element_at(embedding, CAST(pmod(i + 1 + pmod(hash(vec_id, $k), " +
                  s"size(embedding) - 1), size(embedding)) AS INT) + 1) * " +
                  s"(pmod(hash(vec_id, $k, i), 2) * 2 - 1) AS FLOAT))")))
          case _ => df
        }
      val out =
        if (keys.isEmpty) base
        else (0 until copies).map { k =>
          keys.foldLeft(content(base, k))((df, c) => df.withColumn(c, col(c) + lit(k * stride)))
        }.reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      val mode = if (keys.isEmpty) "dim copy"
        else s"${copies}x on ${keys.mkString(",")}${if (perturb) " (perturbed)" else ""}"
      println(s"[makesf] $name: $mode")
    }

    write("region", Nil)
    write("nation", Nil)
    write("customer", Seq("c_custkey"))
    write("supplier", Seq("s_suppkey"))
    write("part", Seq("p_partkey"))
    write("orders", Seq("o_orderkey", "o_custkey"))
    write("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    write("events", Seq("event_id", "user_id"))
    write("documents", Seq("doc_id"))
    write("embeddings", Seq("vec_id"))
  }
}
