package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dialect.Dialect._
import graft.functions.GraftFunctions
import graft.operators.QueryDef
import graft.sources.Tables

/** Similarity search over `embeddings.embedding` (Array[Float], dim 64).
  *
  * Scale design (100 TB): the query set is tiny and the corpus is huge,
  * so the baseline broadcasts the queries and performs ONE linear scan of
  * the corpus — a broadcast-nested-loop whose cost is O(|corpus| * |Q|)
  * map work with no shuffle of the corpus. The IVF variant prunes that
  * scan with a coarse quantizer (centroid per `label` cell): queries are
  * routed to their nearest centroid and only that cell's partition of the
  * corpus is scored — the classic inverted-file ANN layout, expressed
  * relationally so Catalyst can partition-prune the cell scan.
  *
  * Dot products run through the native codegen'd `cosine_sim`
  * expression, and scores are rounded portably before ranking so an
  * external oracle ranks identically. The IVF layout follows the
  * inverted-file coarse-quantizer design of Jégou/Douze/Schmid, "Product
  * Quantization for Nearest Neighbor Search" (TPAMI 2011) — here with
  * the `label` column as the coarse cell assignment.
  */
object SimilarityOps {

  /** Cosine via the native codegen'd expression (graft.functions
    * .CosineSimilarity): one fused pass, no intermediate arrays, result
    * bit-identical to the `aggregate(zip_with(...))` double fold.
    * Resolved through the session function registry (`GraftFunctions
    * .register`), which each query installs idempotently.
    */
  private def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Brute-force cosine top-k: queries = vec_id < 8, k = 5. */
  private val topk = QueryDef(
    "llm_cosine_topk",
    (s, dir) => {
      GraftFunctions.register(s)
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val scored = emb.join(broadcast(q), col("vec_id") =!= col("qid"))
        .withColumn("cos_sim", roundTo(cosine(col("qv"), col("embedding")), 6))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))))
        .filter(col("rank") <= 5)
        .select("qid", "rank", "vec_id", "cos_sim")
        .orderBy("qid", "rank")
    },
    Some("""WITH q AS (
           |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
           |pairs AS (
           |  SELECT qid, vec_id, qv, embedding AS v FROM q, embeddings
           |  WHERE vec_id <> qid),
           |terms AS (
           |  SELECT qid, vec_id,
           |    CAST(unnest(qv) AS DOUBLE) AS qx, CAST(unnest(v) AS DOUBLE) AS vx
           |  FROM pairs),
           |scored AS (
           |  SELECT qid, vec_id,
           |    floor(sum(qx * vx) / (sqrt(sum(qx * qx)) * sqrt(sum(vx * vx)))
           |          * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
           |  FROM terms GROUP BY qid, vec_id),
           |ranked AS (
           |  SELECT qid, vec_id, cos_sim,
           |    row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rank
           |  FROM scored)
           |SELECT qid, CAST(rank AS INTEGER) AS rank, vec_id, cos_sim
           |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin))

  /** IVF-style ANN: coarse centroids (mean embedding per `label` cell),
    * route each query to its nearest centroid, score only that cell.
    */
  private val ivf = QueryDef(
    "llm_ann_ivf",
    (s, dir) => {
      GraftFunctions.register(s)
      val emb = Tables.load(s, dir, "embeddings")
      // Coarse quantizer: centroid per cell, as (label, pos, c) then
      // re-assembled in pos order — portable and shuffle-light (the
      // per-(label,pos) partial means aggregate before one small shuffle).
      val cent = emb
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos").agg(avg(col("x").cast("double")).as("c"))
        .groupBy("label")
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(col("label").as("c_label"),
          expr("transform(pc, p -> p.c)").as("centroid"))
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      // Route: nearest centroid by cosine (deterministic tiebreak).
      val routed = q.join(broadcast(cent))
        .withColumn("c_sim", roundTo(cosine(col("qv"), col("centroid")), 6))
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("c_sim").desc, col("c_label"))))
        .filter(col("rn") === 1)
        .select(col("qid"), col("qv"), col("c_label").as("cell"))
      // Search only the routed cell.
      routed.join(emb, col("label") === col("cell") && col("vec_id") =!= col("qid"))
        .withColumn("cos_sim", roundTo(cosine(col("qv"), col("embedding")), 6))
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))))
        .filter(col("rank") <= 5)
        .select("qid", "cell", "rank", "vec_id", "cos_sim")
        .orderBy("qid", "rank")
    },
    Some("""WITH cterms AS (
           |  SELECT label,
           |    CAST(unnest(generate_series(1, len(embedding))) AS INTEGER) AS pos,
           |    CAST(unnest(embedding) AS DOUBLE) AS x
           |  FROM embeddings),
           |cent AS (
           |  SELECT label AS c_label, pos, avg(x) AS c FROM cterms GROUP BY 1, 2),
           |q AS (
           |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 8),
           |qterms AS (
           |  SELECT qid,
           |    CAST(unnest(generate_series(1, len(qv))) AS INTEGER) AS pos,
           |    CAST(unnest(qv) AS DOUBLE) AS qx
           |  FROM q),
           |qcent AS (
           |  SELECT qid, c_label,
           |    floor(sum(qx * c) / (sqrt(sum(qx * qx)) * sqrt(sum(c * c)))
           |          * 1000000.0 + 0.5) / 1000000.0 AS c_sim
           |  FROM qterms JOIN cent USING (pos) GROUP BY qid, c_label),
           |routed AS (
           |  SELECT qid, c_label AS cell FROM (
           |    SELECT qid, c_label,
           |      row_number() OVER (PARTITION BY qid ORDER BY c_sim DESC, c_label) AS rn
           |    FROM qcent) WHERE rn = 1),
           |pairs AS (
           |  SELECT r.qid, r.cell, e.vec_id, q.qv, e.embedding AS v
           |  FROM routed r JOIN q ON q.qid = r.qid
           |  JOIN embeddings e ON e.label = r.cell AND e.vec_id <> r.qid),
           |terms AS (
           |  SELECT qid, cell, vec_id,
           |    CAST(unnest(qv) AS DOUBLE) AS qx, CAST(unnest(v) AS DOUBLE) AS vx
           |  FROM pairs),
           |scored AS (
           |  SELECT qid, cell, vec_id,
           |    floor(sum(qx * vx) / (sqrt(sum(qx * qx)) * sqrt(sum(vx * vx)))
           |          * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
           |  FROM terms GROUP BY 1, 2, 3)
           |SELECT qid, cell, CAST(rank AS INTEGER) AS rank, vec_id, cos_sim FROM (
           |  SELECT qid, cell, vec_id, cos_sim,
           |    row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rank
           |  FROM scored)
           |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin))

  /** Embedding-cosine near-duplicate pairs, blocked by the quantizer
    * cell (`label`): pairs only form inside a cell, so the comparison
    * count is bounded by cell size — the all-pairs cartesian never
    * appears in the plan. (Threshold 0.4 suits this synthetic corpus,
    * whose max same-cell cosine is ~0.47; real near-dup corpora use
    * ~0.95 with the same plan shape.)
    */
  private val nearDup = QueryDef(
    "llm_cosine_neardup",
    (s, dir) => {
      GraftFunctions.register(s)
      val emb = Tables.load(s, dir, "embeddings")
      val a = emb.select(col("label").as("la"), col("vec_id").as("va"),
        col("embedding").as("ea"))
      val b = emb.select(col("label").as("lb"), col("vec_id").as("vb"),
        col("embedding").as("eb"))
      a.join(b, col("la") === col("lb") && col("va") < col("vb"))
        .withColumn("cos_sim", roundTo(cosine(col("ea"), col("eb")), 6))
        .filter(col("cos_sim") >= 0.4)
        .select(col("va").as("vec_a"), col("vb").as("vec_b"), col("cos_sim"))
        .orderBy("vec_a", "vec_b")
    },
    Some("""WITH pairs AS (
           |  SELECT a.vec_id AS va, b.vec_id AS vb, a.embedding AS ea, b.embedding AS eb
           |  FROM embeddings a JOIN embeddings b
           |    ON a.label = b.label AND a.vec_id < b.vec_id),
           |terms AS (
           |  SELECT va, vb, CAST(unnest(ea) AS DOUBLE) AS x,
           |         CAST(unnest(eb) AS DOUBLE) AS y
           |  FROM pairs),
           |scored AS (
           |  SELECT va, vb,
           |    floor(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)))
           |          * 1000000.0 + 0.5) / 1000000.0 AS cos_sim
           |  FROM terms GROUP BY va, vb)
           |SELECT va AS vec_a, vb AS vec_b, cos_sim FROM scored
           |WHERE cos_sim >= 0.4 ORDER BY vec_a, vec_b""".stripMargin))

  val all: Seq[QueryDef] = Seq(topk, ivf, nearDup)
}
