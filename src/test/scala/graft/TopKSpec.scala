package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dialect.Dialect._
import graft.functions.GraftFunctions
import graft.sources.Tables

/** The bounded top-k aggregate (`topk_pairs`) must return exactly the
  * rows of the row_number-window formulation — same ordering, same
  * deterministic tiebreak — while executing as a two-phase aggregate
  * (map-side partial heaps, at most k pairs per partition to the
  * shuffle).
  */
class TopKSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private val k = 5

  test("topk_pairs equals the window top-k on real similarity scores") {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos_sim",
        roundTo(call_function("cosine_sim", col("qv"), col("embedding")), 6))
      .select("qid", "vec_id", "cos_sim")

    val viaWindow = scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val viaAgg = scored
      .groupBy("qid")
      .agg(expr(s"topk_pairs(cos_sim, vec_id, $k)").as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("qid"), (col("pos") + 1).as("rank"),
        col("p.id").as("vec_id"), col("p.score").as("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

    assert(viaAgg === viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("topk_pairs breaks ties deterministically and honors k on small groups") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, 0.5, 10L), (1L, 0.5, 3L), (1L, 0.9, 7L), (1L, 0.1, 1L),
      (2L, 0.2, 5L)).toDF("g", "s", "id")
    val out = df.groupBy("g").agg(expr("topk_pairs(s, id, 2)").as("top"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getDouble(0), p.getLong(1))))
      .toMap
    assert(out(1L) === Seq((0.9, 7L), (0.5, 3L))) // tie at 0.5 -> lower id
    assert(out(2L) === Seq((0.2, 5L)))            // fewer than k rows kept as-is
  }
}
