package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Semantic properties of the continuation operators on CONSTRUCTED
  * data (the oracle rows pin fixture agreement; these pin the
  * semantics that make each operator right):
  *  - funnel: strict ordering — a purchase BEFORE the first view must
  *    not convert; in-order users must;
  *  - EWMA: α=1/2 recursion on a constant series converges to the
  *    constant, and a unit impulse halves each step;
  *  - regr family: slope/intercept recover an exact linear relation;
  *  - edit-distance verify: identical prefixes give distance 0 /
  *    similarity 1 on twin docs.
  */
class ContinuationOpsSpec extends SparkSpec {

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("funnel counts only strictly-ordered step completions") {
    import spark.implicits._
    // user 1: view -> click -> purchase (full funnel)
    // user 2: purchase first, then view, click (click converts, purchase must NOT)
    // user 3: view only
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      (2L, ts(0), "purchase"), (2L, ts(1), "view"), (2L, ts(2), "click"),
      (3L, ts(0), "view")
    ).toDF("user_id", "ts", "event_type")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val out = ev
      .withColumn("f1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("f2", min(when(col("event_type") === "click" && col("ts") > col("f1"), col("ts"))).over(w))
      .withColumn("f3", min(when(col("event_type") === "purchase" && col("ts") > col("f2"), col("ts"))).over(w))
      .agg(
        countDistinct(when(col("f1").isNotNull, col("user_id"))).as("n1"),
        countDistinct(when(col("f2").isNotNull, col("user_id"))).as("n2"),
        countDistinct(when(col("f3").isNotNull, col("user_id"))).as("n3"))
      .collect()(0)
    assert(out.getLong(0) === 3) // all three viewed
    assert(out.getLong(1) === 2) // users 1 and 2 clicked after viewing
    assert(out.getLong(2) === 1) // only user 1 purchased after the click
  }

  test("exact EWMA: constant series reproduces the constant; impulse halves per step") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    def ewmaQ(df: org.apache.spark.sql.DataFrame) = {
      val num = (0 until 16).map { k =>
        coalesce(lag(col("qv"), k).over(w), lit(0L)) * lit(1L << (15 - k))
      }.reduce(_ + _)
      val den = (0 until 16).map { k =>
        coalesce(lag(lit(1L), k).over(w), lit(0L)) * lit(1L << (15 - k))
      }.reduce(_ + _)
      df.withColumn("qv", expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)"))
        .withColumn("num", num).withColumn("den", den)
        .select(col("event_id"), expr("num div den").as("ewma_q"))
        .orderBy("event_id")
    }
    // constant 3.5 -> every EWMA value is exactly 3.5e6
    val const = (1 to 20).map(i => (7L, ts(i), i.toLong, 3.5)).toDF("user_id", "ts", "event_id", "value")
    assert(ewmaQ(const).collect().forall(_.getLong(1) === 3500000L))
    // unit impulse at t=1 then zeros: value halves each step (2^15/den shrink)
    val impulse = ((1, 1.0) +: (2 to 12).map(i => (i, 0.0)))
      .map { case (i, v) => (8L, ts(i), i.toLong, v) }
      .toDF("user_id", "ts", "event_id", "value")
    val got = ewmaQ(impulse).collect().map(_.getLong(1))
    // step k (0-based): num = 1e6 * 2^(15-k), den = 2^16 - 2^(15-k)
    val expected = (0 until 12).map { k =>
      (1000000L * (1L << (15 - k))) / ((1L << 16) - (1L << (15 - k)))
    }
    assert(got.toSeq === expected)
  }

  test("regr family recovers an exact linear relation") {
    import spark.implicits._
    // y = 3x + 7 exactly
    val df = (1 to 50).map(x => (x.toDouble, 3.0 * x + 7.0)).toDF("x", "y")
    val r = df.agg(
      expr("regr_slope(y, x)").as("m"),
      expr("regr_intercept(y, x)").as("b"),
      expr("regr_r2(y, x)").as("r2")).collect()(0)
    assert(math.abs(r.getDouble(0) - 3.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 7.0) < 1e-9)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
  }

  test("skew report invariants on the fixture: shares bounded, max >= avg") {
    val out = SparkEntry.queries("s18_skew_report")(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 5)
    assert(out.map(_.getAs[Long]("share_q")).forall(s => s >= 0 && s <= 10000))
    assert(out.forall(_.getAs[Long]("skew_ratio_q") >= 10000L),
      "max/avg ratio is >= 1 by definition")
    val cnts = out.map(_.getAs[Long]("cnt"))
    assert(cnts.sorted.reverse.toSeq === cnts.toSeq, "rows ordered by rank = cnt desc")
  }

  test("edit-distance verify: exact twins give distance 0, similarity 1") {
    // MakeSf-style twins share text verbatim; construct directly.
    import spark.implicits._
    val twins = Seq((1L, "the same prefix content"), (2L, "the same prefix content"))
      .toDF("doc_id", "text")
    val p = twins.select(col("doc_id"), substring(col("text"), 1, 64).as("prefix"))
    val a = p.select(col("doc_id").as("doc_a"), col("prefix").as("pa"))
    val b = p.select(col("doc_id").as("doc_b"), col("prefix").as("pb"))
    val r = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(levenshtein(col("pa"), col("pb")).as("d")).collect()(0)
    assert(r.getInt(0) === 0)
  }
}
