package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic invariants of the batch-2 extension rows (statistical
  * aggregates, argmin/argmax, multiset set-ops, bitwise family,
  * correlated LATERAL), plus the one plan shape that matters at scale:
  * the lateral top-n must decorrelate to a rank-filter, not a per-row
  * subquery loop.
  */
class ExtensionOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("stats family matches direct two-pass formulas") {
    val out = SparkEntry.queries("a17_stats_family")(spark, sf).cache()
    assert(out.count() === 3)
    // Sample variance/stddev strictly positive on non-constant data, and
    // |corr| <= 1.
    assert(out.filter(col("sd_price") <= 0 || col("var_disc") <= 0).count() === 0L)
    assert(out.filter(abs(col("corr_qty_price")) > 1).count() === 0L)
    // n partitions lineitem exactly.
    val li = graft.sources.Tables.load(spark, sf, "lineitem").count()
    assert(out.agg(sum("n")).head.getLong(0) === li)
    out.unpersist()
  }

  test("min_by/max_by pick the composite-key extremes deterministically") {
    val out = SparkEntry.queries("a19_min_max_by")(spark, sf)
    val cust = graft.sources.Tables.load(spark, sf, "customer")
      .select(col("c_nationkey"), col("c_custkey"),
        (round(col("c_acctbal") * 100).cast("long") * lit(100000000L) +
          col("c_custkey")).as("k"))
    val w = Window.partitionBy("c_nationkey")
    val expected = cust
      .withColumn("mx", max("k").over(w)).withColumn("mn", min("k").over(w))
      .groupBy("c_nationkey")
      .agg(max(when(col("k") === col("mx"), col("c_custkey"))).as("richest_cust"),
        max(when(col("k") === col("mn"), col("c_custkey"))).as("poorest_cust"),
        count(lit(1)).as("n"))
    assert(out.except(expected).count() === 0L)
    assert(expected.except(out).count() === 0L)
  }

  test("intersect-all/except-all multiplicities are min and difference of bag counts") {
    val out = SparkEntry.queries("u4_intersect_except_all")(spark, sf).cache()
    val p = graft.sources.Tables.load(spark, sf, "part")
    val a = p.filter(col("p_size") <= 25).groupBy("p_brand")
      .agg(count(lit(1)).as("ca"))
    val b = p.filter(col("p_size") >= 20).groupBy("p_brand")
      .agg(count(lit(1)).as("cb"))
    val joined = a.join(b, Seq("p_brand"), "full")
      .na.fill(0L, Seq("ca", "cb")).cache()
    val expInter = joined.filter(least(col("ca"), col("cb")) > 0)
      .select(col("p_brand"), least(col("ca"), col("cb")).as("multiplicity"))
    val gotInter = out.filter(col("op") === "intersect_all")
      .select("p_brand", "multiplicity")
    assert(gotInter.except(expInter).count() === 0L)
    assert(expInter.except(gotInter).count() === 0L)
    val expExc = joined.filter(col("ca") > col("cb"))
      .select(col("p_brand"), (col("ca") - col("cb")).as("multiplicity"))
    val gotExc = out.filter(col("op") === "except_all")
      .select("p_brand", "multiplicity")
    assert(gotExc.except(expExc).count() === 0L)
    assert(expExc.except(gotExc).count() === 0L)
    joined.unpersist(); out.unpersist()
  }

  test("bitwise outputs satisfy arithmetic identities") {
    val out = SparkEntry.queries("f_bitwise_funcs")(spark, sf).cache()
    assert(out.count() > 0)
    // Non-negative ids: & 255 is mod 256, shifts are *8 and /4.
    val bad = out.filter(
      col("lo_byte") =!= col("event_id") % 256 ||
      col("shl3") =!= col("event_id") * 8 ||
      col("shr2") =!= floor(col("event_id") / 4) ||
      col("with_flag") < col("event_id"))
    assert(bad.count() === 0L)
    out.unpersist()
  }

  test("lateral top-n equals the window formulation and decorrelates (no per-row loop)") {
    val df = SparkEntry.queries("j16_lateral_topn")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "lateral must not plan as a cartesian product")
    val cust = graft.sources.Tables.load(spark, sf, "customer")
    val nat = graft.sources.Tables.load(spark, sf, "nation")
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val expected = cust.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_custkey", "c_acctbal")
    assert(df.except(expected).count() === 0L)
    assert(expected.except(df).count() === 0L)
  }

  test("percentile_disc matches DuckDB quantile_disc on adversarial small distinct groups") {
    // ADVICE r7 questioned whether a26's oracle match only holds because
    // l_quantity repeats thousands of times per group. It holds in
    // general: BOTH engines implement "smallest value whose cume_dist
    // >= p". Expectations below are DuckDB 1.x quantile_disc outputs
    // probed over groups of DISTINCT values 10,20,...,10n with n
    // deliberately not divisible by 4 (plus the n=1/2 degenerates and
    // the exact-hit sizes 10, where p*n lands on an integer).
    import spark.implicits._
    val expected = Map( // n -> (q1, med, q3)
      1 -> (10, 10, 10), 2 -> (10, 10, 20), 3 -> (10, 20, 30),
      5 -> (20, 30, 40), 6 -> (20, 30, 50), 7 -> (20, 40, 60),
      9 -> (30, 50, 70), 10 -> (30, 50, 80), 11 -> (30, 60, 90),
      13 -> (40, 70, 100))
    val rows = expected.keys.toSeq.flatMap(n => (1 to n).map(i => (n, i * 10)))
    rows.toDF("n", "x").createOrReplaceTempView("pd_groups")
    val got = spark.sql(
      """SELECT n,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY x) AS q1,
        |  percentile_disc(0.5)  WITHIN GROUP (ORDER BY x) AS med,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY x) AS q3
        |FROM pd_groups GROUP BY n""".stripMargin)
      .collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1).toInt, r.getDouble(2).toInt, r.getDouble(3).toInt)))
      .toMap
    assert(got === expected,
      "Spark percentile_disc must pick the same discrete positions as DuckDB quantile_disc")
  }
}
