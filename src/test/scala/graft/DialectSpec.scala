package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.dialect.Dialect._

/** Unit tests for the BigQuery-dialect shims — the highest-risk semantic
  * translations (SURVEY.md §7.4).
  */
class DialectSpec extends SparkSpec {

  test("isoWeek/isoYear match java.time's ISO week fields across random dates") {
    import java.time.LocalDate
    import java.time.temporal.WeekFields
    val rnd = new scala.util.Random(11)
    val dates = Seq.tabulate(300)(_ =>
      LocalDate.of(2015 + rnd.nextInt(12), 1 + rnd.nextInt(12), 1 + rnd.nextInt(28))) ++
      // The boundary traps the reference depends on (spine start, W53).
      Seq("2018-12-31", "2019-01-01", "2020-12-31", "2021-01-01", "2016-01-03",
        "2015-12-28").map(LocalDate.parse)
    val df = spark.createDataFrame(
      dates.map(d => Tuple1(java.sql.Date.valueOf(d)))).toDF("d")
    val got = df.select(col("d"), isoWeek(col("d")), isoYear(col("d")))
      .collect().map(r => r.getDate(0).toLocalDate ->
        (r.getInt(1), r.getInt(2))).toMap
    dates.foreach { d =>
      val expected = (d.get(WeekFields.ISO.weekOfWeekBasedYear()),
        d.get(WeekFields.ISO.weekBasedYear()))
      assert(got(d) === expected, s"date $d")
    }
  }

  test("safeOffset is 0-based and NULL out of range, like SAFE_OFFSET") {
    val df = spark.range(1).select(split(lit("a,b,c"), ",").as("arr"))
    val r = df.select(
      safeOffset(col("arr"), 0), safeOffset(col("arr"), 2),
      safeOffset(col("arr"), 3), safeOffset(col("arr"), 99)).head()
    assert(r === Row("a", "c", null, null))
  }

  test("splitLit treats _||_ as a literal, not a regex alternation") {
    val df = spark.range(1).select(lit("name_||_mid_||_x").as("s"))
    val r = df.select(splitLit(col("s"), "_||_").as("p")).head().getSeq[String](0)
    assert(r === Seq("name", "mid", "x"))
    // The unquoted regex would explode into per-character fragments.
    val broken = df.select(split(col("s"), "_||_").as("p")).head().getSeq[String](0)
    assert(broken !== Seq("name", "mid", "x"))
  }

  test("ISO week/year at year boundaries (why the reference spine starts 2018-12-31)") {
    val df = spark.createDataFrame(Seq(
      Tuple1(Date.valueOf("2018-12-30")), Tuple1(Date.valueOf("2018-12-31")),
      Tuple1(Date.valueOf("2019-01-01")), Tuple1(Date.valueOf("2020-12-31")),
      Tuple1(Date.valueOf("2021-01-01")), Tuple1(Date.valueOf("2021-01-04"))))
      .toDF("d")
    val out = df.select(col("d"), isoWeek(col("d")).as("w"), isoYear(col("d")).as("y"))
      .collect()
      .map(r => r.getDate(0).toString -> ((r.getInt(1), r.getAs[Number](2).intValue())))
      .toMap
    assert(out("2018-12-30") === ((52, 2018)))
    assert(out("2018-12-31") === ((1, 2019))) // Monday of ISO week 1, 2019
    assert(out("2019-01-01") === ((1, 2019)))
    assert(out("2020-12-31") === ((53, 2020))) // 2020 has ISO week 53
    assert(out("2021-01-01") === ((53, 2020)))
    assert(out("2021-01-04") === ((1, 2021)))
  }

  test("timestampDiffSeconds truncates sub-second deltas") {
    val df = spark.range(1).select(
      to_timestamp(lit("2024-01-01 00:00:10.900")).as("a"),
      to_timestamp(lit("2024-01-01 00:00:00.000")).as("b"))
    assert(df.select(timestampDiffSeconds(col("a"), col("b"))).head().getLong(0) === 10L)
    assert(df.select(timestampDiffMinutes(col("a"), col("b"))).head().getLong(0) === 0L)
  }

  test("generateDateArray is end-inclusive on step boundaries") {
    val r = spark.range(1).select(generateDateArray(
      lit(Date.valueOf("2024-01-01")), lit(Date.valueOf("2024-01-15")), 7).as("a"))
      .head().getSeq[Date](0)
    assert(r.map(_.toString) === Seq("2024-01-01", "2024-01-08", "2024-01-15"))
  }

  test("stringAggOrdered is deterministic regardless of input order") {
    val df = spark.createDataFrame(Seq((1, "c"), (1, "a"), (1, "b"))).toDF("k", "v")
      .repartition(3)
    val r = df.groupBy("k").agg(stringAggOrdered(col("v"), ",").as("s")).head().getString(1)
    assert(r === "a,b,c")
  }

  test("nullifEmpty maps empty strings to NULL (empty split segments)") {
    val df = spark.range(1).select(splitLit(lit("a_||__||_c"), "_||_").as("p"))
    val r = df.select(nullifEmpty(safeOffset(col("p"), 1))).head()
    assert(r.isNullAt(0))
  }

  test("div truncates like BigQuery DIV for non-negative operands") {
    val r = spark.range(1).select(div(lit(1234), lit(100))).head().getLong(0)
    assert(r === 12L)
  }

  test("roundTo matches fixed-point half-up on representable values") {
    val r = spark.range(1).select(
      roundTo(lit(2.345), 2), roundTo(lit(2.5), 0), roundTo(lit(1.0 / 3.0), 4)).head()
    assert(math.abs(r.getDouble(0) - 2.35) < 1e-12)
    assert(r.getDouble(1) === 3.0)
    assert(r.getDouble(2) === 0.3333)
  }

  test("stringAggOrderedLarge equals the naive form on a pathologically skewed key") {
    import spark.implicits._
    // One hot group 50k values, others tiny — the shape that OOMs a
    // single collect_list buffer at scale.
    val rows = (0 until 50000).map(i => ("hot", f"v$i%06d")) ++
      (0 until 20).map(i => (s"g${i % 4}", f"w$i%03d"))
    val df = rows.toDF("k", "v").repartition(8)
    val naive = df.groupBy("k").agg(stringAggOrdered(col("v"), ",").as("v_agg"))
    val large = stringAggOrderedLarge(df, Seq("k"), "v", ",", chunks = 16)
    val n = naive.orderBy("k").as[(String, String)].collect()
    val l = large.orderBy("k").as[(String, String)].collect()
    assert(l.map(_._1).toSeq === n.map(_._1).toSeq)
    assert(l.map(_._2).toSeq === n.map(_._2).toSeq,
      "chunked concatenation must be byte-identical to the single-buffer form")
    // Ties across chunk boundaries must not duplicate or drop values.
    val ties = (0 until 1000).map(i => ("t", s"dup${i % 3}")).toDF("k", "v")
    val tn = ties.groupBy("k").agg(stringAggOrdered(col("v"), ",").as("v_agg"))
      .head().getString(1)
    val tl = stringAggOrderedLarge(ties, Seq("k"), "v", ",", chunks = 7)
      .head().getString(1)
    assert(tl === tn)
  }

  test("safe_cast keeps try_cast semantics with the exception path short-circuited") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // String → int: digit-guarded path must agree with try_cast on
    // every shape — clean, padded, garbage, digit-containing garbage,
    // overflow, decimal, sign-only, empty, null.
    val inputs = Seq("5", " 7 ", "-12", "+3", "abc", "12abc", "99999999999",
      "1.5", "-", "", null)
    val both = inputs.toDF("s")
      .selectExpr("s", "safe_cast(s, 'int') AS g", "try_cast(s AS int) AS t")
      .collect()
    both.foreach(r => assert(r.get(1) === r.get(2),
      s"safe_cast diverged from try_cast on '${r.get(0)}': ${r.get(1)} vs ${r.get(2)}"))
    // Non-string children delegate to the plain TRY cast — a string-side
    // digit guard would get boolean→int WRONG (true has no digit).
    assert(Seq(true, false).toDF("b").selectExpr("safe_cast(b, 'int') AS i")
      .as[Int].collect().toSeq === Seq(1, 0))
    // Non-integral targets delegate too (double accepts digit-free
    // spellings like 'Infinity' / 'NaN').
    val d = Seq("Infinity", "NaN", "2.5").toDF("s")
      .selectExpr("safe_cast(s, 'double') AS d").as[Double].collect()
    assert(d(0).isPosInfinity && d(1).isNaN && d(2) === 2.5)
  }
}
