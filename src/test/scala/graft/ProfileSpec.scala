package graft

import org.apache.spark.sql.functions._

import graft.operators.ProfileOps

class ProfileSpec extends SparkSpec {

  test("profile counts nulls and exact distincts per column in one pass") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(1.25)),
      (2L, None, Some(3.456)),
      (3L, Some("a"), None),
      (4L, Some("b"), Some(1.25))).toDF("id", "s", "d")
    val p = ProfileOps.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("id", "s", "d"))
    assert(p("id").getLong(1) === 0L && p("id").getLong(2) === 4L)
    assert(p("s").getLong(1) === 1L && p("s").getLong(2) === 2L)
    assert(p("s").getString(3) === "a" && p("s").getString(4) === "b")
    // doubles render quantized to 2 places (portable cross-engine form)
    assert(p("d").getLong(1) === 1L && p("d").getLong(2) === 2L)
    assert(p("d").getString(3) === "1.25" && p("d").getString(4) === "3.46")
  }

  test("profile on an empty table yields zero counts and NULL min/max") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "s").filter(col("id") < 0)
    val rows = ProfileOps.profile(df).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L)
      assert(r.isNullAt(3) && r.isNullAt(4))
    }
  }

  test("approx mode swaps the Expand-based exact distinct for HLL sketches") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, (i % 37).toString)).toDF("id", "s")
    val p = ProfileOps.profile(df, approx = true)
    assert(!p.queryExecution.executedPlan.toString.contains("Expand"),
      "approx profile must not multiply rows through an Expand")
    val m = p.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // HLL at default rsd (5%): wide tolerance, just sanity
    assert(math.abs(m("id") - 1000L) <= 100L)
    assert(math.abs(m("s") - 37L) <= 6L)
  }
}
