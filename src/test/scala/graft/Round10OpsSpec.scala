package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Semantic properties of the round-10 operators on CONSTRUCTED data
  * (the oracle rows pin cross-engine agreement at sf0.01; these pin the
  * semantics and the scale-critical plan shapes):
  *  - geo radius join: the grid-blocked join equals brute force —
  *    including a pair straddling the antimeridian — and plans with no
  *    cartesian product;
  *  - gaps-and-islands: known streak structure recovered exactly;
  *  - ACF: an exactly period-7 daily series has lag-7 autocorrelation 1;
  *  - MAD outliers: a spike day flags, and a SECOND spike does not drag
  *    the threshold (robustness property that mean/stddev lacks);
  *  - HLL intersection: inclusion-exclusion band holds, exact value right;
  *  - classifier score: keep == (score > 0), empty doc scores NULL/false,
  *    and the whole plan is shuffle-free up to the dump sort.
  */
class Round10OpsSpec extends SparkSpec {

  private def tmpTables(write: String => Unit): String = {
    val dir = Files.createTempDirectory("graft_r10").toFile.getAbsolutePath
    write(dir)
    dir
  }

  test("g1 grid-blocked radius join equals brute force, incl. antimeridian wrap") {
    import spark.implicits._
    // Both coordinates are a function of key mod 3600; search that
    // universe for a pair that is WITHIN the radius yet straddles the
    // antimeridian — the wrap case the mod-36 cell arithmetic exists for.
    def coords(k: Long) = (-60.0 + (k * 37 % 1200) / 10.0, -180.0 + (k * 91 % 3600) / 10.0)
    def hav(a: (Double, Double), b: (Double, Double)): Double = {
      val sdLat = math.sin(math.toRadians(b._1 - a._1) / 2)
      val sdLon = math.sin(math.toRadians(b._2 - a._2) / 2)
      val x = sdLat * sdLat +
        math.cos(math.toRadians(a._1)) * math.cos(math.toRadians(b._1)) * sdLon * sdLon
      val d = 2 * 6371.0 * math.asin(math.sqrt(math.min(1.0, x)))
      math.floor(d * 100 + 0.5) / 100
    }
    val east = (1L to 3600L).filter(coords(_)._2 > 170)
    val west = (1L to 3600L).filter(coords(_)._2 < -170)
    val (wc, ws) = (for { c <- east; s <- west; if hav(coords(c), coords(s)) < 500.0 }
      yield (c, s)).head
    val custKeys = Seq(wc, 7L, 123L, 999L)
    val suppKeys = Seq(ws, 11L, 321L, 1001L)
    val dir = tmpTables { d =>
      custKeys.toDF("c_custkey").write.parquet(s"$d/customer.parquet")
      suppKeys.toDF("s_suppkey").write.parquet(s"$d/supplier.parquet")
    }
    val out = SparkEntry.queries("g1_geo_radius_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = (for {
      c <- custKeys; s <- suppKeys
      km = hav(coords(c), coords(s)) if km < 500.0
    } yield (c, km)).groupBy(_._1)
      .map { case (c, xs) => (c, xs.size.toLong, xs.map(_._2).min) }.toSet
    assert(out === brute, s"grid join diverged from brute force:\n$out\nvs\n$brute")
    assert(brute.exists(_._1 == wc),
      "the antimeridian-straddling pair must survive the cell wrap")
  }

  test("g1 plans as an equi-join on grid cells — no cartesian / nested-loop") {
    val p = SparkEntry.queries("g1_geo_radius_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "radius join must block on grid cells, not cross-join")
    assert(p.contains("cell_lat"), "join must key on the grid cell id")
  }

  test("w11 gaps-and-islands recovers known streak structure") {
    import spark.implicits._
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // user 1: days 1,2,3 then 5,6 → streaks [3,2], last=2, active=5
    // user 2: days 10 only        → streaks [1], last=1, active=1
    // duplicate events on one day must not split or extend a streak
    val ev = Seq(
      (1L, ts(1)), (1L, ts(2)), (1L, ts(2)), (1L, ts(3)), (1L, ts(5)), (1L, ts(6)),
      (2L, ts(10))
    ).toDF("user_id", "ts")
    val dir = tmpTables(d => ev.write.parquet(s"$d/events.parquet"))
    val rows = SparkEntry.queries("w11_gaps_islands")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq((1L, 2L, 3L, 5L, 2L), (2L, 1L, 1L, 1L, 1L)))
  }

  test("ts6 ACF: an exactly period-7 daily series autocorrelates to 1 at lag 7") {
    import spark.implicits._
    // 28 days, count on day d = 10 + (d mod 7): perfect weekly rhythm.
    val rows = for {
      d <- 1 to 28
      i <- 1 to (10 + (d % 7))
    } yield ("view", Timestamp.valueOf(f"2024-01-$d%02d 08:00:00"))
    val dir = tmpTables(d =>
      rows.toDF("event_type", "ts").write.parquet(s"$d/events.parquet"))
    val acf = SparkEntry.queries("ts6_autocorr")(spark, dir)
      .collect().map(r => (r.getInt(1), r.getDouble(2))).toMap
    assert(acf(7) === 1.0, s"lag-7 ACF of a period-7 series must be 1, got ${acf(7)}")
    assert(acf(1) < 1.0, "lag-1 ACF of a non-constant series must be below 1")
  }

  test("ts7 MAD outliers: spikes flag, and a second spike cannot mask the first") {
    import spark.implicits._
    // 20 quiet days (value 10±ε) and TWO 1000-value spike days: a
    // mean/stddev rule would let the spikes inflate sigma toward
    // masking each other; median/MAD must flag both and no quiet day.
    val rows = (1 to 20).map(d =>
      ("view", Timestamp.valueOf(f"2024-01-$d%02d 08:00:00"), 10.0 + (d % 3) * 0.1)) ++
      Seq(("view", Timestamp.valueOf("2024-01-21 08:00:00"), 1000.0),
        ("view", Timestamp.valueOf("2024-01-22 08:00:00"), 1000.0))
    val dir = tmpTables(d =>
      rows.toDF("event_type", "ts", "value").write.parquet(s"$d/events.parquet"))
    val out = SparkEntry.queries("ts7_mad_outliers")(spark, dir)
      .collect().map(r => (r.getDate(1).toString, r.getBoolean(3))).toMap
    assert(out("2024-01-21") && out("2024-01-22"), "both spike days must flag")
    assert(out.count(_._2) === 2, "no quiet day may flag")
  }

  test("a28 HLL intersection: exact inclusion-exclusion and in-band estimate") {
    import spark.implicits._
    // users 1..60 click, 41..100 view on day 1 → |A∩B| = 20 daily keys.
    val rows =
      (1 to 60).map(u => (u.toLong, Timestamp.valueOf("2024-01-01 08:00:00"), "click")) ++
        (41 to 100).map(u => (u.toLong, Timestamp.valueOf("2024-01-01 09:00:00"), "view"))
    val dir = tmpTables(d =>
      rows.toDF("user_id", "ts", "event_type").write.parquet(s"$d/events.parquet"))
    val r = SparkEntry.queries("a28_hll_intersect")(spark, dir).collect()(0)
    assert(r.getLong(0) === 20L)
    assert(r.getBoolean(1), "estimate must sit inside the 3-sigma band")
  }

  test("classifier score: keep == score>0, empty doc scores NULL/false, shuffle-free plan") {
    import spark.implicits._
    val dir = tmpTables(d => Seq(
      (1L, "alpha beta gamma delta"),
      (2L, ""),
      (3L, "alpha alpha alpha")
    ).toDF("doc_id", "text").write.parquet(s"$d/documents.parquet"))
    val df = SparkEntry.queries("llm_classifier_score")(spark, dir)
    val rows = df.collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).isNullAt(2) && !byId(2L).getBoolean(3),
      "empty doc: NULL score, keep=false")
    rows.filter(!_.isNullAt(2)).foreach { r =>
      assert(r.getBoolean(3) === (r.getDouble(2) > 0.0), "keep must equal score>0")
    }
    // doc 3 is one token repeated: its score IS that token's weight, a
    // pure function — recomputing on a permuted table must agree.
    val score3 = byId(3L).getDouble(2)
    val dir2 = tmpTables(d => Seq((9L, "alpha alpha"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet"))
    val again = SparkEntry.queries("llm_classifier_score")(spark, dir2).collect()(0)
    assert(again.getDouble(2) === score3, "hashed weight must be a pure function")
    // Scale shape: scoring is map-side only — the single exchange in the
    // plan belongs to the deterministic dump sort.
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.size <= 1, s"scoring must not shuffle (found ${exchanges.size})")
  }
}
