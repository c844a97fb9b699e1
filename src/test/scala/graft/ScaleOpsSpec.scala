package graft

import org.apache.spark.sql.functions._

import graft.operators.ScaleOps
import graft.sources.Tables

/** The scale-technique operators: bucketed joins must eliminate both
  * shuffle exchanges; salted joins must preserve join semantics exactly.
  */
class ScaleOpsSpec extends SparkSpec {

  test("bucketized equi-join runs with zero shuffle exchanges") {
    // AQE's AdaptiveSparkPlanExec hides its inner tree from plan
    // collection; disable it so the exchange count inspects the real plan.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
        .select("l_orderkey", "l_quantity")
      val ord = Tables.load(spark, "/root/testdata/sf0.001", "orders")
        .select("o_orderkey", "o_totalprice")

      val bli = ScaleOps.bucketize(spark, li, "b_lineitem", "l_orderkey", 8)
      val bord = ScaleOps.bucketize(spark, ord, "b_orderkey_orders", "o_orderkey", 8)

      val naive = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      // force SMJ (hint on the input side, pre-join) so bucket
      // partitioning — not a broadcast — is what's being tested
      val bucketed = bli.hint("merge").join(bord, col("l_orderkey") === col("o_orderkey"))
      val unbucketed = li.hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))

      assert(ScaleOps.countExchanges(bucketed) === 0)
      assert(ScaleOps.countExchanges(unbucketed) === 2) // the shuffles bucketing removed
      assert(bucketed.count() === naive.count())
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("saltedJoin returns exactly the rows of the plain join") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "value")
    val users = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      .filter(col("user_id") < 200) // overlaps the events user range

    val plain = ev.join(users, "user_id")
      .select("event_id", "user_id", "c_mktsegment")
    val salted = ScaleOps.saltedJoin(ev, users, "user_id", salt = 7)
      .select("event_id", "user_id", "c_mktsegment")

    assert(salted.count() === plain.count())
    assert(plain.exceptAll(salted).count() === 0L)
    assert(salted.exceptAll(plain).count() === 0L)
  }

  test("rangeJoinDays equals the naive BETWEEN theta join (seeded property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def day(n: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(n))
    for (trial <- 1 to 3; bucketDays <- Seq(1, 7, 30)) {
      val points = Seq.fill(60)((rnd.nextInt(1000).toLong, day(rnd.nextInt(120))))
        .toDF("pid", "ts")
      val ranges = Seq.fill(15) {
        val s = rnd.nextInt(100)
        (rnd.nextInt(1000).toLong, day(s), day(s + rnd.nextInt(45)))
      }.toDF("rid", "ws", "we")
      val naive = points.join(ranges, col("ts") >= col("ws") && col("ts") <= col("we"))
        .select("pid", "ts", "rid", "ws", "we")
      val bucketed = ScaleOps.rangeJoinDays(points, "ts", ranges, "ws", "we", bucketDays)
        .select("pid", "ts", "rid", "ws", "we")
      assert(bucketed.count() === naive.count(), s"trial=$trial bucket=$bucketDays")
      assert(naive.exceptAll(bucketed).count() === 0L, s"trial=$trial bucket=$bucketDays")
      assert(bucketed.exceptAll(naive).count() === 0L, s"trial=$trial bucket=$bucketDays")
    }
  }

  test("compact collapses a fragmented table to ~one file per partition") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toFile.getAbsolutePath
    docs.repartition(32).write.mode("overwrite").parquet(s"$base/frag")

    def parquetFiles(p: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(p))
    }
    assert(parquetFiles(s"$base/frag").size === 32)

    ScaleOps.compact(spark.read.parquet(s"$base/frag"), s"$base/tidy",
      Seq("lang"), shufflePartitions = 4, maxRecordsPerFile = 1000000L)

    val langs = docs.select("lang").distinct().count()
    val tidyFiles = parquetFiles(s"$base/tidy")
    assert(tidyFiles.size === langs,
      "exactly one file per lang partition at this size")
    // Pruning layout: every file sits under its lang=... directory.
    assert(tidyFiles.forall(_.getParentFile.getName.startsWith("lang=")))
    // Content preserved (the oracle also proves this vs DuckDB).
    val back = spark.read.parquet(s"$base/tidy")
      .select("doc_id", "text", "lang", "source", "n_chars")
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs.select("doc_id", "text", "lang", "source", "n_chars")).count() === 0L)
  }

  test("saltedJoin left-outer preserves unmatched fact rows exactly once") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b"), (99L, "no-match")).toDF("k", "v")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    val out = ScaleOps.saltedJoin(fact, dim, "k", salt = 4, joinType = "left")
    assert(out.count() === 3L)
    assert(out.filter(col("w").isNull).select("v").head().getString(0) === "no-match")
  }

  test("z-order layout bounds file overlap on BOTH columns; single-sort only on one") {
    // Uncorrelated keys: a narrow window on either column should touch
    // a bounded fraction of the z-ordered files (each file's min/max
    // footer covers a compact rectangle), while a layout sorted only by
    // partkey leaves suppkey stats useless (every file spans the whole
    // suppkey domain -> no pruning).
    val dir = "/root/testdata/sf0.01"
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey")
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    ScaleOps.zorderWrite(li, s"$tmp/z", "l_partkey", "l_suppkey", nFiles = 16)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/sorted")

    def overlapFraction(path: String, c: String, lo: Long, hi: Long): Double = {
      val files = spark.read.parquet(path).inputFiles
      val touching = files.count { f =>
        val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }
      touching.toDouble / files.length
    }
    // ~14%-of-domain windows INSIDE one top-2-bit quadrant strip
    // ([0.25, 0.5) after min-max normalization): a window crossing the
    // 0.5 boundary would touch two strips by construction — the known
    // Z-curve discontinuity — and measure the curve's worst case rather
    // than its typical pruning.
    val Array(pLo, pHi) = li.stat.approxQuantile("l_partkey", Array(0.28, 0.42), 0.001)
    val Array(sLo, sHi) = li.stat.approxQuantile("l_suppkey", Array(0.28, 0.42), 0.001)
    val zP = overlapFraction(s"$tmp/z", "l_partkey", pLo.toLong, pHi.toLong)
    val zS = overlapFraction(s"$tmp/z", "l_suppkey", sLo.toLong, sHi.toLong)
    val sortedP = overlapFraction(s"$tmp/sorted", "l_partkey", pLo.toLong, pHi.toLong)
    val sortedS = overlapFraction(s"$tmp/sorted", "l_suppkey", sLo.toLong, sHi.toLong)
    info(f"overlap z: partkey $zP%.2f suppkey $zS%.2f; sorted: partkey $sortedP%.2f suppkey $sortedS%.2f")
    assert(zP <= 0.6, "z-order must bound partkey-window overlap")
    assert(zS <= 0.6, "z-order must bound suppkey-window overlap")
    assert(sortedP <= 0.25, "single-column sort prunes its own column best")
    assert(sortedS >= 0.9, "single-column sort cannot prune the other column")
    // the z layout holds the full row multiset
    val back = spark.read.parquet(s"$tmp/z")
    assert(back.count() === li.count())
    assert(back.exceptAll(li).count() === 0L)
  }
}
