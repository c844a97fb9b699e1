package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques as first-class, reusable operators (the 100 TB
  * toolkit the builder prompt calls for): bucketed co-located joins and
  * salted skew joins. Both are semantics-preserving rewrites — proved by
  * equality tests against the naive join in `ScaleOpsSpec`.
  */
object ScaleOps {

  /** Persist both sides bucketed by the join key so subsequent equi-joins
    * are exchange-free: with matching bucket counts, Spark's
    * `FileSourceScanExec` reports the hash partitioning and the join
    * needs NO shuffle on either side — on a 100 TB fact table this is the
    * difference between re-shuffling the table per query and reading
    * co-located buckets. Returns the re-read bucketed tables.
    */
  def bucketize(spark: SparkSession, df: DataFrame, table: String,
                key: String, buckets: Int): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // A previous session may have left the managed location behind (the
    // in-memory catalog forgets tables across JVMs but not their files).
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    spark.table(table)
  }

  /** Salted equi-join for skewed keys: explode the small/dimension side
    * into `salt` replicas and scatter the skewed fact side uniformly
    * across them, so one hot key spreads over `salt` reducers instead of
    * one straggler. Random-free: the scatter uses a deterministic hash of
    * the fact row, keeping results reproducible. AQE's skew-join split
    * handles moderate skew automatically; explicit salting is for the
    * pathological keys AQE can't split (single-key hot spots inside one
    * task's range).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    val allFactCols = fact.columns.toIndexedSeq.map(col)
    val scatter = pmod(hash(allFactCols: _*), lit(salt))
    val saltedFact = fact.withColumn("__fsalt", scatter)
    saltedFact.join(saltedDim,
      saltedFact(key) === saltedDim(key) && col("__fsalt") === col("__salt"),
      joinType)
      .drop("__salt").drop("__fsalt").drop(saltedDim(key))
  }

  /** Bucketed interval (range) join: probe rows whose date falls inside
    * a range-side [start, end] window, WITHOUT the theta-join cartesian a
    * naive `BETWEEN` predicate plans as (BroadcastNestedLoopJoin — a
    * scale-killer when neither side broadcasts). Each range explodes to
    * its covering `bucketDays`-sized day buckets (fan-out ≤
    * rangeLen/bucketDays + 1, bounded when ranges are), the probe side
    * maps to its single bucket, and the join becomes a plain shuffled
    * EQUI-join on the bucket with the exact BETWEEN as a residual filter.
    * The standard relational formulation of interval joins at scale.
    */
  def rangeJoinDays(probe: DataFrame, tsCol: String, ranges: DataFrame,
                    startCol: String, endCol: String, bucketDays: Int): DataFrame = {
    require(bucketDays > 0, "bucketDays must be positive")
    val epoch = lit("1970-01-01").cast("date")
    def bucketOf(c: Column): Column = floor(datediff(c, epoch) / bucketDays)
    val pb = probe.withColumn("__bucket", bucketOf(col(tsCol)))
    val rb = ranges.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    pb.join(rb, Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Small-file compaction: rewrite a fragmented dataset into a
    * partition-pruned layout with bounded file counts — the maintenance
    * job every long-lived 100 TB table needs (streaming sinks and
    * incremental overwrites accrete kilobyte files until scan cost is
    * file-open overhead and the driver chokes on listing). The
    * `repartition` on the partition columns routes each Hive partition
    * to one task (one file per partition dir at the target), while
    * `maxRecordsPerFile` re-splits any partition too big for a single
    * healthy file — so file count is Θ(partitions + data/target), the
    * layout a 1000-executor scan wants. Content-preserving — proved by
    * the `s12_compact_roundtrip` oracle; file-count collapse by
    * `ScaleOpsSpec`.
    */
  def compact(df: DataFrame, out: String, partCols: Seq[String],
              shufflePartitions: Int, maxRecordsPerFile: Long,
              sortCols: Seq[String] = Nil): Unit =
    df.repartition(shufflePartitions, partCols.map(col): _*)
      // Clustering rows by sortCols inside each file tightens parquet
      // row-group min/max stats, so later range predicates on those
      // columns skip whole row groups — free pruning at read time.
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCols: _*)
      .parquet(out)

  /** Dense sequential ids (1..N in `orderCol` order) WITHOUT the
    * single-task trap: the naive `row_number() OVER (ORDER BY ...)`
    * plans a global window — every row through ONE task, the canonical
    * driver-shaped bottleneck at 100 TB. Here the global order is
    * decomposed by a caller-supplied deterministic `bucket` expression
    * (monotone in `orderCol`, e.g. `floor(doc_id / 1M)` or a date): a
    * tiny per-bucket count table gets cumulative offsets (the only
    * global window runs over #buckets rows, not N), broadcasts back,
    * and each bucket numbers its own rows in parallel.
    * id = bucket_offset + rank_within_bucket.
    */
  def denseIds(df: DataFrame, orderCol: String, bucket: Column,
               idCol: String = "id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.withColumn("__bucket", bucket)
    val offsets = b.groupBy("__bucket").agg(count(lit(1)).as("__n"))
      .withColumn("__offset", coalesce(
        sum("__n").over(Window.orderBy("__bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    b.join(broadcast(offsets), "__bucket")
      .withColumn(idCol, col("__offset") +
        row_number().over(Window.partitionBy("__bucket").orderBy(orderCol)))
      .drop("__bucket", "__offset")
  }

  private val denseIdsQ = QueryDef(
    "s13_dense_ids",
    (s, dir) => denseIds(
      graft.sources.Tables.load(s, dir, "documents").select("doc_id", "lang"),
      "doc_id", floor(col("doc_id") / 100))
      .select("doc_id", "lang", "id")
      .orderBy("doc_id"),
    Some("""SELECT doc_id, lang,
           |row_number() OVER (ORDER BY doc_id) AS id
           |FROM documents ORDER BY doc_id""".stripMargin))

  private val compactRoundTrip = QueryDef(
    "s12_compact_roundtrip",
    (s, dir) => {
      val docs = graft.sources.Tables.load(s, dir, "documents")
      val base = s"${sys.props("java.io.tmpdir")}/graft-compact-${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      // Fragment first — simulate a micro-batch sink's accretion.
      docs.repartition(64).write.mode("overwrite").parquet(s"$base/frag")
      compact(s.read.parquet(s"$base/frag"), s"$base/tidy",
        Seq("lang"), shufflePartitions = 4, maxRecordsPerFile = 1000000L, sortCols = Seq("doc_id"))
      s.read.parquet(s"$base/tidy")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, text, lang, source, n_chars
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Count the shuffle exchanges in a frame's executed plan — the metric
    * the bucketed-join test asserts on.
    */
  def countExchanges(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size
  }

  /** Oracle-checked rows for the scale rewrites: `ScaleOpsSpec` proves
    * the PLAN properties (zero exchanges, salt fan-out), these prove the
    * RESULTS against a plain-join DuckDB oracle — a semantics-preserving
    * rewrite must be invisible in the output.
    */
  private val bucketizeJoin = QueryDef(
    "s_bucketize_join",
    (s, dir) => {
      val ord = graft.sources.Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val cust = graft.sources.Tables.load(s, dir, "customer")
        .select("c_custkey", "c_mktsegment")
      val bord = bucketize(s, ord, "sq_orders_bkt", "o_custkey", 8)
      val bcust = bucketize(s, cust, "sq_customer_bkt", "c_custkey", 8)
      // merge hint keeps the co-located sort-merge path (not broadcast),
      // i.e. the plan shape ScaleOpsSpec certifies as exchange-free.
      bord.hint("merge").join(bcust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n_orders,
           |round(sum(o_totalprice), 2) AS sum_price
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  private val saltedJoinQ = QueryDef(
    "s_salted_join",
    (s, dir) => {
      val ev = graft.sources.Tables.load(s, dir, "events")
        .select("event_id", "user_id", "value")
      val cust = graft.sources.Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      saltedJoin(ev, cust, "user_id", salt = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n_events,
           |round(sum(value), 2) AS sum_value
           |FROM events JOIN customer ON user_id = c_custkey
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** Join-key skew report — the diagnostic that picks the dial between
    * the plain, bucketed, and salted join paths above: per-key counts,
    * the top-5 heavy keys with their corpus share, and the
    * max/avg skew ratio in exact BIGINT ten-thousandths. One key
    * aggregate (map-side combined) + a TakeOrderedAndProject top-5 +
    * a 1-row broadcast stats scalar: diagnosing a 100 TB join key
    * costs one pass, and the report is 5 rows.
    */
  private val skewReport = QueryDef(
    "s18_skew_report",
    (s, dir) => {
      val counts = graft.sources.Tables.load(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      val stats = counts.agg(count(lit(1)).as("n_keys"), sum("cnt").as("total"),
        max("cnt").as("max_cnt"))
      counts.orderBy(col("cnt").desc, col("user_id")).limit(5)
        .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("user_id"))).cast("int"))
        .crossJoin(broadcast(stats))
        .select(col("rank"), col("user_id").as("key"), col("cnt"),
          expr("cnt * 10000 div total").as("share_q"),
          col("n_keys"),
          expr("total div n_keys").as("avg_cnt"),
          expr("max_cnt * 10000 div (total div n_keys)").as("skew_ratio_q"))
        .orderBy("rank")
    },
    Some("""WITH counts AS (
           |  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY user_id),
           |stats AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total,
           |         max(cnt) AS max_cnt FROM counts),
           |top5 AS (
           |  SELECT user_id, cnt,
           |    CAST(row_number() OVER (ORDER BY cnt DESC, user_id) AS INTEGER) AS rank
           |  FROM counts ORDER BY cnt DESC, user_id LIMIT 5)
           |SELECT rank, user_id AS key, cnt,
           |  cnt * 10000 // total AS share_q,
           |  n_keys,
           |  total // n_keys AS avg_cnt,
           |  max_cnt * 10000 // (total // n_keys) AS skew_ratio_q
           |FROM top5, stats ORDER BY rank""".stripMargin))

  /** Morton (Z-order) bit-spread: the 16 low bits of `c` move to the
    * even bit positions of a 32-bit value. Pure bitwise column
    * arithmetic — stays inside whole-stage codegen.
    */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** 32-bit Z-value interleaving two 16-bit normalized coordinates. */
  private[graft] def zvalue16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Z-order clustered write: rows sort by the Morton interleave of the
    * two columns' min-max-normalized 16-bit coordinates and land in
    * `nFiles` contiguous-z files. Because the Z-curve alternates bits of
    * BOTH dimensions, every file's parquet min/max footer covers a
    * compact rectangle in (colA, colB) space, so a selective predicate
    * on EITHER column row-group-prunes most files — where a layout
    * sorted only by colA prunes nothing for colB predicates
    * (`ScaleOpsSpec` measures both layouts' file-overlap fractions).
    * This is the multi-dimensional generalization of `compact`'s
    * single-column `sortCols` clustering — the Delta/Iceberg OPTIMIZE
    * ZORDER shape, done relationally.
    *
    * Determinism caveat: `repartitionByRange` samples range boundaries,
    * so FILE assignment may vary run to run; the row SET is exact and
    * the clustering property holds regardless, which is what the
    * roundtrip oracle and the pruning spec check respectively.
    */
  def zorderWrite(df: DataFrame, path: String, colA: String, colB: String,
                  nFiles: Int): Unit = {
    val stats = df.agg(
      min(col(colA).cast("long")).as("__mina"), max(col(colA).cast("long")).as("__maxa"),
      min(col(colB).cast("long")).as("__minb"), max(col(colB).cast("long")).as("__maxb"))
    def norm(c: String, mn: Column, mx: Column): Column =
      when(mx > mn,
        floor((col(c).cast("long") - mn) * lit(65535.0) / (mx - mn)).cast("long"))
        .otherwise(lit(0L))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zvalue16(
        norm(colA, col("__mina"), col("__maxa")),
        norm(colB, col("__minb"), col("__maxb"))))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__mina", "__maxa", "__minb", "__maxb")
      .write.mode("overwrite").parquet(path)
  }

  private val zorderRoundTrip = QueryDef(
    "s20_zorder_roundtrip",
    (s, dir) => {
      val li = graft.sources.Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
      // applicationId keys the path per Spark application: two
      // concurrent sessions benchmarking the same sources dir would
      // otherwise race one shared tmp path (one overwrites mid-read).
      val base = s"${sys.props("java.io.tmpdir")}/graft-zorder-" +
        s"${s.sparkContext.applicationId}-${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      zorderWrite(li, base, "l_partkey", "l_suppkey", nFiles = 16)
      s.read.parquet(base)
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
           |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin))

  val all: Seq[QueryDef] = Seq(bucketizeJoin, saltedJoinQ, compactRoundTrip, denseIdsQ,
    skewReport, zorderRoundTrip)
}
