package graft.engine

import org.apache.spark.sql.functions._

import graft.operators.QueryDef
import graft.sources.Tables

/** Oracle row for the dbt snapshot `timestamp` strategy
  * ([[DagRunner.writeSnapshotTimestamp]]): a deterministic 3-batch
  * replay over the events table whose SCD2 output DuckDB reconstructs
  * independently — the engine-materialization analog of the
  * `w8_scd2_history` window row. (The `check` strategy is pinned by
  * `SnapshotSpec`; this row pins the OTHER standard strategy end-to-end
  * through the real staging + rename-swap publish path.)
  *
  * Replay: per cutoff C in {Jan 11, Jan 21, Jan 31 2024}, the source is
  * each user's rollup over events with ts < C — `updated_at = max(ts)`,
  * `n_events = count(*)`. Because the cutoff only grows over a static
  * table, a user's `updated_at` strictly increases exactly when new
  * events entered the window, so the timestamp strategy's
  * "strictly newer closes the open version" rule yields one version per
  * cutoff at which the user gained events — which the oracle rebuilds
  * with a lag/lead pass over the same per-cutoff rollups. Validity
  * stamps are compared as TIMESTAMP (the snapshot's string stamps cast
  * back) so the check never depends on fractional-second formatting.
  */
object SnapshotQueries {

  private val cutoffs =
    Seq("2024-01-11 00:00:00", "2024-01-21 00:00:00", "2024-01-31 00:00:00")

  private val snapshotTimestamp = QueryDef(
    "s19_snapshot_timestamp",
    (s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_snapts")
        .toFile.getAbsolutePath + "/snap"
      val events = Tables.load(s, dir, "events")
      cutoffs.foreach { c =>
        val batch = events.filter(col("ts") < lit(c).cast("timestamp"))
          .groupBy(col("user_id"))
          .agg(max(col("ts")).as("updated_at"), count(lit(1)).as("n_events"))
        DagRunner.writeSnapshotTimestamp(s, batch, path, "user_id", "updated_at")
      }
      val snap = s.read.parquet(path)
        .select(col("user_id"), col("n_events"), col("updated_at"),
          col("dbt_valid_from").cast("timestamp").as("valid_from"),
          col("dbt_valid_to").cast("timestamp").as("valid_to"))
      snap.orderBy(snap.columns.toIndexedSeq.map(c => col(c).asc_nulls_first): _*)
    },
    Some(s"""WITH cutoffs AS (
           |  SELECT unnest([${cutoffs.map(c => s"TIMESTAMP '$c'").mkString(", ")}]) AS cutoff),
           |per AS (
           |  SELECT user_id, cutoff, max(CAST(ts AS TIMESTAMP)) AS updated_at,
           |         CAST(count(*) AS BIGINT) AS n_events
           |  FROM events CROSS JOIN cutoffs
           |  WHERE CAST(ts AS TIMESTAMP) < cutoff
           |  GROUP BY 1, 2),
           |dedup AS (
           |  SELECT *, lag(updated_at) OVER (PARTITION BY user_id ORDER BY cutoff) AS prev
           |  FROM per),
           |versions AS (
           |  SELECT user_id, n_events, updated_at FROM dedup
           |  WHERE prev IS NULL OR updated_at > prev),
           |final AS (
           |  SELECT user_id, n_events, updated_at,
           |    updated_at AS valid_from,
           |    lead(updated_at) OVER (PARTITION BY user_id ORDER BY updated_at) AS valid_to
           |  FROM versions)
           |SELECT user_id, n_events, updated_at, valid_from, valid_to FROM final
           |ORDER BY ALL NULLS FIRST""".stripMargin))

  val all: Seq[QueryDef] = Seq(snapshotTimestamp)
}
