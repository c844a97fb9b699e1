package graft.models

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dialect.Dialect._

/** `atinternet_smarttag_streams_daily_v4` — the incremental intermediary:
  * match livestream events to broadcast shows per minute (as-of to the
  * nearest show start), clean+split the AT Internet payload, aggregate to
  * stream then to day, and enrich with POMS metadata.
  * Reference: `/root/reference/models/datamarts/npo-data-hub/intermediary/
  * atinternet_smarttag_streams_daily_v4.sql:1-244`.
  *
  * The rolling reprocessing window (today-8 .. today, lines 1-12) arrives
  * as `partitions`; the same list drives BOTH source filters (lines 75,
  * 101) and the insert-overwrite partition list — the invariant
  * `DagRunner.writeIncremental` encodes once.
  */
object StreamsDaily {

  def partitionsFor(today: Date): Seq[String] =
    (0 to 8).map(i => Date.valueOf(today.toLocalDate.minusDays(i)).toString)

  /** refs: advantedge, media_events, live_stream_name_mapping_v1, poms. */
  def build(adv: DataFrame, mediaEvents: DataFrame, channelMapping: DataFrame,
            poms: DataFrame, partitions: Seq[String]): DataFrame = {

    // Minute-densified broadcast rows, NPO channels only, deduped
    // (streams_daily:26-41).
    val advEvents = adv
      .filter(col("channel").rlike("NPO"))
      .select(col("date").as("adv_date"),
        col("beginTimeCET").as("adv_beginTimeCET"),
        col("endTimeCET").as("adv_endTimeCET"),
        explode(sequence(col("beginTimeCET").cast("timestamp"),
          col("endTimeCET").cast("timestamp"), expr("interval 1 minute"))).as("adv_minute"),
        col("title").as("adv_title"), col("channel").as("adv_channel"),
        col("mediaId").as("adv_mid"))
      .distinct()

    val content = splitLit(col("d_rm_content"), "_||_")
    // theme2 sometimes holds a bogus hh:mm:ss value — the reference's
    // regex gate keeps only values containing the delimiter
    // (streams_daily:56-59, pattern ported verbatim).
    val theme2 = when(col("d_rm_theme2").rlike("_/|/|_"),
      splitLit(col("d_rm_theme2"), "_||_")).otherwise(lit(null).cast("array<string>"))

    def rawSelect(df: DataFrame): DataFrame = df.select(
      col("d_rm_playid"),
      concat(col("d_visit_id"), col("d_uv_id")).as("unique_user_id"),
      col("d_date_hour_event"), col("d_rm_action"), col("d_rm_l2"),
      col("d_rm_playback_time"),
      content.as("content"),
      splitLit(col("d_rm_theme1"), "_||_").as("theme1"),
      theme2.as("theme2"),
      splitLit(col("d_rm_theme3"), "_||_").as("theme3"),
      col("d_rm_type"))

    val inWindow = col("d_date_hour_event").cast("date").cast("string").isin(partitions: _*)

    // Livestream branch: join channel mapping on the mid extracted from
    // the split payload, as-of match to the nearest started show
    // (streams_daily:43-75).
    val live = rawSelect(mediaEvents)
      .filter(col("d_rm_type") =!= "Animations" &&
        col("d_rm_theme1") === "livetvzender" && inWindow)
      .join(channelMapping,
        col("channel_id") === nullifEmpty(safeOffset(col("content"), 1)), "inner")
      .join(advEvents,
        col("channel") === col("adv_channel") &&
          truncMinute(col("d_date_hour_event")) === col("adv_minute"), "left")
      .withColumn("matched_livestream_id", col("adv_mid"))
      .withColumn("stream_match_type",
        when(col("adv_mid").isNotNull, "livetvzender - streamID_matched")
          .otherwise("livetvzender - no_streamID_to_match"))
      .withColumn("dedup", row_number().over(
        Window.partitionBy(col("d_rm_playid"), col("unique_user_id"),
          col("d_date_hour_event"), col("d_rm_action"), col("d_rm_playback_time"))
          .orderBy(timestampDiffSeconds(col("d_date_hour_event"),
            col("adv_beginTimeCET").cast("timestamp")).asc)))
      .select("d_rm_playid", "unique_user_id", "d_date_hour_event", "d_rm_action",
        "d_rm_l2", "d_rm_playback_time", "content", "matched_livestream_id",
        "theme1", "theme2", "theme3", "stream_match_type", "dedup")

    // Regular (non-live) branch with a faked dedup (streams_daily:77-101).
    val regular = rawSelect(mediaEvents)
      .filter(col("d_rm_type") =!= "Animations" &&
        (col("d_rm_theme1").isNull || col("d_rm_theme1") =!= "livetvzender") && inWindow)
      .withColumn("matched_livestream_id", lit(null).cast("string"))
      .withColumn("stream_match_type", lit("regular streamid"))
      .withColumn("dedup", lit(1))
      .select("d_rm_playid", "unique_user_id", "d_date_hour_event", "d_rm_action",
        "d_rm_l2", "d_rm_playback_time", "content", "matched_livestream_id",
        "theme1", "theme2", "theme3", "stream_match_type", "dedup")

    val rawEvents = live.unionAll(regular)

    // Per-stream aggregation with payload cleaning (streams_daily:104-137).
    val perStream = rawEvents.filter(col("dedup") === 1)
      .groupBy(
        col("d_rm_playid"), col("unique_user_id"),
        col("d_date_hour_event").cast("date").as("evt_date"),
        nullifEmpty(safeOffset(col("content"), 1)).as("evt_base_mid"),
        col("stream_match_type"),
        coalesce(col("matched_livestream_id"),
          nullifEmpty(safeOffset(col("content"), 1))).as("evt_mid"),
        nullifEmpty(safeOffset(col("content"), 0)).as("evt_media_name"),
        nullif(nullifEmpty(safeOffset(col("theme1"), 0)), lit("null")).as("evt_stream_type"),
        nullif(safeOffset(col("theme2"), 0), lit("null")).as("evt_programme"),
        nullif(safeOffset(col("theme2"), 1), lit("null")).as("evt_broadcaster"),
        safeOffset(col("theme2"), 2).as("evt_programme_podcast"),
        safeOffset(col("theme3"), 0).as("evt_player_platform"),
        safeOffset(col("theme3"), 1).as("evt_player_version"),
        col("d_rm_l2").as("evt_brand"))
      .agg(
        sum("d_rm_playback_time").as("evt_playback_time_total_in_sec"),
        countDistinct(when(col("d_rm_action") === "Play" ||
          col("stream_match_type") === "livetvzender - streamID_matched",
          col("d_rm_playid"))).as("evt_play_count_total"))

    // Per-date aggregation with the 30s threshold (streams_daily:139-161).
    val perDate = perStream
      .groupBy("evt_date", "evt_mid", "evt_base_mid", "evt_media_name",
        "stream_match_type", "evt_stream_type", "evt_programme", "evt_broadcaster",
        "evt_programme_podcast", "evt_player_platform", "evt_player_version", "evt_brand")
      .agg(
        countDistinct("unique_user_id").as("n_unique_userids"),
        sum("evt_playback_time_total_in_sec").as("evt_playback_time_total_in_sec"),
        sum("evt_play_count_total").as("evt_play_count_total"),
        sum(when(col("evt_playback_time_total_in_sec") >= 30,
          col("evt_play_count_total")).otherwise(0)).as("evt_play_count_over_30s"))

    // Indexable season/series descendants (streams_daily:163-176).
    val metadataDescendants = poms
      .select(col("id"), explode(col("descendant_of")).as("d"))
      .select(col("id"), col("d.type").as("type"), col("d.mid_ref").as("mid_ref"))
      .filter(col("type").isin("SEASON", "SERIES"))
      .withColumn("index", row_number().over(
        Window.partitionBy("id", "type").orderBy("id", "type", "mid_ref")))

    // Highest SEASON index among episode_of entries (streams_daily:206-213;
    // the reference reads `e.index` off the episode_of struct).
    val episode = poms
      .select(col("id"), explode(col("episode_of")).as("e"))
      .groupBy("id")
      .agg(max(when(col("e.type") === "SEASON", col("e.index"))).as("ep_index"))

    // Ordered broadcaster aggregate (streams_daily:216-223).
    val broadcastersAgg = poms
      .select(col("id"), explode(col("broadcasters")).as("b"))
      .groupBy("id")
      .agg(stringAggOrdered(col("b.value"), ",").as("mtd_broadcasters"))

    // First NED1/2/3 channel (streams_daily:226-237): distinct then rank.
    val channels = poms
      .select(col("id"), explode(col("schedule_events")).as("s"))
      .select(col("id"), col("s.channel").as("channel"))
      .filter(col("channel").isin("NED1", "NED2", "NED3"))
      .distinct()
      .withColumn("index", row_number().over(
        Window.partitionBy("id").orderBy("id", "channel")))
      .filter(col("index") === 1)

    // Enriched metadata (streams_daily:178-238).
    val season = metadataDescendants.filter(col("type") === "SEASON" && col("index") === 1)
      .select(col("id").as("season_id_key"), col("mid_ref").as("mtd_season_mid"))
    val series = metadataDescendants.filter(col("type") === "SERIES" && col("index") === 1)
      .select(col("id").as("series_id_key"), col("mid_ref").as("mtd_series_mid"))

    val metadata = poms
      .select(col("id"),
        div(col("duration"), lit(1000)).as("mtd_duration_in_sec"),
        col("sort_date").as("mtd_sort_date"),
        col("type").as("mtd_type"),
        safeOffset(safeOffset(col("genres"), 0).getField("terms"), 0).as("mtd_genre_main"),
        safeOffset(safeOffset(col("genres"), 0).getField("terms"), 1).as("mtd_genre_sub"),
        safeOffset(col("titles"), 0).getField("value").as("mtd_title_main"),
        safeOffset(col("titles"), 1).getField("value").as("mtd_title_sub"))
      .join(season, col("id") === col("season_id_key"), "left").drop("season_id_key")
      .join(series, col("id") === col("series_id_key"), "left").drop("series_id_key")
      .join(episode.select(col("id").as("ep_key"), col("ep_index").as("mtd_episode_of_index")),
        col("id") === col("ep_key"), "left").drop("ep_key")
      .join(broadcastersAgg.withColumnRenamed("id", "b_key"),
        col("id") === col("b_key"), "left").drop("b_key")
      .join(channels.select(col("id").as("c_key"), col("channel").as("mtd_channel")),
        col("id") === col("c_key"), "left").drop("c_key")

    // Final enrichment join (streams_daily:240-244): metadata.* EXCEPT(id).
    perDate.join(metadata, col("evt_mid") === col("id"), "left").drop("id")
      .select(perDate.columns.toIndexedSeq.map(col) ++ Seq(
        col("mtd_duration_in_sec"), col("mtd_sort_date"), col("mtd_type"),
        col("mtd_genre_main"), col("mtd_genre_sub"), col("mtd_title_main"),
        col("mtd_title_sub"), col("mtd_season_mid"), col("mtd_series_mid"),
        col("mtd_episode_of_index"), col("mtd_channel"), col("mtd_broadcasters")): _*)
  }
}
