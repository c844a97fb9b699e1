package graft.models.testkit

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic NPO-shaped demo/test fixtures (FIXTURES.md §B) — the
  * engine's equivalent of dbt seeds, shipped in main so `graft.tools
  * .RunDag --demo` can demonstrate the full pipeline standalone. Dates straddle ISO
  * year boundaries (2020 week 53; spine epoch 2018-12-31) and the
  * incremental window sits inside today-8..today for `today` 2021-01-12.
  */
object NpoFixtures {

  val today: Date = Date.valueOf("2021-01-12")

  case class Ref(`type`: String, mid_ref: String, index: Long)
  case class Genre(id: String, terms: Seq[String])
  case class Sched(net: String, channel: String)
  case class Broad(id: String, value: String)
  case class Title(value: String)
  case class Poms(id: String, `type`: String, sort_date: Timestamp, duration: Long,
      age_rating: String, episode_of: Seq[Ref], descendant_of: Seq[Ref],
      member_of: Seq[Ref], genres: Seq[Genre], schedule_events: Seq[Sched],
      broadcasters: Seq[Broad], titles: Seq[Title])
  case class Adv(date: Date, beginTimeCET: Timestamp, endTimeCET: Timestamp,
      title: String, channel: String, mediaId: String, kdh: Double,
      RepeatType: String, audience: String, universe: String)
  case class Me(d_rm_playid: String, d_visit_id: String, d_uv_id: String,
      d_date_hour_event: Timestamp, d_rm_action: String, d_rm_l2: String,
      d_rm_playback_time: Double, d_rm_type: String, d_rm_content: String,
      d_rm_theme1: String, d_rm_theme2: String, d_rm_theme3: String)
  case class Mapping(channel_id: String, channel: String)
  case class Vertaal(Naam: String, Net: String, Omroep: String, CCC: String,
      Serie_mid: String, Stream_Titel: String, ATI_Titel: String,
      QL_FB_ID: Long, QL_IG_ID: Long, QL_YT_ID: Long,
      Target_AT_app: Double, Target_AT_site: Double, Target_FB_pagelikes: Double,
      Target_FB_reachperpost: Double, Target_IG_followers: Double,
      Target_IG_reachperpost: Double, Target_YT_subscribers: Double,
      Target_YT_views: Double)
  case class Yt(profileId: Long, intervalBegin: Timestamp, totalSubscribers: Long,
      totalSubscribersChange: Long, totalVideos: Long, views: Long,
      estimatedminuteswatched: Long, totalengagement: Long,
      averageViewPercentage: Double, averageViewDuration: Double, partitionDate: Date)
  case class Fb(profileId: Long, intervalBegin: Timestamp, fans: Long, fansChange: Long,
      ownPosts: Long, pageImpressionsUnique: Long, ownPostsEngagement: Long)
  case class Ig(profileId: Long, intervalBegin: Timestamp, followers: Long,
      followersChange: Long, posts: Long, postschange: Long, reach: Long,
      totalengagement: Long)
  case class Pg(level_2: String, platform: String, weekdate: Date, weeknum: Long,
      year: Long, weekly_visitors: Long, daily_visitors: Long, visits: Long)
  case class PgP(level_2: String, programme: String, platform: String, weekdate: Date,
      weeknum: Long, year: Long, weekly_visitors: Long, daily_visitors: Long, visits: Long)
  case class Dim(episode_id: String, series_ref: String, series_title: String,
      episode_type: String, season_ref: String, index: Long, season_index: Long,
      start_linear_first_broadcast: Timestamp)

  private def ts(s: String) = Timestamp.valueOf(s)

  def all(spark: SparkSession): Map[String, DataFrame] = {
    import spark.implicits._

    val poms = Seq(
      // Rich broadcast: PP broadcaster must be filtered, NOS picked as main;
      // ALL rating + youth genre => min age 6; ZAPP net present.
      Poms("EP1", "BROADCAST", ts("2021-01-05 20:00:00"), 1800000L, "ALL",
        episode_of = Seq(Ref("SERIES", "SER1", 1), Ref("SEASON", "SEA1", 2)),
        descendant_of = Seq(Ref("SERIES", "SER1", 1), Ref("SEASON", "SEA1", 1)),
        member_of = Seq(Ref("SEASON", "SEA1", 1)),
        genres = Seq(Genre("3.0.1.1.2", Seq("Jeugd", "Animatie"))),
        schedule_events = Seq(Sched("ZAPP", "NED3"), Sched("ZAPP", "NED1")),
        broadcasters = Seq(Broad("PP", "PP"), Broad("NOS", "NOS"), Broad("VPRO", "VPRO")),
        titles = Seq(Title("Titel EP1"), Title("Sub EP1"))),
      // Empty arrays: outer explodes must keep the row; series_id = mid.
      Poms("EP2", "BROADCAST", ts("2020-12-31 18:00:00"), 2400000L, "12",
        Seq.empty, Seq.empty, Seq.empty, Seq.empty, Seq.empty, Seq.empty, Seq.empty),
      // The livestream-matched mid.
      Poms("LIVE1", "BROADCAST", ts("2021-01-05 19:55:00"), 3600000L, "9",
        episode_of = Seq(Ref("SEASON", "SEA1", 3)),
        descendant_of = Seq(Ref("SERIES", "SER1", 2)),
        member_of = Seq.empty,
        genres = Seq(Genre("3.0.2.1", Seq("Nieuws"))),
        schedule_events = Seq(Sched("NPO", "NED1")),
        broadcasters = Seq(Broad("NOS", "NOS")),
        titles = Seq(Title("Live Titel"))),
      Poms("SER1", "SERIES", ts("2019-01-01 00:00:00"), 0L, "ALL",
        Seq.empty, Seq.empty, Seq.empty, Seq.empty, Seq.empty,
        Seq(Broad("NOS", "NOS")), Seq(Title("Serie Een"))))

    val adv = Seq(
      // ISO week 1 of 2019 (spine start week).
      Adv(Date.valueOf("2019-01-02"), ts("2019-01-02 20:00:00"), ts("2019-01-02 20:30:00"),
        "Serie Een Aflevering", "NPO 1", "EP1", 500000.0, "FIRST", "6+", "Nat[SKO]"),
      // ISO week 53 of 2020.
      Adv(Date.valueOf("2020-12-31"), ts("2020-12-31 18:00:00"), ts("2020-12-31 18:40:00"),
        "Oudjaar", "NPO 2", "EP2", 1200000.0, "FIRST", "6+", "Nat[SKO]"),
      // Inside the incremental window; the livestream show to as-of match.
      Adv(Date.valueOf("2021-01-05"), ts("2021-01-05 20:00:00"), ts("2021-01-05 20:10:00"),
        "Live Show", "NPO 1", "LIVE1", 800000.0, "FIRST", "6+", "Nat[SKO]"),
      // Competing show 4 minutes later on the same channel: as-of dedup
      // must pick the nearer begin for the 20:05 event.
      Adv(Date.valueOf("2021-01-05"), ts("2021-01-05 20:04:00"), ts("2021-01-05 20:12:00"),
        "Late Show", "NPO 1", "LIVE2", 300000.0, "FIRST", "6+", "Nat[SKO]"),
      // Non-NPO channel: filtered everywhere.
      Adv(Date.valueOf("2021-01-05"), ts("2021-01-05 20:00:00"), ts("2021-01-05 21:00:00"),
        "Commercial", "RTL 4", "RTL1", 999.0, "FIRST", "6+", "Nat[SKO]"),
      // Rerun: excluded from reporting (RepeatType).
      Adv(Date.valueOf("2021-01-06"), ts("2021-01-06 20:00:00"), ts("2021-01-06 20:30:00"),
        "Serie Een Herhaling", "NPO 1", "EP1", 100000.0, "RERUN", "6+", "Nat[SKO]"))

    val theme2ok = "Serie Een_||_NOS_||_podcast"
    val mediaEvents = Seq(
      // Livestream: 20:05 event matches LIVE2 (begin 20:04, 60s away)
      // over LIVE1 (begin 20:00, 300s away).
      Me("P1", "V1", "U1", ts("2021-01-05 20:05:30"), "Play", "npo", 45.0,
        "Video", "NPO 1 Live_||_CH1", "livetvzender", "00:00:01", "web_||_1.0"),
      // Livestream at 20:01: only LIVE1's window covers that minute.
      Me("P2", "V1", "U1", ts("2021-01-05 20:01:10"), "Play", "npo", 600.0,
        "Video", "NPO 1 Live_||_CH1", "livetvzender", theme2ok, "web_||_1.0"),
      // Livestream with unmapped channel content: inner join drops it.
      Me("P3", "V2", "U2", ts("2021-01-05 22:00:00"), "Play", "npo", 30.0,
        "Video", "Other Live_||_CHX", "livetvzender", theme2ok, "app_||_2.0"),
      // Regular VOD: two actions on one play; 35s total >= 30s threshold.
      Me("P4", "V3", "U3", ts("2021-01-06 10:00:00"), "Play", "npo", 20.0,
        "Video", "Serie Een_||_EP1", "vod", theme2ok, "web_||_1.0"),
      Me("P4", "V3", "U3", ts("2021-01-06 10:01:00"), "Refresh", "npo", 15.0,
        "Video", "Serie Een_||_EP1", "vod", theme2ok, "web_||_1.0"),
      // Regular VOD under 30s: counted as play, not as qualified.
      Me("P5", "V4", "U4", ts("2021-01-07 11:00:00"), "Play", "npo", 10.0,
        "Video", "Serie Een_||_EP1", "vod", theme2ok, "web_||_1.0"),
      // Animation: filtered.
      Me("P6", "V5", "U5", ts("2021-01-06 12:00:00"), "Play", "npo", 99.0,
        "Animations", "Anim_||_EP1", "vod", theme2ok, "web_||_1.0"),
      // Outside the 9-day incremental window: filtered.
      Me("P7", "V6", "U6", ts("2020-12-01 12:00:00"), "Play", "npo", 99.0,
        "Video", "Serie Een_||_EP1", "vod", theme2ok, "web_||_1.0"),
      // Empty mid segment -> NULLIF escape; no mapping join match.
      Me("P8", "V7", "U7", ts("2021-01-07 13:00:00"), "Play", "npo", 50.0,
        "Video", "Nameless_||_", "vod", theme2ok, "app_||_2.0"))

    val mapping = Seq(Mapping("CH1", "NPO 1"), Mapping("CH2", "NPO 2"))

    val vertaal = Seq(
      Vertaal("Serie Een", "NPO 1", "NOS", "CCC1", "SER1", "Serie Een Stream",
        "serie-een", 101L, 201L, 301L, 1000, 2000, 3000, 4000, 5000, 6000, 7000, 8000),
      Vertaal(null, null, null, null, "SERX", null, null, 0L, 0L, 0L,
        0, 0, 0, 0, 0, 0, 0, 0))

    val yt = Seq(
      Yt(301L, ts("2021-01-04 00:00:00"), 10000L, 50L, 200L, 40000L, 90000L, 1500L,
        45.0, 300.0, Date.valueOf("2021-01-10")),
      // Older partition: must be eliminated by the latest-partition view.
      Yt(301L, ts("2021-01-04 00:00:00"), 9000L, 40L, 199L, 39000L, 80000L, 1400L,
        44.0, 290.0, Date.valueOf("2021-01-03")),
      Yt(301L, ts("2019-01-01 00:00:00"), 5000L, 10L, 100L, 10000L, 20000L, 500L,
        40.0, 250.0, Date.valueOf("2021-01-10")))

    val fb = Seq(
      Fb(101L, ts("2021-01-04 00:00:00"), 120000L, 500L, 7L, 80000L, 4000L),
      Fb(101L, ts("2019-01-01 00:00:00"), 90000L, 100L, 3L, 40000L, 1000L))
    val ig = Seq(
      Ig(201L, ts("2021-01-04 00:00:00"), 60000L, 300L, 5L, 1L, 50000L, 2500L))

    val pages = Seq(
      Pg("serie-een", "app", Date.valueOf("2021-01-04"), 1L, 2021L, 900L, 300L, 1200L),
      Pg("serie-een", "site", Date.valueOf("2021-01-04"), 1L, 2021L, 1800L, 700L, 2600L))
    val pagesProg = Seq(
      PgP("serie-een", "extra", "site", Date.valueOf("2021-01-04"), 1L, 2021L, 50L, 20L, 70L))

    val dim = Seq(
      Dim("EP1", "SER1", "Serie Een", "BROADCAST", "SEA1", 1L, 1L, ts("2019-01-02 20:00:00")),
      Dim("EP2", "SER2", "Oudejaars", "BROADCAST", "SEA2", 1L, 1L, ts("2020-12-31 18:00:00")),
      Dim("LIVE1", "SER1", "Serie Een", "BROADCAST", "SEA1", 2L, 1L, ts("2021-01-05 20:00:00")))

    Map(
      "audiovisual_metadata_poms_metadata_v1" -> poms.toDF(),
      "advantedge_tv_viewer_density_per_show_daily_v1" -> adv.toDF(),
      "media_events" -> mediaEvents.toDF(),
      "live_stream_name_mapping_v1" -> mapping.toDF(),
      "360_graden_rapportage_vertaaltabel_upload_20_21" -> vertaal.toDF(),
      "src_quintly_youtube_v1" -> yt.toDF(),
      "quintly_facebook_pages_weekly" -> fb.toDF(),
      "quintly_instagram_pages_weekly" -> ig.toDF(),
      "atinternet_smarttag_pages_weekly_v2" -> pages.toDF(),
      "atinternet_smarttag_pages_programmes_weekly_v2" -> pagesProg.toDF(),
      "dim_poms_episodes" -> dim.toDF())
  }

  /** The project tree's EXTERNAL interface: the physical BigQuery table
    * names its ten passthrough models point at (each a reference
    * one-liner, e.g. `models/source/ingest_latest/media_events.sql:1`)
    * plus the declared source's qualified key
    * (`sources.yml:4-8` → `quintly_youtube_allchannels_weekly.v1`),
    * aliased to the fixture that stands in for each warehouse table.
    * `ProjectLoader`-based runs resolve unknown refs through
    * [[resolveProject]].
    */
  val physicalAliases: Map[String, String] = Map(
    "npo-data-hub.audiovisual_metadata_v1.poms_metadata_v1" ->
      "audiovisual_metadata_poms_metadata_v1",
    "npo-data-hub.advantedge_tv_viewer_density_per_show_daily.v1_latest" ->
      "advantedge_tv_viewer_density_per_show_daily_v1",
    "npo-data-hub.analytics.media_events" -> "media_events",
    "npo-data-hub.live_stream_name_mapping.v1" -> "live_stream_name_mapping_v1",
    "comscore-data-prod.ati.360_graden_rapportage_vertaaltabel_upload_20_21" ->
      "360_graden_rapportage_vertaaltabel_upload_20_21",
    "quintly_youtube_allchannels_weekly.v1" -> "src_quintly_youtube_v1",
    "npo-data-hub.quintly_facebook_pages_weekly.v1_view" -> "quintly_facebook_pages_weekly",
    "npo-data-hub.quintly_instagram_pages_weekly.v1_view" -> "quintly_instagram_pages_weekly",
    "npo-data-hub.atinternet_smarttag_pages_weekly.v2" -> "atinternet_smarttag_pages_weekly_v2",
    "npo-data-hub.atinternet_smarttag_pages_programmes_weekly.v2" ->
      "atinternet_smarttag_pages_programmes_weekly_v2",
    "npo-data-hub.looker.poms_episodes_materialized" -> "dim_poms_episodes")

  /** Resolve callback for file-frontend runs: fixture keys answer
    * directly, physical dotted names and source keys through the alias
    * table.
    */
  def resolveProject(fixtures: Map[String, DataFrame])(n: String): DataFrame =
    fixtures.getOrElse(n, fixtures(physicalAliases.getOrElse(n,
      throw new IllegalArgumentException(s"no fixture or alias for external ref '$n'"))))
}
