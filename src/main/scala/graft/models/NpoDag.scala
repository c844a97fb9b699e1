package graft.models

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.engine.{IncrementalInsertOverwrite, Model}

/** The reference's full 13-model DAG wired through `graft.engine
  * .DagRunner` (SURVEY.md §3.1). External tables (the 8 passthrough
  * sources, the prebuilt `dim_poms_episodes` and the two pages tables —
  * sources in disguise, SURVEY.md §3.3 "DAG quirks") resolve through the
  * runner's `resolve` callback; everything else is a `ref()` edge.
  *
  * `today` is injected for the reference's `CURRENT_DATE()` call sites
  * (date spines, incremental window) so runs are deterministic.
  */
object NpoDag {

  val sources: Seq[String] = Seq(
    "advantedge_tv_viewer_density_per_show_daily_v1",
    "audiovisual_metadata_poms_metadata_v1",
    "media_events",
    "live_stream_name_mapping_v1",
    "360_graden_rapportage_vertaaltabel_upload_20_21",
    "quintly_facebook_pages_weekly",
    "quintly_instagram_pages_weekly",
    "src_quintly_youtube_v1",
    "dim_poms_episodes",
    "atinternet_smarttag_pages_weekly_v2",
    "atinternet_smarttag_pages_programmes_weekly_v2")

  /** The quintly latest-partition freshness rule, shared by the source
    * model above and `DagQueries.dag_youtube` so the oracle checks the
    * SAME rule the DAG runs (one definition, no drift).
    */
  def latestYoutube(s: org.apache.spark.sql.SparkSession,
                    src: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    src.createOrReplaceTempView("src_quintly_youtube_v1")
    s.sql("""SELECT * FROM src_quintly_youtube_v1
            |WHERE partitionDate = (SELECT MAX(partitionDate)
            |                       FROM src_quintly_youtube_v1)""".stripMargin)
      .drop("partitionDate")
  }

  /** Project-level `database` routing (`dbt_project.yml:5`): every model
    * targets the same warehouse database; folder overrides add schemas.
    */
  val database: String = "mit-reporting-test-1"

  /** Model-level `database` overrides win over the project default,
    * matching dbt config precedence (model/folder > project).
    */
  def models(today: Date): Seq[Model] =
    modelDefs(today).map(m => m.copy(database = m.database.orElse(Some(database))))

  /** Default data tests for the reference DAG (`RunDag --build` runs
    * them interleaved, dbt build style): key integrity on the flattened
    * metadata spine every reporting model joins against.
    */
  def defaultChecks: Seq[graft.engine.DataTests.Check] = Seq(
    graft.engine.DataTests.Unique("poms_flattened", Seq("mid")),
    graft.engine.DataTests.NotNull("poms_flattened", "mid"))

  private def modelDefs(today: Date): Seq[Model] = Seq(

    // Latest-partition source elimination (`/root/reference/models/source/
    // ingest_latest/quintly_youtube_allchannels_weekly.sql:1-13`).
    Model("quintly_youtube_allchannels_weekly", Seq("src_quintly_youtube_v1"),
      (s, r) => latestYoutube(s, r("src_quintly_youtube_v1"))),

    Model("poms_flattened", Seq("audiovisual_metadata_poms_metadata_v1"),
      (_, r) => PomsFlattened.build(r("audiovisual_metadata_poms_metadata_v1"))),

    // The one incremental model (`atinternet_smarttag_streams_daily_v4
    // .sql:15-22`): insert-overwrite of the rolling 9-day window, routed
    // to its own schema per dbt_project.yml:9-11.
    Model("atinternet_smarttag_streams_daily_v4",
      Seq("advantedge_tv_viewer_density_per_show_daily_v1", "media_events",
        "live_stream_name_mapping_v1", "audiovisual_metadata_poms_metadata_v1"),
      (_, r) => StreamsDaily.build(
        r("advantedge_tv_viewer_density_per_show_daily_v1"), r("media_events"),
        r("live_stream_name_mapping_v1"), r("audiovisual_metadata_poms_metadata_v1"),
        StreamsDaily.partitionsFor(today)),
      materialization = IncrementalInsertOverwrite("evt_date", StreamsDaily.partitionsFor(today)),
      schema = Some("atinternet_smarttag_streams_daily")),

    Model("integral_reporting_tvbroadcasts",
      Seq("advantedge_tv_viewer_density_per_show_daily_v1", "dim_poms_episodes",
        "360_graden_rapportage_vertaaltabel_upload_20_21"),
      (s, r) => Reporting.tvBroadcasts(s,
        r("advantedge_tv_viewer_density_per_show_daily_v1"), r("dim_poms_episodes"),
        r("360_graden_rapportage_vertaaltabel_upload_20_21"), today),
      schema = Some("integral_reporting")),

    Model("integral_reporting_vodstreaming",
      Seq("advantedge_tv_viewer_density_per_show_daily_v1", "poms_flattened",
        "atinternet_smarttag_streams_daily_v4", "dim_poms_episodes",
        "360_graden_rapportage_vertaaltabel_upload_20_21"),
      (s, r) => Reporting.vodStreaming(s,
        r("advantedge_tv_viewer_density_per_show_daily_v1"), r("poms_flattened"),
        r("atinternet_smarttag_streams_daily_v4"), r("dim_poms_episodes"),
        r("360_graden_rapportage_vertaaltabel_upload_20_21"), today),
      schema = Some("integral_reporting")),

    Model("integral_reporting_youtube",
      Seq("360_graden_rapportage_vertaaltabel_upload_20_21",
        "quintly_youtube_allchannels_weekly"),
      (s, r) => Reporting.youtube(s,
        r("360_graden_rapportage_vertaaltabel_upload_20_21"),
        r("quintly_youtube_allchannels_weekly"), today),
      schema = Some("integral_reporting")),

    Model("integral_reporting_facebook",
      Seq("360_graden_rapportage_vertaaltabel_upload_20_21", "quintly_facebook_pages_weekly"),
      (s, r) => Reporting.facebook(s,
        r("360_graden_rapportage_vertaaltabel_upload_20_21"),
        r("quintly_facebook_pages_weekly"), today),
      schema = Some("integral_reporting")),

    Model("integral_reporting_instagram",
      Seq("360_graden_rapportage_vertaaltabel_upload_20_21", "quintly_instagram_pages_weekly"),
      (s, r) => Reporting.instagram(s,
        r("360_graden_rapportage_vertaaltabel_upload_20_21"),
        r("quintly_instagram_pages_weekly"), today),
      schema = Some("integral_reporting")),

    Model("integral_reporting_sites_and_apps",
      Seq("360_graden_rapportage_vertaaltabel_upload_20_21",
        "atinternet_smarttag_pages_weekly_v2", "atinternet_smarttag_pages_programmes_weekly_v2"),
      (s, r) => Reporting.sitesAndApps(s,
        r("360_graden_rapportage_vertaaltabel_upload_20_21"),
        r("atinternet_smarttag_pages_weekly_v2"),
        r("atinternet_smarttag_pages_programmes_weekly_v2"), today),
      schema = Some("integral_reporting")),

    Model("integral_reporting_dashboard_channel_weekly",
      Seq("360_graden_rapportage_vertaaltabel_upload_20_21",
        "integral_reporting_vodstreaming", "integral_reporting_tvbroadcasts",
        "integral_reporting_facebook", "integral_reporting_instagram",
        "integral_reporting_sites_and_apps", "integral_reporting_youtube"),
      (s, r) => Dashboard.build(s,
        r("360_graden_rapportage_vertaaltabel_upload_20_21"),
        r("integral_reporting_vodstreaming"), r("integral_reporting_tvbroadcasts"),
        r("integral_reporting_facebook"), r("integral_reporting_instagram"),
        r("integral_reporting_sites_and_apps"), r("integral_reporting_youtube"), today),
      schema = Some("integral_reporting")))
}
