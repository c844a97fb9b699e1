package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `poms_flattened` — flatten the nested POMS metadata into one row per
  * (mid, broadcaster), pick the main broadcaster, derive series/season ids
  * and the minimum-age classification.
  * Reference: `/root/reference/models/datamarts/npo-data-hub/utils/
  * poms_flattened.sql:1-94`.
  */
object PomsFlattened {

  /** refs: audiovisual_metadata_poms_metadata_v1 */
  def build(poms: DataFrame): DataFrame = {
    // Five stacked outer explodes + one positional explode
    // (poms_flattened.sql:23-28). Order matters for row multiplicity —
    // BigQuery's comma-joined UNNESTs form the same nested cartesian.
    val exploded = poms
      .select(col("id").as("mid"), col("type"), col("sort_date"), col("duration"),
        col("age_rating"), col("episode_of"), col("descendant_of"), col("member_of"),
        col("genres"), col("schedule_events"), col("broadcasters"))
      .withColumn("episode_of_e", explode_outer(col("episode_of")))
      .withColumn("descendant_of_e", explode_outer(col("descendant_of")))
      .withColumn("member_of_e", explode_outer(col("member_of")))
      .withColumn("genres_e", explode_outer(col("genres")))
      .withColumn("schedule_events_e", explode_outer(col("schedule_events")))
      .select(col("*"), posexplode_outer(col("broadcasters"))
        .as(Seq("broadcaster_offset", "broadcasters_e")))
      // MIT-939 broadcaster filter with NULL escape (poms_flattened.sql:30).
      .filter(!col("broadcasters_e.id").isin("PP", "RVD", "RNW", "SOCU", "BVN", "MTNL", "EXT") ||
        col("broadcasters_e.id").isNull)

    val explodedRefs = exploded.groupBy(
      col("mid"), col("type"), col("age_rating"), col("sort_date"), col("duration"),
      col("broadcasters_e.id").as("broadcaster_id"), col("broadcaster_offset"))
      .agg(
        max(when(col("broadcasters_e.id") === "NOS", true).otherwise(false)).as("is_nos_content"),
        max(when(col("genres_e.id").startsWith("3.0.1.1"), true).otherwise(false)).as("is_youth_genre"),
        max(when(col("schedule_events_e.net") === "ZAPP", true).otherwise(false)).as("is_zapp_net"),
        max(when(col("schedule_events_e.net") === "ZAPPE", true).otherwise(false)).as("is_zappelin_net"),
        max(when(col("episode_of_e.type") === "SERIES", col("episode_of_e.mid_ref"))).as("episode_of_series"),
        max(when(col("episode_of_e.type") === "SEASON", col("episode_of_e.mid_ref"))).as("episode_of_season"),
        max(when(col("descendant_of_e.type") === "SERIES", col("descendant_of_e.mid_ref"))).as("descendant_of_series"),
        max(when(col("descendant_of_e.type") === "SEASON", col("descendant_of_e.mid_ref"))).as("descendant_of_season"),
        max(when(col("member_of_e.type") === "SERIES", col("member_of_e.mid_ref"))).as("member_of_series"),
        max(when(col("member_of_e.type") === "SEASON", col("member_of_e.mid_ref"))).as("member_of_season"))

    // series/season resolution per media type (poms_flattened.sql:41-69).
    val defined = explodedRefs
      .withColumn("series_ref",
        when(col("type") === "BROADCAST",
          coalesce(col("episode_of_series"), col("member_of_series"), col("descendant_of_series")))
          .when(col("type") === "SEASON", col("member_of_series"))
          .when(col("type") === "SEGMENT", col("descendant_of_series")))
      .withColumn("season_ref",
        when(col("type") === "BROADCAST",
          coalesce(col("member_of_season"), col("descendant_of_season"), col("episode_of_season")))
          .when(col("type") === "SEGMENT", col("descendant_of_season")))
      .withColumn("broadcaster_row_number", row_number().over(
        Window.partitionBy("mid").orderBy(col("broadcaster_offset").asc)))

    // Main broadcaster = first after filtering; age-classification rules
    // (poms_flattened.sql:71-94).
    defined.filter(col("broadcaster_row_number") === 1)
      .select(
        col("mid"), col("type"),
        when(col("series_ref").isNull || col("series_ref") === "", col("mid"))
          .otherwise(col("series_ref")).as("series_id"),
        when(col("season_ref").isNull || col("season_ref") === "", col("mid"))
          .otherwise(col("season_ref")).as("season_id"),
        when(col("is_zappelin_net") || (col("age_rating") === "ALL" && col("is_youth_genre")), 6)
          .when(col("is_zappelin_net") ||
            (col("age_rating").isin("ALL", "6") && col("is_youth_genre")), 9)
          .when(col("is_zapp_net") || col("is_zappelin_net") ||
            (col("age_rating").isin("ALL", "6", "9") && col("is_youth_genre")), 12)
          .as("min_age_classification"),
        col("sort_date"), col("duration"),
        col("broadcaster_id").as("first_broadcaster"), col("is_nos_content"))
  }
}
