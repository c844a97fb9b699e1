package graft.models

import java.sql.Date

import graft.engine.{Model, SqlModel}

/** The six reporting models authored as SQL TEXT (dbt's authoring
  * surface) as `.sql` files under `src/main/resources/graft/models/sql`,
  * loaded
  * through [[graft.engine.SqlModel]] — the path a dbt user takes:
  * `.sql` files with `ref()`/`var()` template calls, no recompilation.
  * Refs are extracted from the text, so the DAG wiring below cannot
  * drift from the SQL bodies.
  *
  * `SqlModelSpec` proves each SQL-text model (and the downstream
  * dashboard built on them) frame-equivalent to the compiled
  * `Reporting`/`Dashboard` builders, which are themselves DuckDB-oracled
  * end-to-end via the `dag_*` correctness rows — so the SQL-text path
  * inherits the oracle transitively.
  */
object SqlReporting {

  val names: Seq[String] = Seq(
    "integral_reporting_tvbroadcasts",
    "integral_reporting_vodstreaming",
    "integral_reporting_youtube",
    "integral_reporting_facebook",
    "integral_reporting_instagram",
    "integral_reporting_sites_and_apps")

  /** The reporting layer from SQL text; `today` is injected as the
    * `{{ var('today') }}` binding (the reference's CURRENT_DATE()).
    */
  def models(today: Date): Seq[Model] = names.map { n =>
    SqlModel.fromResource(s"graft/models/sql/$n.sql",
      schema = Some("integral_reporting"),
      database = Some(NpoDag.database),
      vars = Map("today" -> s"DATE '$today'"))
  }

  /** The full 13-model NPO DAG with the reporting layer swapped to its
    * SQL-text form — upstream models (poms_flattened, streams_daily,
    * latest-partition source) and the downstream dashboard stay
    * compiled, exercising mixed Scala/SQL DAGs through one runner.
    */
  def dagModels(today: Date): Seq[Model] = {
    val swapped = names.toSet
    NpoDag.models(today).filterNot(m => swapped(m.name)) ++ models(today)
  }
}
