package graft

import org.apache.spark.sql.functions._

import graft.engine.{DagRunner, DataTests, IncrementalInsertOverwrite, ProjectLoader, Table, View}
import graft.models.{NpoDag, SqlReporting, StreamsDaily}
import graft.models.testkit.NpoFixtures

/** The dbt PROJECT-DIRECTORY frontend over the checked-in
  * `fixtures/npo_project` tree (a layout mirror of `/root/reference`):
  * YAML parsing, config-precedence routing, source/physical-table
  * resolution, incremental-header evaluation, schema.yml test routing,
  * and the load-bearing proof — the ENTIRE 20-model file-loaded DAG is
  * frame-identical to the compiled builders that the `dag_*` DuckDB
  * rows pin end-to-end.
  */
class ProjectLoaderSpec extends SparkSpec {

  private lazy val fixtures = NpoFixtures.all(spark)
  private lazy val proj = SqlReporting.project(NpoFixtures.today, spark)

  private def tmpWh(): String =
    java.nio.file.Files.createTempDirectory("graft_projwh").toFile.getAbsolutePath

  test("the project parses: name, all 20 model files, the declared source") {
    assert(proj.name === "dbt_test_henri")
    assert(proj.models.size === 20)
    // The ten substantive models plus the ten one-line passthroughs.
    assert(SqlReporting.allNames.toSet.subsetOf(proj.models.map(_.name).toSet))
    assert(proj.sources.map(s => (s.sourceName, s.table)) ===
      Seq(("quintly_youtube_allchannels_weekly", "v1")))
    assert(proj.sources.head.key === "quintly_youtube_allchannels_weekly.v1")
    assert(proj.sources.head.database === Some("npo-data-hub"))
  }

  test("routing derives from dbt_project.yml + headers: database default, group schemas") {
    // Project default database applies everywhere.
    proj.models.foreach(m =>
      assert(m.database === Some("mit-reporting-test-1"), s"${m.name} database"))
    // The integral_reporting group (a directory two levels deep) routes
    // its models' schema; headers agree.
    SqlReporting.names.foreach(n =>
      assert(proj.model(n).schema === Some("integral_reporting"), s"$n schema"))
    // The atinternet group key is a model-name PREFIX, not a directory.
    assert(proj.model("atinternet_smarttag_streams_daily_v4").schema ===
      Some("atinternet_smarttag_streams_daily"))
    // Ungrouped models get no schema.
    assert(proj.model("poms_flattened").schema === None)
    assert(proj.model("media_events").schema === None)
  }

  test("passthrough models resolve their physical BigQuery table as an external ref") {
    assert(proj.model("media_events").refs === Seq("npo-data-hub.analytics.media_events"))
    assert(proj.model("dim_poms_episodes").refs ===
      Seq("npo-data-hub.looker.poms_episodes_materialized"))
    // The source() model resolves under the qualified source key.
    assert(proj.model("quintly_youtube_allchannels_weekly").refs ===
      Seq("quintly_youtube_allchannels_weekly.v1"))
  }

  test("the incremental header evaluates its partitions list to the same window the Scala wiring computes") {
    proj.model("atinternet_smarttag_streams_daily_v4").materialization match {
      case IncrementalInsertOverwrite(col, parts) =>
        assert(col === "evt_date")
        assert(parts === StreamsDaily.partitionsFor(NpoFixtures.today))
      case other => fail(s"expected IncrementalInsertOverwrite, got $other")
    }
  }

  test("schema.yml tests route into DataTests with severity split") {
    assert(proj.checks === Seq(
      DataTests.Unique("poms_flattened", Seq("mid")),
      DataTests.NotNull("poms_flattened", "mid")))
    assert(proj.warnChecks === Seq(
      DataTests.NotNull("integral_reporting_youtube", "weekdate")))
  }

  test("the full file-loaded DAG builds and passes its declared tests (dbt build)") {
    val report = DagRunner.build(spark, proj.models,
      NpoFixtures.resolveProject(fixtures), tmpWh(),
      checks = proj.checks, warnChecks = proj.warnChecks)
    assert(report.ok, s"failures=${report.failures} skipped=${report.skipped}")
    assert(report.warnings.isEmpty)
    assert(report.built.size === 20)
  }

  test("every file-loaded model is frame-identical to the compiled builder DAG") {
    val wh = tmpWh()
    val fileBuilt = DagRunner.run(spark, proj.models,
      NpoFixtures.resolveProject(fixtures), wh)
    val scalaBuilt = DagRunner.run(spark, NpoDag.models(NpoFixtures.today),
      fixtures.apply, tmpWh())
    scalaBuilt.keys.foreach { name =>
      val a = fileBuilt(name)
      val b = scalaBuilt(name)
      assert(a.columns.toSeq === b.columns.toSeq, s"$name columns")
      assert(a.exceptAll(b).count() === 0L, s"$name: extra rows via file frontend")
      assert(b.exceptAll(a).count() === 0L, s"$name: missing rows via file frontend")
    }
    // Routing lands on disk where the Scala wiring put it: the
    // incremental model under its own database+schema.
    assert(new java.io.File(s"$wh/mit-reporting-test-1/" +
      "atinternet_smarttag_streams_daily/atinternet_smarttag_streams_daily_v4").isDirectory)
  }

  // ---- unit: config resolution and schema.yml parsing --------------------

  private def yamlMap(s: String): Map[String, Any] = {
    val m = new org.yaml.snakeyaml.Yaml().load[Any](s)
    import scala.jdk.CollectionConverters._
    m.asInstanceOf[java.util.Map[Any, Any]].asScala
      .map { case (k, v) => String.valueOf(k) -> (v: Any) }.toMap
  }

  test("modelConfig: precedence project < group; +prefixed keys; segment and prefix matching") {
    val block = yamlMap(
      """database: projdb
        |+materialized: view
        |marts:
        |  schema: marts_schema
        |  database: martsdb
        |my_model:
        |  schema: exact_schema
        |""".stripMargin)
    // Directory-segment match overrides the project default.
    assert(ProjectLoader.modelConfig(block, Seq("x", "marts"), "other", "proj") ===
      Map("database" -> "martsdb", "materialized" -> "view", "schema" -> "marts_schema"))
    // Exact model-name group.
    assert(ProjectLoader.modelConfig(block, Nil, "my_model", "proj")("schema") === "exact_schema")
    // Model-name prefix (the reference's atinternet idiom).
    assert(ProjectLoader.modelConfig(block, Nil, "my_model_v4", "proj")("schema") === "exact_schema")
    // No group match: project defaults only.
    assert(ProjectLoader.modelConfig(block, Seq("elsewhere"), "unrelated", "proj") ===
      Map("database" -> "projdb", "materialized" -> "view"))
  }

  test("parseSchemaTests: all four test kinds, relationships ref() form, warn severity") {
    val doc = yamlMap(
      """models:
        |  - name: child
        |    columns:
        |      - name: id
        |        tests:
        |          - unique
        |          - not_null
        |          - relationships:
        |              to: ref('parent')
        |              field: pid
        |      - name: status
        |        tests:
        |          - accepted_values:
        |              values: ['a', 'b']
        |              config:
        |                severity: warn
        |""".stripMargin)
    val (checks, warns) = ProjectLoader.parseSchemaTests(doc)
    assert(checks === Seq(
      DataTests.Unique("child", Seq("id")),
      DataTests.NotNull("child", "id"),
      DataTests.Relationships("child", "id", "parent", "pid")))
    assert(warns === Seq(DataTests.AcceptedValues("child", "status", Seq("a", "b"))))
  }

  test("a synthetic project directory loads end-to-end: macros dir, folder materialization, undeclared source fails") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_synthproj")
    def write(rel: String, body: String): Unit = {
      val p = dir.resolve(rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, body)
    }
    write("dbt_project.yml",
      """name: synth
        |vars:
        |  factor: 2
        |models:
        |  staging:
        |    +materialized: table
        |""".stripMargin)
    write("macros/util.sql",
      "{% macro scale(c) %}({{ c }} * {{ var('factor') }}){% endmacro %}")
    write("models/staging/stg_nums.sql",
      "SELECT {{ scale('n') }} AS n2 FROM {{ source('raw', 'nums') }}")
    write("models/sources.yml",
      """version: 2
        |sources:
        |  - name: raw
        |    tables:
        |      - name: nums
        |""".stripMargin)
    val p = ProjectLoader.load(spark, dir)
    assert(p.name === "synth")
    val stg = p.model("stg_nums")
    assert(stg.materialization === Table, "folder-level +materialized applies")
    assert(stg.refs === Seq("raw.nums"))
    // The `factor` var binds from dbt_project.yml's `vars:` block.
    val built = DagRunner.run(spark, p.models,
      Map("raw.nums" -> Seq(1, 2).toDF("n")).apply, tmpWh())
    assert(built("stg_nums").as[Long].collect().sorted === Array(2L, 4L))
    // Caller vars override the project default (dbt --vars precedence).
    val p3 = ProjectLoader.load(spark, dir, vars = Map("factor" -> "3"))
    val built3 = DagRunner.run(spark, p3.models,
      Map("raw.nums" -> Seq(1, 2).toDF("n")).apply, tmpWh())
    assert(built3("stg_nums").as[Long].collect().sorted === Array(3L, 6L))
    // An undeclared source is dbt's compile error.
    write("models/staging/bad.sql", "SELECT * FROM {{ source('raw', 'nope') }}")
    val e = intercept[IllegalArgumentException](ProjectLoader.load(spark, dir))
    assert(e.getMessage.contains("nope") && e.getMessage.contains("not declared"))
  }
}
