package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.engine.{DagRunner, IncrementalInsertOverwrite, MergeUpsert, Model}

/** dbt `on_schema_change` for incremental models: how a run whose
  * output columns differ from the existing target's reconciles —
  * ignore (default), append_new_columns, sync_all_columns, fail.
  * First run always writes the run's own schema; the modes only
  * engage when the target exists (dbt semantics).
  */
class OnSchemaChangeSpec extends SparkSpec {

  private def run(wh: String, mode: String, part: String,
                  build: org.apache.spark.sql.SparkSession => DataFrame): DataFrame =
    DagRunner.run(spark,
      Seq(Model("t", Seq.empty, (s, _) => build(s),
        materialization = IncrementalInsertOverwrite("evt_date", Seq(part)),
        onSchemaChange = mode)),
      n => fail(s"unexpected source $n"), wh)("t")

  private def day1(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import s.implicits._
    Seq(("2024-01-01", 1)).toDF("evt_date", "v")
  }

  private def day2Extra(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import s.implicits._
    Seq(("2024-01-02", 2, "new")).toDF("evt_date", "v", "extra")
  }

  test("ignore (the default) drops new columns; the target schema is preserved") {
    val wh = Files.createTempDirectory("graft_osc").toFile.getAbsolutePath
    run(wh, "ignore", "2024-01-01", day1)
    val out = run(wh, "ignore", "2024-01-02", day2Extra)
    assert(out.columns.toSet === Set("evt_date", "v"))
    assert(out.count() === 2L)
  }

  test("ignore errors when the run stops producing a target column (dbt's failed insert, made explicit)") {
    val wh = Files.createTempDirectory("graft_osc").toFile.getAbsolutePath
    run(wh, "ignore", "2024-01-01", day1)
    val e = intercept[IllegalArgumentException] {
      run(wh, "ignore", "2024-01-02", s => {
        import s.implicits._
        Seq(("2024-01-02", "x")).toDF("evt_date", "w")
      })
    }
    assert(e.getMessage.contains("cannot drop target columns"))
  }

  test("append_new_columns adds the column; old rows read it back as NULL") {
    val wh = Files.createTempDirectory("graft_osc").toFile.getAbsolutePath
    run(wh, "append_new_columns", "2024-01-01", day1)
    val out = run(wh, "append_new_columns", "2024-01-02", day2Extra)
    assert(out.columns.contains("extra"))
    val rows = out.orderBy("evt_date").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("extra") === null) // 2024-01-01, pre-change
    assert(rows(1).getAs[String]("extra") === "new")
    // A run that also stops producing a column null-fills it (dbt's
    // "does not remove columns" note).
    val out3 = run(wh, "append_new_columns", "2024-01-03", s => {
      import s.implicits._
      Seq(("2024-01-03", "later")).toDF("evt_date", "extra")
    })
    val r3 = out3.filter(out3("evt_date") === "2024-01-03").head()
    assert(r3.getAs[Any]("v") === null)
    assert(r3.getAs[String]("extra") === "later")
  }

  test("sync_all_columns makes the run's schema authoritative: adds and drops") {
    val wh = Files.createTempDirectory("graft_osc").toFile.getAbsolutePath
    run(wh, "sync_all_columns", "2024-01-01", day1)
    val out = run(wh, "sync_all_columns", "2024-01-02", s => {
      import s.implicits._
      Seq(("2024-01-02", "w2")).toDF("evt_date", "w")
    })
    assert(out.columns.toSet === Set("evt_date", "w"))
    assert(out.count() === 2L)
    // The pre-change partition reads the new column as NULL.
    assert(out.filter(out("evt_date") === "2024-01-01").head().getAs[String]("w") === null)
  }

  test("fail aborts on any column-set change, naming the delta") {
    val wh = Files.createTempDirectory("graft_osc").toFile.getAbsolutePath
    run(wh, "fail", "2024-01-01", day1)
    val e = intercept[IllegalStateException] {
      run(wh, "fail", "2024-01-02", day2Extra)
    }
    assert(e.getMessage.contains("added: [extra]"))
    // An unchanged schema sails through.
    assert(run(wh, "fail", "2024-01-02", s => {
      import s.implicits._
      Seq(("2024-01-02", 2)).toDF("evt_date", "v")
    }).count() === 2L)
  }

  test("merge upsert reconciles through the same modes") {
    val wh = Files.createTempDirectory("graft_osc").toFile.getAbsolutePath
    def merge(mode: String, build: org.apache.spark.sql.SparkSession => DataFrame) =
      DagRunner.run(spark,
        Seq(Model("t", Seq.empty, (s, _) => build(s),
          materialization = MergeUpsert("k", "evt_date"), onSchemaChange = mode)),
        n => fail(s"unexpected source $n"), wh)("t")
    merge("append_new_columns", s => {
      import s.implicits._
      Seq((1L, "2024-01-01", 10)).toDF("k", "evt_date", "v")
    })
    val out = merge("append_new_columns", s => {
      import s.implicits._
      Seq((2L, "2024-01-02", 20, "n2")).toDF("k", "evt_date", "v", "extra")
    })
    assert(out.columns.contains("extra"))
    assert(out.count() === 2L)
    assert(out.filter(out("k") === 1L).head().getAs[String]("extra") === null)
  }

  test("reconcile reads the UNION of heterogeneous footers — a pre-append footer cannot resurrect the old schema") {
    val wh = Files.createTempDirectory("graft_osc").toFile.getAbsolutePath
    // Many pre-append partitions so a bare (non-mergeSchema) footer read
    // would almost surely pick a (evt_date, v) footer and silently drop
    // the appended column from later runs.
    (1 to 9).foreach { d =>
      run(wh, "append_new_columns", f"2024-01-0$d", s => {
        import s.implicits._
        Seq((f"2024-01-0$d", d)).toDF("evt_date", "v")
      })
    }
    run(wh, "append_new_columns", "2024-01-10", s => {
      import s.implicits._
      Seq(("2024-01-10", 10, "new")).toDF("evt_date", "v", "extra")
    })
    // A later run back at the ORIGINAL shape: 'extra' is a target column
    // (union of all footers) and must survive, null-filled for this run.
    val out = run(wh, "append_new_columns", "2024-01-11", s => {
      import s.implicits._
      Seq(("2024-01-11", 11)).toDF("evt_date", "v")
    })
    assert(out.columns.contains("extra"))
    assert(out.filter(out("evt_date") === "2024-01-10").head().getAs[String]("extra") === "new")
    assert(out.filter(out("evt_date") === "2024-01-11").head().getAs[String]("extra") === null)
  }

  test("the config header plumbs on_schema_change into SQL-text models; bad values fail loudly") {
    val m = graft.engine.SqlModel.fromSqlText("m",
      "{{ config(materialized='view', on_schema_change='append_new_columns') }} SELECT 1 AS a")
    assert(m.onSchemaChange === "append_new_columns")
    val e = intercept[IllegalArgumentException] {
      graft.engine.SqlModel.fromSqlText("m",
        "{{ config(materialized='view', on_schema_change='explode') }} SELECT 1 AS a")
    }
    assert(e.getMessage.contains("on_schema_change"))
  }
}
