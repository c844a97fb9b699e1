package graft

import org.apache.spark.sql.Row

import graft.engine.{DagRunner, ProjectLoader, PyModel, Table}

/** The dbt PYTHON model frontend ([[graft.engine.PyModel]]): structural
  * parsing of the documented `def model(dbt, session)` shape, native
  * in-process execution, DAG integration through ProjectLoader, and the
  * loud-compile-error discipline for everything outside the subset.
  */
class PyModelSpec extends SparkSpec {

  private val basic =
    """import pyspark.sql.functions as F
      |
      |def model(dbt, session):
      |    dbt.config(materialized="table", schema="mart")
      |    orders = dbt.ref("stg_orders")
      |    orders.createOrReplaceTempView("pym_orders")
      |    agg = session.sql('''
      |        SELECT status, count(*) AS n, sum(price) AS total
      |        FROM pym_orders
      |        GROUP BY status
      |    ''')
      |    return agg.filter("n > 0").orderBy("status")
      |""".stripMargin

  test("parse extracts refs, config, and the statement list from the canonical shape") {
    val p = PyModel.parse("pym", basic, "models/pym.py")
    assert(p.refs === Seq("stg_orders"))
    assert(p.config === Map("materialized" -> "table", "schema" -> "mart"))
    assert(p.stmts.last.isInstanceOf[PyModel.Return])
  }

  test("buildFn executes the statement list natively: temp view + session.sql + chained methods") {
    import spark.implicits._
    val p = PyModel.parse("pym", basic, "models/pym.py")
    val src = Seq(("F", 10.0), ("F", 5.0), ("O", 2.0)).toDF("status", "price")
    val out = PyModel.buildFn(p, "models/pym.py")(spark, Map("stg_orders" -> src))
    assert(out.columns.toSeq === Seq("status", "n", "total"))
    assert(out.collect().toSeq === Seq(Row("F", 2L, 15.0), Row("O", 1L, 2.0)))
  }

  test("the whitelisted DataFrame methods map to their Dataset equivalents") {
    import spark.implicits._
    val text =
      """def model(dbt, session):
        |    df = dbt.ref("t")
        |    slim = df.select("a", "b").withColumnRenamed("b", "bb").dropDuplicates()
        |    return slim.where("a >= 2").orderBy("a").limit(2).repartition(1)
        |""".stripMargin
    val p = PyModel.parse("m", text, "m.py")
    val t = Seq((1, "x", 9), (2, "y", 9), (2, "y", 8), (3, "z", 7)).toDF("a", "b", "c")
    val out = PyModel.buildFn(p, "m.py")(spark, Map("t" -> t))
    assert(out.columns.toSeq === Seq("a", "bb"))
    assert(out.collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq ===
      Seq((2, "y"), (3, "z")))
  }

  test("everything outside the subset is a loud compile error, not a silent skip") {
    def err(text: String): String =
      intercept[IllegalArgumentException](PyModel.parse("m", text, "m.py")).getMessage
    assert(err("x = 1\n").contains("def model"))
    assert(err("def model(dbt):\n    return dbt.ref('x')\n").contains("def model(dbt, session)"))
    assert(err("def model(dbt, session):\n    for i in range(3):\n        pass\n    return dbt.ref('x')\n")
      .contains("unsupported statement"))
    assert(err("def model(dbt, session):\n    df = dbt.ref('x')\n    return df.toPandas()\n")
      .contains("unsupported DataFrame method"))
    assert(err("def model(dbt, session):\n    return undefined_var\n")
      .contains("before assignment"))
    assert(err("def model(dbt, session):\n    df = dbt.ref('x')\n")
      .contains("return"))
  }

  test("two-arg dbt.ref parses as a project::model key and rewriteRefs resolves it") {
    val text =
      """def model(dbt, session):
        |    up = dbt.ref("core", "core_orders")
        |    return up.filter("a > 0")
        |""".stripMargin
    val p = PyModel.parse("m", text, "m.py")
    assert(p.refs === Seq("core::core_orders"))
    val rw = PyModel.rewriteRefs(p, k => if (k == "core::core_orders") "core_orders" else k)
    assert(rw.refs === Seq("core_orders"))
    // The rewritten key is what buildFn resolves against.
    import spark.implicits._
    val out = PyModel.buildFn(rw, "m.py")(spark,
      Map("core_orders" -> Seq(1, -1, 2).toDF("a")))
    assert(out.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2))
  }

  test("a '#' after an unterminated triple-quote opener is SQL text, not a comment") {
    val text =
      "def model(dbt, session):\n" +
        "    agg = session.sql(\"\"\"SELECT 1 AS n  -- marker # not-a-comment\n" +
        "        FROM range(1)\"\"\")\n" +
        "    return agg\n"
    val p = PyModel.parse("m", text, "m.py")
    val sql = p.stmts.collectFirst {
      case PyModel.Assign(_, PyModel.SqlExpr(t)) => t
    }.get
    assert(sql.contains("# not-a-comment"), sql)
    assert(sql.contains("FROM range(1)"), sql)
  }

  test("dbt.config accepts a list of strings (tags) — stored comma-joined") {
    val text =
      """def model(dbt, session):
        |    dbt.config(materialized="table", tags=["nightly", "pii"])
        |    df = dbt.ref("t")
        |    return df
        |""".stripMargin
    val p = PyModel.parse("m", text, "m.py")
    assert(p.config("tags") === "nightly,pii")
  }

  test("temp views registered by a py model are dropped after the build") {
    import spark.implicits._
    val text =
      """def model(dbt, session):
        |    df = dbt.ref("t")
        |    df.createOrReplaceTempView("pym_scratch_view")
        |    out = session.sql("SELECT a + 1 AS b FROM pym_scratch_view")
        |    return out
        |""".stripMargin
    val p = PyModel.parse("m", text, "m.py")
    val out = PyModel.buildFn(p, "m.py")(spark, Map("t" -> Seq(1, 2).toDF("a")))
    assert(!spark.catalog.tableExists("pym_scratch_view"))
    // Analysis was eager, so the returned frame still evaluates.
    assert(out.collect().map(_.getInt(0)).sorted.toSeq === Seq(2, 3))
  }

  test("ProjectLoader ingests .py models: DAG edges, source validation, config precedence, collisions") {
    import spark.implicits._
    def proj(files: (String, String)*): java.nio.file.Path = {
      val dir = java.nio.file.Files.createTempDirectory("graft_pyproj")
      (files :+ ("dbt_project.yml" -> "name: pysynth\n")).foreach { case (rel, body) =>
        val p = dir.resolve(rel)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, body)
      }
      dir
    }
    val srcYml =
      "version: 2\nsources:\n  - name: tpch\n    tables:\n      - name: orders\n"
    val q3 = "'''"
    val pyBody =
      s"""def model(dbt, session):
         |    dbt.config(materialized="table")
         |    stg = dbt.ref("stg")
         |    stg.createOrReplaceTempView("pyv_stg")
         |    big = dbt.source("tpch", "orders")
         |    big.createOrReplaceTempView("pyv_orders")
         |    joined = session.sql($q3
         |        SELECT b.o_orderkey, s.tag
         |        FROM pyv_orders b JOIN pyv_stg s ON s.o_orderkey = b.o_orderkey
         |    $q3)
         |    return joined.orderBy("o_orderkey")
         |""".stripMargin
    val dir = proj(
      "models/stg.sql" -> "SELECT o_orderkey, 'k' AS tag FROM {{ source('tpch', 'orders') }}",
      "models/pym.py" -> pyBody,
      "models/sources.yml" -> srcYml)
    val p = ProjectLoader.load(spark, dir)
    val pym = p.model("pym")
    assert(pym.refs === Seq("stg", "tpch.orders"))
    assert(pym.materialization === Table)
    val orders = Seq((1L, 99.0), (2L, 1.0)).toDF("o_orderkey", "o_totalprice")
    val wh = java.nio.file.Files.createTempDirectory("graft_pywh").toString
    val built = DagRunner.run(spark, p.models, {
      case "tpch.orders" => orders
      case n => sys.error(s"no source $n")
    }, wh)
    // The runner resolved stg and passed it to the py build; the py
    // model's own SQL joined it via the registered temp view.
    assert(built("pym").count() === 2)
    // An undeclared source fails at load.
    val bad = proj(
      "models/pym.py" ->
        "def model(dbt, session):\n    df = dbt.source(\"nope\", \"t\")\n    return df\n",
      "models/sources.yml" -> srcYml)
    val e = intercept[IllegalArgumentException](ProjectLoader.load(spark, bad))
    assert(e.getMessage.contains("not declared"))
    // A .py/.sql basename collision is the duplicate-model error.
    val dup = proj(
      "models/m.sql" -> "SELECT 1 AS a",
      "models/m.py" -> "def model(dbt, session):\n    df = session.sql(\"SELECT 1 AS a\")\n    return df\n",
      "models/sources.yml" -> srcYml)
    val e2 = intercept[IllegalArgumentException](ProjectLoader.load(spark, dup))
    assert(e2.getMessage.contains("duplicate"))
  }
}
