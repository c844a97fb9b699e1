package graft.engine

import graft.engine.SqlModel.{parseListArg, splitArgs, stripQuotes, MacroDef}

/** Built-in dbt package implementations for the `packages.yml` surface
  * (VERDICT r11 ask #5). dbt resolves hub packages by downloading their
  * macro source; this engine runs with zero egress, so the packages a
  * project can depend on are (a) LOCAL packages (`- local: path`, read
  * from disk exactly like the project's own `macros/`) and (b) the
  * built-in registry below — engine-shipped implementations of the
  * dbt_utils macros whose semantics already exist as audited operators
  * (`date_spine` = J9's spine, `union_relations` = U5's conform-union,
  * `generate_surrogate_key` = the md5 fingerprint idiom, `pivot` = A11).
  *
  * Namespacing (dbt dispatch order, pinned in `ProjectLoaderSpec`): a
  * package macro registers under its qualified `pkg.name` AND an
  * unqualified alias; a project macro of the same name shadows the
  * alias, while the qualified call always reaches the package.
  *
  * Two macro kinds:
  *   - text macros ([[MacroDef]]): plain Jinja bodies expanded by
  *     [[SqlModel.expandMacros]] — `date_spine`.
  *   - NATIVE macros (Scala functions over the raw argument list):
  *     needed where dbt_utils takes Jinja LIST literals (`['a','b']`),
  *     which a fixed-parameter text macro cannot bind — `pivot`,
  *     `generate_surrogate_key`, `union_relations`.
  */
object Packages {

  /** One resolved package: its text-macro namespace + native macros. */
  final case class Package(name: String,
                           macros: Map[String, MacroDef],
                           natives: Map[String, Seq[String] => String])

  // ---- dbt_utils ---------------------------------------------------------

  /** `dbt_utils.date_spine(datepart, start_date, end_date)`: one row per
    * datepart period from start (inclusive) to end (EXCLUSIVE), column
    * named `date_<datepart>` — dbt_utils' contract. `sequence()` is
    * inclusive of an aligned endpoint, so the strict `< end` filter
    * trims it; the generator never materializes large (reference spine
    * pattern, SCALE.md "Spine joins").
    */
  private val dateSpineSql =
    """{% macro date_spine(datepart, start_date, end_date) %}
      |SELECT d AS date_{{ datepart }}
      |FROM (SELECT explode(sequence(CAST({{ start_date }} AS DATE),
      |                              CAST({{ end_date }} AS DATE),
      |                              INTERVAL 1 {{ datepart }})) AS d)
      |WHERE d < CAST({{ end_date }} AS DATE)
      |{% endmacro %}""".stripMargin

  /** dbt_utils' cross-database macros, rendered to the engine's Spark
    * dialect. `datediff` maps to `timestampdiff` (complete units) —
    * identical to the boundary-count semantics of BigQuery/DuckDB for
    * DATE-precision values at `day`+ granularity, which is where the
    * oracle row pins it. Macro bodies are plain SQL after substitution
    * (a body's own function names are not Jinja call sites, so
    * `split_part` the macro and `split_part` the Spark builtin coexist).
    */
  private val crossDbSql =
    """{% macro dateadd(datepart, interval, from_date_or_timestamp) %}timestampadd({{ datepart }}, {{ interval }}, {{ from_date_or_timestamp }}){% endmacro %}
      |{% macro datediff(first_date, second_date, datepart) %}timestampdiff({{ datepart }}, {{ first_date }}, {{ second_date }}){% endmacro %}
      |{% macro split_part(string_text, delimiter_text, part_number) %}split_part({{ string_text }}, {{ delimiter_text }}, {{ part_number }}){% endmacro %}
      |{% macro safe_cast(field, type) %}safe_cast({{ field }}, '{{ type }}'){% endmacro %}
      |{% macro hash(field) %}md5(CAST({{ field }} AS STRING)){% endmacro %}""".stripMargin

  /** `generate_surrogate_key(['a', 'b'])` (alias `surrogate_key`):
    * md5 over '-'-joined stringified columns with dbt_utils' literal
    * null sentinel, so (null, 'x') and ('x', null) hash differently and
    * differently from ('x','x').
    */
  private def surrogateKey(args: Seq[String]): String = {
    require(args.size == 1,
      s"generate_surrogate_key takes one list argument, got ${args.size}")
    val cols = parseListArg(args.head).map(stripQuotes)
    require(cols.nonEmpty, "generate_surrogate_key: empty column list")
    cols.map(c => s"coalesce(CAST($c AS STRING), '_dbt_utils_surrogate_key_null_')")
      .mkString("md5(concat_ws('-', ", ", ", "))")
  }

  /** The pivot expansion proper — one conditional aggregate per value
    * (the A11 shape). Shared by the parse-time literal-values path and
    * [[CatalogMacros]]' build-time get_column_values path.
    */
  private[engine] def pivotCases(column: String, values: Seq[String], agg: String,
                                 thenV: String, elseV: String,
                                 prefix: String, suffix: String): String =
    values.map { v =>
      val lit = v.replace("'", "''")
      s"$agg(CASE WHEN $column = '$lit' THEN $thenV ELSE $elseV END) AS `$prefix$v$suffix`"
    }.mkString(",\n  ")

  /** `pivot(column, values, agg='sum', then_value=1, else_value=0,
    * prefix='', suffix='')`: stamps one conditional aggregate per value —
    * the A11 pivot shape, generated instead of hand-written. `values`
    * is a Jinja list literal, or dbt_utils' canonical nesting — a
    * `get_column_values(...)` call, which defers the expansion to build
    * time where the referenced relation's values are queryable
    * ([[CatalogMacros]]).
    */
  private def pivot(args: Seq[String]): String = {
    require(args.nonEmpty, "pivot requires (column, values, ...)")
    val (kw, pos) = args.partition(a =>
      a.matches("""(?s)\w+\s*=.*""") && !a.takeWhile(_ != '=').contains('\''))
    val kwMap = kw.map { a =>
      val Array(k, v) = a.split("=", 2)
      k.trim -> v.trim
    }.toMap
    val unknown = kwMap.keySet --
      Set("agg", "then_value", "else_value", "prefix", "suffix")
    require(unknown.isEmpty, s"pivot: unknown keyword args ${unknown.mkString(", ")}")
    require(pos.size == 2, s"pivot requires positional (column, values), got ${pos.size}")
    val column = stripQuotes(pos.head)
    val agg = stripQuotes(kwMap.getOrElse("agg", "sum"))
    val thenV = stripQuotes(kwMap.getOrElse("then_value", "1"))
    val elseV = stripQuotes(kwMap.getOrElse("else_value", "0"))
    val prefix = stripQuotes(kwMap.getOrElse("prefix", ""))
    val suffix = stripQuotes(kwMap.getOrElse("suffix", ""))
    val gcv = CatalogMacros.gcvCallPat.matcher(pos(1).trim)
    if (gcv.matches())
      CatalogMacros.pivotGcvSentinel(column, gcv.group(1), agg, thenV, elseV, prefix, suffix)
    else {
      val values = parseListArg(pos(1)).map(stripQuotes)
      require(values.nonEmpty, "pivot: empty values list")
      pivotCases(column, values, agg, thenV, elseV, prefix, suffix)
    }
  }

  /** `union_relations([ref('a'), ref('b'), ...])`: UNION ALL with the
    * provenance column dbt_utils adds (`_dbt_source_relation`).
    * Relations must share a column LAYOUT — dbt_utils' align-by-name /
    * fill-missing-with-null behavior introspects warehouse schemas at
    * compile time, which the template layer deliberately doesn't do
    * (Spark 4.1's SQL parser has no UNION BY NAME; the schema-aligning
    * conform-union over heterogeneous inputs is the U5 operator).
    */
  private def unionRelations(args: Seq[String]): String = {
    require(args.size == 1, s"union_relations takes one list argument, got ${args.size}")
    val rels = parseListArg(args.head)
    require(rels.size >= 2, "union_relations: need at least two relations")
    rels.map { r =>
      val t = r.trim
      require(t.matches("""(?s)(ref|source)\s*\(.*\)"""),
        s"union_relations: each relation must be a ref()/source() call, got: $r")
      // The provenance label is the relation's resolve name (dbt uses
      // the fully-qualified relation identifier).
      val label = splitArgs(t.substring(t.indexOf('(') + 1, t.lastIndexOf(')')))
        .map(stripQuotes).mkString(".")
      s"SELECT '$label' AS _dbt_source_relation, * FROM {{ $t }}"
    }.mkString("\nUNION ALL\n")
  }

  /** `concat(['a', 'b'])`: list-arg concatenation (`||` semantics —
    * NULL-propagating, like BigQuery/Spark `concat`).
    */
  private def concatFields(args: Seq[String]): String = {
    require(args.size == 1, s"concat takes one list argument, got ${args.size}")
    val cols = parseListArg(args.head).map(stripQuotes)
    require(cols.nonEmpty, "concat: empty field list")
    cols.mkString("concat(", ", ", ")")
  }

  val dbtUtils: Package = {
    val (textDefs, rest) = SqlModel.extractMacros(dateSpineSql + "\n" + crossDbSql)
    require(rest.trim.isEmpty, "dbt_utils text-macro source has trailing content")
    Package("dbt_utils", textDefs,
      Map(
        "generate_surrogate_key" -> surrogateKey _,
        "surrogate_key" -> surrogateKey _,
        "pivot" -> pivot _,
        "union_relations" -> unionRelations _,
        "concat" -> concatFields _,
        // Warehouse-introspection macros — parse to build-time
        // sentinels ([[CatalogMacros]]).
        "star" -> CatalogMacros.starNative _,
        "get_column_values" -> (_ => throw new IllegalArgumentException(
          "get_column_values returns a Jinja LIST — it is consumed by a macro " +
            "(dbt_utils.pivot(col, get_column_values(...))), not spliced into SQL"))))
  }

  /** The built-in registry `packages.yml` resolves hub names against.
    * Hub coordinates are `org/name` — the basename keys the registry
    * (dbt-labs/dbt_utils and dbt_utils both resolve).
    */
  val builtin: Map[String, Package] = Map("dbt_utils" -> dbtUtils)

  /** Qualify a package's macro namespace: `pkg.name` keys plus
    * unqualified aliases. Callers merge project macros AFTER this map so
    * the alias (not the qualified key) is what a project macro shadows.
    */
  def qualified(p: Package): Map[String, MacroDef] =
    p.macros.map { case (n, d) => s"${p.name}.$n" -> d } ++ p.macros

  def qualifiedNatives(p: Package): Map[String, Seq[String] => String] =
    p.natives.map { case (n, f) => s"${p.name}.$n" -> f } ++ p.natives
}
