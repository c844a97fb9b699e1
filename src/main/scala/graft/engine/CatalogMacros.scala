package graft.engine

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.SparkSession

import graft.engine.SqlModel.{parseListArg, splitArgs, stripQuotes}

/** dbt_utils macros that need WAREHOUSE INTROSPECTION — `star`
  * (column list of a relation) and `get_column_values` (distinct
  * values of a column, dbt's compile-time `run_query`). A text or
  * native macro expands at PARSE time, when no relation is resolvable;
  * dbt itself resolves these against the live warehouse during
  * compilation. The engine's equivalent moment is the model's BUILD
  * closure, where every ref is already resolved to a DataFrame and
  * registered as a temp view — so these macros expand in two phases:
  *
  *  1. parse time ([[starNative]] / [[Packages]] pivot): the call is
  *     rewritten to a sentinel COMMENT that carries its arguments and
  *     keeps the relation as a literal `{{ ref('x') }}` — so
  *     `extractRefs` still sees the DAG edge, and `render` rewrites it
  *     to the temp-view name like any other ref;
  *  2. build time ([[expand]], called from the model's build closure
  *     just before `spark.sql`): the sentinel is replaced with the real
  *     column list / generated pivot, read from the registered view.
  *
  * This is strictly STRONGER than dbt's semantics: dbt errors (or
  * falls back to `default`) when the referenced relation has never
  * been materialized; here the ref is a DAG edge, so the upstream
  * model is always built first and introspection always succeeds.
  *
  * Scale: `star` reads only the SCHEMA of the resolved plan — no job
  * runs. `get_column_values` runs one distinct-aggregate on the
  * upstream frame at build time and collects its values to the driver
  * — the same query dbt fires at compile time (`select column, count(*)
  * ... group by 1 order by ... limit max_records`); it is meant for
  * low-cardinality pivot axes and is bounded by `max_records` when the
  * axis is not.
  */
object CatalogMacros {

  /** Field separator inside sentinel comments — a control char no SQL
    * text contains, immune to the var/env/ref regex passes in between.
    */
  private val SEP = "\u0001"

  private def requireCommentSafe(v: String, what: String): String = {
    require(!v.contains("*/") && !v.contains(SEP),
      s"$what may not contain '*/' (it rides a SQL comment): $v")
    v
  }

  /** Normalize a relation argument — `ref('x')`, `{{ ref('x') }}` (the
    * form [[ProjectLoader]]'s source rewrite produces), or
    * `source('s','t')` — to the braced template form `extractRefs` and
    * `render` both recognize.
    */
  private def relationTemplate(arg: String, macroName: String): String = {
    val t = arg.trim
    val inner =
      if (t.startsWith("{{") && t.endsWith("}}")) t.substring(2, t.length - 2).trim
      else t
    require(inner.matches("""(?s)(ref|source)\s*\(.*\)"""),
      s"$macroName: the relation argument must be a ref()/source() call, got: $arg")
    s"{{ $inner }}"
  }

  private def kwargs(args: Seq[String], macroName: String,
                     positional: Seq[String],
                     known: Set[String]): Map[String, String] = {
    val (kw, pos) = args.partition(a =>
      a.matches("""(?s)\w+\s*=.*""") && !a.takeWhile(_ != '=').contains('\''))
    require(pos.size <= positional.size,
      s"$macroName: ${pos.size} positional args for ${positional.size} params")
    val kwMap = kw.map { a =>
      val Array(k, v) = a.split("=", 2)
      k.trim -> v.trim
    }.toMap
    val unknown = kwMap.keySet -- known
    require(unknown.isEmpty, s"$macroName: unknown keyword args ${unknown.mkString(", ")}")
    positional.zip(pos).toMap ++ kwMap
  }

  // ---- star ---------------------------------------------------------------

  /** `dbt_utils.star(from, relation_alias='', except=[], prefix='',
    * suffix='', quote_identifiers=true)` — parse-time half: emit the
    * sentinel. dbt contract: the expansion is the relation's column
    * list minus `except`, each optionally alias-qualified and renamed
    * `prefix ~ col ~ suffix`.
    */
  def starNative(args: Seq[String]): String = {
    val kw = kwargs(args, "star", Seq("from"),
      Set("from", "relation_alias", "except", "prefix", "suffix", "quote_identifiers"))
    val rel = relationTemplate(kw.getOrElse("from",
      throw new IllegalArgumentException("star: missing required argument 'from'")), "star")
    val except = kw.get("except").map(parseListArg(_).map(stripQuotes)).getOrElse(Nil)
    val alias = stripQuotes(kw.getOrElse("relation_alias", ""))
    val prefix = stripQuotes(kw.getOrElse("prefix", ""))
    val suffix = stripQuotes(kw.getOrElse("suffix", ""))
    val quote = stripQuotes(kw.getOrElse("quote_identifiers", "true")).toLowerCase
    require(quote == "true" || quote == "false",
      s"star: quote_identifiers must be true/false, got $quote")
    (Seq("graft_star", rel, except.map(requireCommentSafe(_, "star except item")).mkString("|"),
      alias, prefix, suffix, quote)
      .map(requireCommentSafe(_, "star argument")))
      .mkString("/*", SEP, "*/")
  }

  /** Parse a `get_column_values(table, column, ...)` call's argument
    * text into sentinel fields (relation template, column, order_by,
    * where, max_records). Shared by [[Packages]]' pivot (the consuming
    * macro) — dbt_utils' canonical composition.
    */
  private[engine] def gcvFields(argText: String): Seq[String] = {
    val kw = kwargs(splitArgs(argText), "get_column_values",
      Seq("table", "column"),
      Set("table", "column", "order_by", "max_records", "default", "where"))
    val rel = relationTemplate(kw.getOrElse("table", throw new IllegalArgumentException(
      "get_column_values: missing required argument 'table'")), "get_column_values")
    val column = stripQuotes(kw.getOrElse("column", throw new IllegalArgumentException(
      "get_column_values: missing required argument 'column'")))
    // `default` is accepted for dbt compatibility but never consulted:
    // dbt falls back to it when the relation has never been
    // materialized, a state this engine's DAG ordering makes impossible.
    val orderBy = stripQuotes(kw.getOrElse("order_by", "count(*) desc"))
    val where = stripQuotes(kw.getOrElse("where", ""))
    val maxRecords = stripQuotes(kw.getOrElse("max_records", ""))
    require(maxRecords.isEmpty || maxRecords.forall(_.isDigit),
      s"get_column_values: max_records must be an integer, got $maxRecords")
    Seq(rel, column, orderBy, where, maxRecords)
      .map(requireCommentSafe(_, "get_column_values argument"))
  }

  /** Does a pivot `values` argument carry a nested get_column_values
    * call (instead of a Jinja list literal)?
    */
  private[engine] val gcvCallPat: Pattern = Pattern.compile(
    """(?s)\A(?:\w+\.)?get_column_values\s*\((.*)\)\z""")

  /** Build the graft_pivot sentinel: pivot kwargs + embedded gcv
    * fields, expanded together at build time.
    */
  private[engine] def pivotGcvSentinel(column: String, gcvArgText: String,
                                       agg: String, thenV: String, elseV: String,
                                       prefix: String, suffix: String): String =
    (Seq("graft_pivot", requireCommentSafe(column, "pivot column")) ++
      gcvFields(gcvArgText) ++
      Seq(agg, thenV, elseV, prefix, suffix).map(requireCommentSafe(_, "pivot argument")))
      .mkString("/*", SEP, "*/")

  // ---- build-time expansion ------------------------------------------------

  private val sentinelPat = Pattern.compile("""/\*(graft_star|graft_pivot)""" + SEP + """(.*?)\*/""",
    Pattern.DOTALL)

  private def quoted(c: String, quote: Boolean): String =
    if (quote) s"`$c`" else c

  /** Replace every catalog sentinel in `sql` with its real expansion,
    * reading schemas/values through the temp views the build closure
    * registered. No-op (same instance) when no sentinel is present.
    */
  def expand(spark: SparkSession, sql: String): String = {
    if (!sql.contains("/*graft_")) return sql
    val m = sentinelPat.matcher(sql)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      // The pattern consumes the separator after the tag, so group(2)
      // is exactly the SEP-joined field list.
      val fields = m.group(2).split(SEP, -1).toSeq
      val out = m.group(1) match {
        case "graft_star" =>
          val Seq(view, exceptRaw, alias, prefix, suffix, quote) = fields
          val except = exceptRaw.split('|').filter(_.nonEmpty).toSet
          val cols = relationColumns(spark, view, "star")
          val kept = cols.filterNot(except.contains)
          require(kept.nonEmpty,
            s"star: every column of $view is excluded (columns: ${cols.mkString(", ")})")
          val missing = except -- cols.toSet
          require(missing.isEmpty,
            s"star: except names ${missing.mkString(", ")} not in $view (${cols.mkString(", ")})")
          kept.map { c =>
            val src = (if (alias.nonEmpty) s"$alias." else "") + quoted(c, quote == "true")
            if (prefix.nonEmpty || suffix.nonEmpty)
              // dbt_utils.star: quote_identifiers=false leaves BOTH the
              // source reference and the renamed alias unquoted.
              s"$src AS ${quoted(prefix + c + suffix, quote == "true")}"
            else src
          }.mkString(", ")
        case "graft_pivot" =>
          val Seq(column, view, gcvCol, orderBy, where, maxRecords,
            agg, thenV, elseV, prefix, suffix) = fields
          val values = columnValues(spark, view, gcvCol, orderBy, where, maxRecords)
          require(values.nonEmpty,
            s"get_column_values: $view.$gcvCol returned no values to pivot on")
          Packages.pivotCases(column, values, agg, thenV, elseV, prefix, suffix)
      }
      m.appendReplacement(sb, Matcher.quoteReplacement(out))
    }
    m.appendTail(sb)
    sb.toString
  }

  private def relationColumns(spark: SparkSession, view: String, macroName: String): Seq[String] = {
    require(view.matches("""[A-Za-z0-9_.`]+"""),
      s"$macroName: unresolved relation '$view' — the sentinel's ref was not rendered " +
        "(catalog macros run through SqlModel.fromSqlText / ProjectLoader)")
    spark.table(view).columns.toSeq
  }

  /** dbt_utils.get_column_values' introspection query, verbatim shape:
    * one distinct-aggregate (map-side combined), ordered as asked,
    * LIMIT-bounded, collected. Runs on the RESOLVED upstream frame —
    * the engine's compile-time `run_query`.
    */
  private def columnValues(spark: SparkSession, view: String, column: String,
                           orderBy: String, where: String, maxRecords: String): Seq[String] = {
    require(view.matches("""[A-Za-z0-9_.`]+"""),
      s"get_column_values: unresolved relation '$view' — the sentinel's ref was not rendered")
    val whereCl = if (where.nonEmpty) s"WHERE $where" else ""
    val limitCl = if (maxRecords.nonEmpty) s"LIMIT $maxRecords" else ""
    spark.sql(
      s"""SELECT CAST($column AS STRING) AS value, count(*) AS count
         |FROM $view $whereCl
         |GROUP BY 1 ORDER BY $orderBy $limitCl""".stripMargin)
      .collect().map(_.getString(0)).toSeq
  }
}
