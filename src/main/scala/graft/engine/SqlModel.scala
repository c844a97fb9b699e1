package graft.engine

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** dbt's SQL-TEXT authoring surface: a model is a `.sql` file whose body
  * is a single SELECT with `{{ ref('name') }}` / `{{ source('src',
  * 'table') }}` / `{{ var('name') }}` template calls (e.g.
  * `/root/reference/models/datamarts/npo-data-hub/reporting/
  * integral_reporting/integral_reporting_youtube.sql:18,21`). This
  * frontend turns such text into an engine [[Model]] WITHOUT
  * recompilation: refs are extracted by parsing the template, and at
  * build time each resolved upstream frame is registered as a temp view,
  * the call sites are rewritten to those view names, and the body runs
  * through `spark.sql`.
  *
  * Design choices vs dbt/Jinja:
  *   - The SQL dialect is Spark SQL (the engine's native dialect), not
  *     BigQuery — same policy as the Scala model ports, which re-express
  *     the reference's BigQuery constructs with `graft.dialect.Dialect`
  *     semantics. `SqlModelSpec` proves the six reporting models
  *     authored as Spark-SQL text produce frame-identical output to the
  *     compiled builders (which are DuckDB-oracled end-to-end via the
  *     `dag_*` rows).
  *   - Full Jinja (loops, macros) is out of scope; `{{ config(...) }}`
  *     headers are stripped (materialization is declared engine-side),
  *     `{{ var('x') }}` substitutes from a caller map at parse time —
  *     the `today` injection keeping runs reproducible where the
  *     reference calls CURRENT_DATE(). The ONE Jinja control construct
  *     the reference actually uses IS supported: `{% set name = [...] %}`
  *     string lists with `{{ name | join(sep) }}` interpolation — the
  *     partition-list templating of the incremental model
  *     (`atinternet_smarttag_streams_daily_v4.sql:1-12,75,101`).
  *   - Catalyst still optimizes ACROSS model boundaries: a View
  *     materialization registers the parsed plan as a temp view, so a
  *     downstream model's filter pushes through the upstream SQL text
  *     exactly as it does through a DataFrame-built model.
  *
  * View registration: upstream names are rewritten to `graft_ref_`-
  * prefixed sanitized identifiers (a ref like
  * `360_graden_rapportage_...` is not a legal bare Spark identifier).
  * Registration happens per-build, immediately before `spark.sql`, so
  * two models reffing the same upstream never race in a sequential DAG
  * run.
  */
object SqlModel {

  private val refPat =
    Pattern.compile("""\{\{\s*ref\(\s*'([^']+)'\s*\)\s*\}\}""")
  private val sourcePat =
    Pattern.compile("""\{\{\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}""")
  // var('x') or var("x") — double quotes let a var call nest inside a
  // single-quoted Jinja string item of a {% set %} list.
  private val varPat =
    Pattern.compile("""\{\{\s*var\(\s*['"]([^'"]+)['"]\s*\)\s*\}\}""")
  private val configPat =
    Pattern.compile("""\{\{\s*config\([^}]*\)\s*\}\}""")
  // tags=['a', 'b'] or tags='a' inside a config(...) header — dbt model
  // tags, surfaced as Model.tags for `tag:` selection.
  private val configTagsPat = Pattern.compile(
    """\{\{\s*config\([^}]*?tags\s*=\s*(\[[^\]]*\]|'[^']*')[^}]*\)\s*\}\}""")
  // {% set name = [ 'item', ... ] %} — the Jinja shape the reference's
  // incremental model uses for its partition list
  // (atinternet_smarttag_streams_daily_v4.sql:1-12); items are
  // single-quoted strings (no embedded single quotes — var() calls inside
  // items use double quotes, see varPat).
  private val setListPat =
    Pattern.compile("""\{%-?\s*set\s+(\w+)\s*=\s*\[(.*?)\]\s*-?%\}""", Pattern.DOTALL)
  private val setItemPat = Pattern.compile("""'([^']*)'""")
  // {{ name | join(',') }} — list interpolation (same file lines 75, 101).
  private val joinPat =
    Pattern.compile("""\{\{\s*(\w+)\s*\|\s*join\(\s*'([^']*)'\s*\)\s*\}\}""")
  // {% if is_incremental() %} ... [{% else %} ...] {% endif %} — the
  // near-universal real-dbt incremental idiom (delta-filter the source
  // against the model's own high-water mark). Resolved at BUILD time
  // from the runner's target context, not at parse time: the same text
  // renders the full-build branch on first run / --full-refresh and the
  // delta branch once the target exists.
  private val ifIncPat = Pattern.compile(
    """\{%-?\s*if\s+is_incremental\(\)\s*-?%\}(.*?)(?:\{%-?\s*else\s*-?%\}(.*?))?\{%-?\s*endif\s*-?%\}""",
    Pattern.DOTALL)
  // {{ this }} — the model's own target relation, rendered as a direct
  // parquet path scan of the warehouse location.
  private val thisPat = Pattern.compile("""\{\{\s*this\s*\}\}""")

  private[engine] def viewName(ref: String): String =
    "graft_ref_" + ref.replaceAll("[^A-Za-z0-9_]", "_")

  /** Upstream names referenced by the template: `ref('x')` contributes
    * `x`; `source('s','t')` contributes `t` (sources resolve by bare
    * table name through `DagRunner.run`'s resolve callback, the same
    * namespace `NpoDag.sources` uses). Order of first appearance,
    * deduplicated.
    */
  def extractRefs(sqlText: String): Seq[String] = {
    val hits = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val rm = refPat.matcher(sqlText)
    while (rm.find()) hits += rm.start -> rm.group(1)
    val sm = sourcePat.matcher(sqlText)
    while (sm.find()) hits += sm.start -> sm.group(2)
    hits.sortBy(_._1).map(_._2).distinct.toSeq
  }

  /** Model tags declared in the `{{ config(...) }}` header —
    * `tags=['nightly', 'pii']` (list) or `tags='nightly'` (single).
    */
  private[graft] def extractTags(sqlText: String): Set[String] = {
    val out = Set.newBuilder[String]
    val m = configTagsPat.matcher(sqlText)
    while (m.find()) {
      val im = setItemPat.matcher(m.group(1))
      while (im.find()) out += im.group(1)
    }
    out.result()
  }

  /** `pre_hook` / `post_hook` declared in the config header — list or
    * single-string form, same single-quoted-item grammar as tags (hook
    * SQL with embedded single quotes belongs in the Scala Model API,
    * not the regex-scoped Jinja subset). Declaration order preserved.
    */
  private[graft] def extractHooks(sqlText: String, key: String): Seq[String] = {
    val pat = Pattern.compile(
      """\{\{\s*config\([^}]*?""" + key + """\s*=\s*(\[[^\]]*\]|'[^']*')[^}]*\)\s*\}\}""")
    val out = Seq.newBuilder[String]
    val m = pat.matcher(sqlText)
    while (m.find()) {
      val im = setItemPat.matcher(m.group(1))
      while (im.find()) out += im.group(1)
    }
    out.result()
  }

  /** Parse and strip `{% set name = [...] %}` blocks; returns the list
    * bindings and the text with the blocks removed. Items keep their raw
    * content (which may itself contain `{{ var("x") }}` calls — those
    * substitute AFTER join interpolation, so a var value containing
    * single quotes, e.g. `DATE '2021-01-20'`, can never confuse the
    * item parser).
    */
  private[graft] def extractSetLists(sqlText: String): (Map[String, Seq[String]], String) = {
    val lists = scala.collection.mutable.Map.empty[String, Seq[String]]
    val m = setListPat.matcher(sqlText)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val items = scala.collection.mutable.ArrayBuffer.empty[String]
      val im = setItemPat.matcher(m.group(2))
      while (im.find()) items += im.group(1)
      lists(m.group(1)) = items.toSeq
      m.appendReplacement(sb, "")
    }
    m.appendTail(sb)
    (lists.toMap, sb.toString)
  }

  /** Render the template: strip `{% set %}` blocks and config headers,
    * interpolate `{{ list | join(sep) }}` call sites, substitute vars,
    * and rewrite every ref/source call site to its registered view name.
    * Throws on an unbound `var` or an unknown list in a `join` — silently
    * leaving template calls in SQL text produces an unhelpful parser
    * error downstream.
    */
  private[engine] def render(sqlText: String, vars: Map[String, String]): String = {
    val (setLists, noSets) = extractSetLists(sqlText)
    val noConfig = configPat.matcher(noSets).replaceAll("")
    val jm = joinPat.matcher(noConfig)
    val jb = new java.lang.StringBuilder
    while (jm.find()) {
      val items = setLists.getOrElse(jm.group(1), throw new IllegalArgumentException(
        s"unknown list '${jm.group(1)}' in join filter (defined: ${setLists.keys.toSeq.sorted.mkString(", ")})"))
      jm.appendReplacement(jb, Matcher.quoteReplacement(items.mkString(jm.group(2))))
    }
    jm.appendTail(jb)
    val vm = varPat.matcher(jb.toString)
    val sb = new java.lang.StringBuilder
    while (vm.find()) {
      val v = vars.getOrElse(vm.group(1), throw new IllegalArgumentException(
        s"unbound var '${vm.group(1)}' in SQL model (bound: ${vars.keys.toSeq.sorted.mkString(", ")})"))
      vm.appendReplacement(sb, Matcher.quoteReplacement(v))
    }
    vm.appendTail(sb)
    val rendered = refPat.matcher(sb.toString)
      .replaceAll(m => Matcher.quoteReplacement(viewName(m.group(1))))
    sourcePat.matcher(rendered)
      .replaceAll(m => Matcher.quoteReplacement(viewName(m.group(2))))
  }

  /** Resolve `{% if is_incremental() %}` blocks and `{{ this }}` call
    * sites against the runner's build-time target context. Exposed for
    * the spec; called from the model's build closure, where
    * `DagRunner.currentBuildTarget` is set.
    */
  private[graft] def renderConditionals(text: String, incremental: Boolean,
                                        thisPath: Option[String],
                                        thisRel: Option[String] = None): String = {
    val m = ifIncPat.matcher(text)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val keep = if (incremental) m.group(1) else Option(m.group(2)).getOrElse("")
      m.appendReplacement(sb, Matcher.quoteReplacement(keep))
    }
    m.appendTail(sb)
    val out = sb.toString
    if (!thisPat.matcher(out).find()) out
    else {
      // thisRel (a pre-rendered relation, e.g. a View model's temp-view
      // name — a view writes nothing to its warehouse path, so the path
      // form would scan a dir that does not exist) wins over the
      // default parquet-path rendering.
      val rel = thisRel.getOrElse {
        val p = thisPath.getOrElse(throw new IllegalArgumentException(
          "{{ this }} requires a warehouse-backed run (no target path in context)"))
        s"parquet.`$p`"
      }
      thisPat.matcher(out).replaceAll(Matcher.quoteReplacement(rel))
    }
  }

  /** Build a [[Model]] from SQL text. `refs` are extracted from the
    * template — the DAG edge list and the SQL body can never drift
    * apart (dbt's own property).
    */
  def fromSqlText(name: String, sqlText: String,
                  materialization: Materialization = View,
                  schema: Option[String] = None,
                  database: Option[String] = None,
                  vars: Map[String, String] = Map.empty): Model = {
    val refs = extractRefs(sqlText)
    val rendered = render(sqlText, vars)
    // Fingerprint the RENDERED text: a var change (e.g. a new partition
    // window) modifies the model exactly as an edit does — dbt's
    // state:modified hashes compiled SQL for the same reason.
    // is_incremental() blocks are fingerprinted UNRESOLVED (both
    // branches), so the identity is stable across first-run vs
    // incremental-run renders of the same text.
    val fp = java.security.MessageDigest.getInstance("SHA-256")
      .digest(rendered.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Model(name, refs,
      (spark: SparkSession, resolved: Map[String, DataFrame]) => {
        refs.foreach(r => resolved(r).createOrReplaceTempView(viewName(r)))
        val ctx = DagRunner.currentBuildTarget
        val finalSql = renderConditionals(rendered,
          incremental = ctx.exists(c => c.incremental && c.exists),
          thisPath = ctx.flatMap(_.path))
        spark.sql(finalSql)
      },
      materialization, schema, database, fingerprint = Some(fp),
      tags = extractTags(sqlText),
      preHooks = extractHooks(sqlText, "pre_hook"),
      postHooks = extractHooks(sqlText, "post_hook"))
  }

  /** Load the SQL text from a classpath resource (the engine's analog of
    * dbt's `models/` directory — `.sql` files shipped under
    * `src/main/resources`); model name defaults to the file basename,
    * exactly like dbt.
    */
  def fromResource(resourcePath: String,
                   materialization: Materialization = View,
                   schema: Option[String] = None,
                   database: Option[String] = None,
                   vars: Map[String, String] = Map.empty): Model = {
    val in = getClass.getClassLoader.getResourceAsStream(resourcePath)
    require(in != null, s"SQL model resource not found: $resourcePath")
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val base = resourcePath.split('/').last.stripSuffix(".sql")
    fromSqlText(base, text, materialization, schema, database, vars)
  }
}
