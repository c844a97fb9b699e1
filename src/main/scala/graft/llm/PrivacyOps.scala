package graft.llm

import org.apache.spark.sql.functions._

import graft.dialect.Dialect._
import graft.operators.QueryDef
import graft.sources.Tables

/** Privacy / normalization operators for a training-data pipeline:
  * PII redaction, URL canonicalization, and int8 embedding quantization.
  *
  * The synthetic `documents.text` contains no PII (word-salad, zero
  * digits), so the first two queries derive a deterministic PII-bearing
  * column FROM the table (same expression on the Spark and DuckDB
  * sides) before scrubbing it — the regex machinery is exercised on
  * every row and the oracle hash proves the redaction byte-for-byte,
  * rather than trivially matching on zero hits.
  *
  * All three are narrow per-row transformations: at 100 TB they
  * pipeline through the scan with no shuffle (the final orderBy exists
  * only for the deterministic verify dump). Regexes are written in the
  * RE2 ∩ java.util.regex common subset (no lookaround, no backrefs,
  * explicit [0-9] classes) so both engines match identically —
  * leftmost-first alternation semantics agree.
  */
object PrivacyOps {

  /** Email / NANP-ish phone / IPv4 literals. Kept deliberately in the
    * RE2-compatible subset; `{2,}` bounded reps and char classes only.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val ipRe    = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII redaction: count then mask emails → phones → IPv4s (in that
    * order — the email pattern would otherwise eat the dotted host out
    * of a URL-shaped IP, and phones contain no dots so the IP pass
    * cannot double-fire on a masked phone).
    */
  private val piiRedact = QueryDef(
    "llm_pii_redact",
    (s, dir) => {
      val pii = concat(
        col("text"), lit(" Contact user"), col("doc_id").cast("string"),
        lit("@Example.COM or call +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" node 10."), (col("doc_id") % 256).cast("string"),
        lit("."), ((col("doc_id") * 7) % 256).cast("string"),
        lit("."), ((col("doc_id") * 13) % 256).cast("string"))
      Tables.load(s, dir, "documents")
        .withColumn("pii_text", pii)
        .select(col("doc_id"),
          regexp_count(col("pii_text"), lit(emailRe)).cast("long").as("n_email"),
          regexp_count(col("pii_text"), lit(phoneRe)).cast("long").as("n_phone"),
          regexp_count(col("pii_text"), lit(ipRe)).cast("long").as("n_ip"),
          regexp_replace(
            regexp_replace(
              regexp_replace(col("pii_text"), emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>"),
            ipRe, "<IP>").as("redacted"))
        .orderBy("doc_id")
    },
    Some(s"""SELECT doc_id,
           |  CAST(len(regexp_extract_all(pii_text, '$emailRe')) AS BIGINT) AS n_email,
           |  CAST(len(regexp_extract_all(pii_text, '$phoneRe')) AS BIGINT) AS n_phone,
           |  CAST(len(regexp_extract_all(pii_text, '$ipRe')) AS BIGINT) AS n_ip,
           |  regexp_replace(regexp_replace(regexp_replace(pii_text,
           |    '$emailRe', '<EMAIL>', 'g'),
           |    '$phoneRe', '<PHONE>', 'g'),
           |    '$ipRe', '<IP>', 'g') AS redacted
           |FROM (
           |  SELECT doc_id,
           |    text || ' Contact user' || CAST(doc_id AS VARCHAR)
           |      || '@Example.COM or call +1-555-'
           |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           |      || ' node 10.' || CAST(doc_id % 256 AS VARCHAR)
           |      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
           |      || '.' || CAST((doc_id * 13) % 256 AS VARCHAR) AS pii_text
           |  FROM documents)
           |ORDER BY doc_id""".stripMargin))

  import org.apache.spark.sql.Column

  /** Lowercased host with `www.` and default `:443`/`:80` port
    * stripped — the dedup key for crawl frontier / per-domain stats.
    */
  def urlDomain(raw: Column): Column = {
    val url0 = regexp_replace(raw, "#.*$", "")
    regexp_replace(
      regexp_replace(lower(regexp_extract(url0, "^https?://([^/?#]+)", 1)),
        "^www\\.", ""),
      ":443$|:80$", "")
  }

  /** Canonical form: fragment stripped, host normalized via
    * [[urlDomain]], trailing path slashes trimmed, `utm_*` tracking
    * params removed (remaining query-string order preserved). Path
    * case is preserved (RFC 3986 — only scheme and host are
    * case-insensitive).
    */
  def canonicalizeUrl(raw: Column): Column = {
    val url0 = regexp_replace(raw, "#.*$", "")
    val path = regexp_replace(
      regexp_extract(url0, "^https?://[^/?#]+([^?#]*)", 1), "/+$", "")
    val q = regexp_replace(
      regexp_replace(regexp_extract(url0, "\\?([^#]*)", 1),
        "(^|&)utm_[^&]*", ""),
      "^&+", "")
    concat(lit("https://"), urlDomain(raw), path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  private val urlCanon = QueryDef(
    "llm_url_canon",
    (s, dir) => {
      Tables.load(s, dir, "documents")
        .withColumn("raw_url", concat(
          lit("https://WWW.Example"), (col("doc_id") % 50).cast("string"),
          lit(".COM:443/Videos/"), col("doc_id").cast("string"),
          lit("/?utm_source=feed&id="), col("doc_id").cast("string"),
          lit("&utm_medium=rss#sec-"), (col("doc_id") % 7).cast("string")))
        .select(col("doc_id"), urlDomain(col("raw_url")).as("domain"),
          canonicalizeUrl(col("raw_url")).as("canon_url"),
          regexp_count(col("raw_url"), lit("(^|[?&])utm_[^&#]*")).cast("long")
            .as("n_tracking_params"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  host AS domain,
           |  'https://' || host || path
           |    || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canon_url,
           |  CAST(len(regexp_extract_all(raw_url, '(^|[?&])utm_[^&#]*')) AS BIGINT)
           |    AS n_tracking_params
           |FROM (
           |  SELECT doc_id, raw_url,
           |    regexp_replace(regexp_replace(
           |      lower(regexp_extract(url0, '^https?://([^/?#]+)', 1)),
           |      '^www\.', ''), ':443$|:80$', '') AS host,
           |    regexp_replace(
           |      regexp_extract(url0, '^https?://[^/?#]+([^?#]*)', 1),
           |      '/+$', '') AS path,
           |    regexp_replace(regexp_replace(
           |      regexp_extract(url0, '\?([^#]*)', 1),
           |      '(^|&)utm_[^&]*', '', 'g'), '^&+', '') AS q
           |  FROM (
           |    SELECT doc_id, raw_url, regexp_replace(raw_url, '#.*$', '') AS url0
           |    FROM (
           |      SELECT doc_id,
           |        'https://WWW.Example' || CAST(doc_id % 50 AS VARCHAR)
           |          || '.COM:443/Videos/' || CAST(doc_id AS VARCHAR)
           |          || '/?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
           |          || '&utm_medium=rss#sec-' || CAST(doc_id % 7 AS VARCHAR) AS raw_url
           |      FROM documents)))
           |ORDER BY doc_id""".stripMargin))

  /** Int8 symmetric quantization of an `embedding` float-array column —
    * the compression step before an ANN index ships to serving. scale =
    * 127 / max|x|; q_i = floor(x_i*scale + 0.5) (the portable half-away
    * formula for non-negative .5 offsets — identical in both engines,
    * no round() semantics in play). float→double promotion is exact
    * IEEE in both engines, so the doubles agree bit-for-bit before the
    * floor. All-zero vectors (failed encoder output) get scale=0 → q8
    * all zeros, NOT 127/0=Inf whose 0·Inf=NaN casts differently in the
    * two engines (Spark→0, DuckDB→error); zero-path pinned in
    * `PrivacyOpsSpec`.
    *
    * ADDS COLUMNS `maxabs`, `scale`, `scale_r`, `q8v` (int codes — the
    * retrieval input for `llm_cosine_topk_q8`), and `q8` (the codes as
    * a joined string, hash-pinnable by the oracle); the input frame
    * must not already carry any of them (guarded).
    *
    * The array HOFs here evaluate interpreted (no codegen — see the
    * winnowing note in TextOps), which is acceptable at 2 flops per
    * element; if quantization ever dominates a profile, the typed
    * `Dataset.map` JVM-loop form is the drop-in upgrade.
    */
  def quantizeInt8(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val added = Seq("maxabs", "scale", "scale_r", "q8v", "q8")
    val clash = df.columns.intersect(added)
    require(clash.isEmpty,
      s"quantizeInt8 adds columns ${added.mkString(", ")}; input already has ${clash.mkString(", ")}")
    df
    .withColumn("maxabs",
      expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"))
    .withColumn("scale",
      when(col("maxabs") === 0d, lit(0.0)).otherwise(lit(127.0) / col("maxabs")))
    .withColumn("scale_r", roundTo(col("scale"), 6))
    .withColumn("q8v",
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS INT))"))
    .withColumn("q8", expr("array_join(q8v, ',')"))
  }

  private val embedQuantize = QueryDef(
    "llm_embed_quantize",
    (s, dir) => quantizeInt8(Tables.load(s, dir, "embeddings"))
      .select("vec_id", "scale_r", "q8")
      .orderBy("vec_id"),
    Some("""SELECT vec_id,
           |  floor(scale * 1000000 + 0.5) / 1000000 AS scale_r,
           |  array_to_string(list_transform(embedding,
           |    x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS INTEGER)), ',') AS q8
           |FROM (
           |  SELECT vec_id, embedding,
           |    CASE WHEN maxabs = 0 THEN 0.0 ELSE 127.0 / maxabs END AS scale
           |  FROM (
           |    SELECT vec_id, embedding,
           |      list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
           |    FROM embeddings))
           |ORDER BY vec_id""".stripMargin))

  /** k-anonymity generalization before a data release (Sweeney,
    * "k-anonymity: a model for protecting privacy", IJUFKS 2002): a
    * row's quasi-identifier tuple — here (lang, source), the kind of
    * metadata that re-identifies a contributor when the group is small
    * — must be shared by at least k rows. Instead of suppressing small
    * groups, the standard generalization LADDER widens them:
    * (lang, source) → (lang, '*') → ('*', '*'), each row stopping at
    * the first level whose group reaches k = 8. Two fixed levels, so
    * no fixpoint iteration; the last level is the whole corpus and
    * always satisfies any sane k.
    *
    * Scale shape: the three group-size tables aggregate with map-side
    * partials to at most |lang × source| + |lang| + 1 rows — broadcast
    * joins back onto the corpus, so the whole screen is one scan plus
    * tiny builds. A WINDOW over the categorical quasi-identifier
    * (the naive formulation) would funnel entire groups through
    * single partitions — the same categorical-blocking scale-killer
    * the near-dup ops avoid.
    */
  private val kAnonymity = QueryDef(
    "llm_k_anonymity",
    (s, dir) => {
      val k = 8
      val docs = Tables.load(s, dir, "documents").select("doc_id", "lang", "source")
      val gs = docs.groupBy("lang", "source").agg(count(lit(1)).as("n1"))
      val gl = docs.groupBy("lang").agg(count(lit(1)).as("n2"))
      val tot = docs.agg(count(lit(1)).as("n3"))
      docs.join(broadcast(gs), Seq("lang", "source"))
        .join(broadcast(gl), Seq("lang"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"),
          when(col("n1") >= k, col("lang"))
            .when(col("n2") >= k, col("lang")).otherwise(lit("*")).as("anon_lang"),
          when(col("n1") >= k, col("source")).otherwise(lit("*")).as("anon_source"),
          when(col("n1") >= k, col("n1"))
            .when(col("n2") >= k, col("n2")).otherwise(col("n3")).as("k_group"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, lang, source FROM documents),
           |gs AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n1
           |       FROM d GROUP BY 1, 2),
           |gl AS (SELECT lang, CAST(count(*) AS BIGINT) AS n2 FROM d GROUP BY 1),
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS n3 FROM d)
           |SELECT d.doc_id,
           |  CASE WHEN n1 >= 8 THEN d.lang
           |       WHEN n2 >= 8 THEN d.lang ELSE '*' END AS anon_lang,
           |  CASE WHEN n1 >= 8 THEN d.source ELSE '*' END AS anon_source,
           |  CASE WHEN n1 >= 8 THEN n1
           |       WHEN n2 >= 8 THEN n2 ELSE n3 END AS k_group
           |FROM d
           |JOIN gs USING (lang, source)
           |JOIN gl USING (lang), tot
           |ORDER BY doc_id""".stripMargin))

  /** l-diversity audit (Machanavajjhala et al., "l-Diversity: Privacy
    * Beyond k-Anonymity", ICDE 2006) — k-anonymity's complement: a
    * quasi-identifier group can be large (k-anonymous) yet still leak
    * its members' sensitive attribute if every member SHARES it. Per
    * (lang, source) group this reports the count of distinct sensitive
    * values (the document-length class stands in for the sensitive
    * column), the distinct-l flag at l = 3, and the Shannon entropy of
    * the sensitive distribution (the entropy-l-diversity measure). One
    * two-level aggregate — (group, sensitive) partial counts map-side,
    * then a group rollup — output bounded by |groups|.
    */
  private val lDiversity = QueryDef(
    "llm_l_diversity",
    (s, dir) => {
      val l = 3
      val d = Tables.load(s, dir, "documents")
        .select(col("lang"), col("source"),
          floor(col("n_chars") / 500).cast("long").as("sens"))
      val per = d.groupBy("lang", "source", "sens").agg(count(lit(1)).as("c"))
      per.groupBy("lang", "source")
        .agg(sum("c").as("n"),
          count(lit(1)).as("n_sensitive_values"),
          roundTo(-sum(col("c") * log(col("c"))) / sum("c") +
            log(sum("c")), 4).as("sens_entropy"))
        .select(col("lang"), col("source"), col("n"),
          col("n_sensitive_values"),
          (col("n_sensitive_values") >= l).as("l_diverse"),
          col("sens_entropy"))
        .orderBy("lang", "source")
    },
    Some("""WITH d AS (
           |  SELECT lang, source,
           |         CAST(floor(n_chars / 500.0) AS BIGINT) AS sens
           |  FROM documents),
           |per AS (
           |  SELECT lang, source, sens, CAST(count(*) AS BIGINT) AS c
           |  FROM d GROUP BY 1, 2, 3)
           |SELECT lang, source,
           |  CAST(sum(c) AS BIGINT) AS n,
           |  CAST(count(*) AS BIGINT) AS n_sensitive_values,
           |  count(*) >= 3 AS l_diverse,
           |  floor((-sum(c * ln(c)) / sum(c) + ln(sum(c))) * 10000.0 + 0.5) / 10000.0
           |    AS sens_entropy
           |FROM per GROUP BY 1, 2
           |ORDER BY lang, source""".stripMargin))

  val all: Seq[QueryDef] = Seq(piiRedact, urlCanon, embedQuantize, kAnonymity,
    lDiversity)
}
