package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.QueryDef

/** Non-parquet source formats: JSON-lines and CSV read paths, verified
  * by ROUND-TRIP oracles — Spark writes the `documents` table in the
  * format, reads it back with an explicit schema, and the result must
  * hash-match the original parquet content (which is what the DuckDB
  * oracle reads). Any serialization loss — quoting, escaping, type
  * coercion, NULL/empty-string conflation — breaks the row hash.
  *
  * Scale notes: both readers stream splittable files with the schema
  * given EXPLICITLY (schema inference is a full extra pass over 100 TB
  * and is nondeterministic under sampling — never ship it); CSV sets
  * mode=FAILFAST so a malformed row fails loudly instead of silently
  * nulling columns.
  */
object SourceFormats {

  private def roundTrip(s: SparkSession, dir: String, fmt: String,
                        options: Map[String, String]): DataFrame = {
    val src = Tables.load(s, dir, "documents")
    val out = s"${sys.props("java.io.tmpdir")}/graft-src-$fmt-${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    src.write.mode("overwrite").options(options).format(fmt).save(out)
    s.read.schema(src.schema).options(options).format(fmt).load(out)
      .orderBy("doc_id")
  }

  private val docsOracle =
    """SELECT doc_id, text, lang, source, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  private val jsonSource = QueryDef(
    "s9_json_source",
    (s, dir) => roundTrip(s, dir, "json", Map.empty)
      .select("doc_id", "text", "lang", "source", "n_chars"),
    Some(docsOracle))

  private val csvSource = QueryDef(
    "s10_csv_source",
    (s, dir) => roundTrip(s, dir, "csv",
      Map("header" -> "true", "quote" -> "\"", "escape" -> "\"",
        "mode" -> "FAILFAST"))
      .select("doc_id", "text", "lang", "source", "n_chars"),
    Some(docsOracle))

  val all: Seq[QueryDef] = Seq(jsonSource, csvSource)
}
