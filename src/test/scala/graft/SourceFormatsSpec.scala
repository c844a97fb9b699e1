package graft

import org.apache.spark.sql.Row

import graft.sources.SourceFormats

/** Round-trip semantics for the non-parquet source formats: the
  * adversarial rows (embedded newline + quotes + commas, empty string,
  * NULLs) must survive a write/read cycle BYTE-EXACTLY in both JSON and
  * CSV — the distinctions a naive CSV setup silently destroys
  * (newline splits the record without multiLine; NULL and '' conflate
  * without the nullValue/emptyValue split).
  */
class SourceFormatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def edge(fmt: String): Map[Long, Row] = {
    val q = SourceFormats.all.find(_.name == s"$fmt").get
    q.fn(spark, sf).filter("doc_id < 0").collect()
      .map(r => r.getLong(0) -> r).toMap
  }

  for (fmt <- Seq("s9_json_source", "s10_csv_source")) {
    test(s"$fmt round-trips newline/quote/comma text, empty string, and NULLs") {
      val rows = edge(fmt)
      assert(rows.keySet == Set(-1L, -2L, -3L))
      val hostile = rows(-1L)
      assert(hostile.getString(1) == "line one\nline two, \"quoted\" and a, comma")
      assert(hostile.getString(2) == "en")
      assert(hostile.getLong(4) == 40L)
      val empty = rows(-2L)
      assert(empty.getString(1) == "", "empty string must NOT conflate with NULL")
      val nulls = rows(-3L)
      assert(nulls.isNullAt(1) && nulls.isNullAt(2) && nulls.isNullAt(4),
        "NULLs must NOT conflate with empty string")
    }
  }

  test("round-trip preserves the full corpus row count") {
    val n = graft.sources.Tables.load(spark, sf, "documents").count()
    val got = SourceFormats.all.find(_.name == "s10_csv_source").get.fn(spark, sf).count()
    assert(got == n + 3)
  }
}
