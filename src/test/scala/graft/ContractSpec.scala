package graft

/** The driver contract invariants: every query carries a DuckDB oracle
  * (the zero-no-oracle property the correctness gate relies on), names
  * are unique, and no oracle points at a nonexistent query.
  */
class ContractSpec extends SparkSpec {

  test("every SparkEntry query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique across operator modules") {
    // QueryDef lists are concatenated in SparkEntry; a duplicate name
    // would silently shadow one module's query in the Map.
    val all = Seq(
      graft.operators.RelationalOps.all, graft.operators.DialectOps.all,
      graft.operators.Flagship.all, graft.operators.ScaleOps.all,
      graft.operators.OlapOps.all, graft.operators.TimeSeriesOps.all,
      graft.sources.SourceFormats.all, graft.llm.TextOps.all,
      graft.llm.DedupOps.all, graft.llm.SimilarityOps.all,
      graft.llm.Multimodal.all, graft.llm.PrivacyOps.all,
      graft.models.DagQueries.all).flatten.map(_.name)
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.toSeq.sorted}")
    assert(all.size === SparkEntry.queries.size)
  }
}
