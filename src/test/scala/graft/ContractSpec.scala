package graft

/** The driver contract invariants: every query carries a DuckDB oracle
  * (the zero-no-oracle property the correctness gate relies on), and
  * names are unique BEFORE the Map collapses them (a duplicate would
  * silently shadow one module's query). Asserted over
  * `SparkEntry.allDefs` itself — the same list the driver surface is
  * built from — so there is no second module list to keep in sync.
  */
class ContractSpec extends SparkSpec {

  test("every SparkEntry query has an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
  }

  test("query names are unique across operator modules") {
    val all = SparkEntry.allDefs.map(_.name)
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.toSeq.sorted}")
    assert(all.size === SparkEntry.queries.size)
  }
}
