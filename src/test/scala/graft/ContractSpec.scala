package graft

/** The driver contract invariants: every query carries a DuckDB oracle
  * (the zero-no-oracle property the correctness gate relies on), and
  * names are unique BEFORE the Map collapses them (a duplicate would
  * silently shadow one module's query). Asserted over
  * `SparkEntry.allDefs` itself — the same list the driver surface is
  * built from — so there is no second module list to keep in sync.
  */
class ContractSpec extends SparkSpec {

  // Rows-only exemptions (the driver contract's "omit for non-SQL-
  // expressible ops" clause) — each needs a justification AND a stronger
  // sibling row that IS oracled. Kept deliberately tiny: the default is
  // an oracle, and this list is the audited record of the exceptions.
  // EMPTY since round 13: s22c_profile_approx_prod (the last exemption)
  // now band-validates its HLL estimates in-row against an Expand-free
  // exact side and pins the result as an oracle boolean.
  private val rowsOnly = Set.empty[String]

  test("every SparkEntry query has an oracle (or an audited rows-only exemption)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o -- rowsOnly).isEmpty,
      s"queries without an oracle: ${(q -- o -- rowsOnly).toSeq.sorted}")
    // The exemption list may not rot: an exempted name must still exist
    // and must still have no oracle (else the exemption should go).
    assert(rowsOnly.subsetOf(q), s"stale rows-only exemption: ${(rowsOnly -- q).toSeq.sorted}")
    assert((rowsOnly & o).isEmpty,
      s"exempted queries that now HAVE an oracle: ${(rowsOnly & o).toSeq.sorted}")
  }

  test("query names are unique across operator modules") {
    val all = SparkEntry.allDefs.map(_.name)
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.toSeq.sorted}")
    assert(all.size === SparkEntry.queries.size)
  }

  test("Bench.priorTimings extracts per-query seconds from a driver tail record") {
    val dir = java.nio.file.Files.createTempDirectory("benchprior")
    // Mimic the driver record shape: per-query pairs live ESCAPED inside
    // the "tail" JSON string, truncated at the front, parsed:null.
    java.nio.file.Files.writeString(dir.resolve("BENCH_r03.json"),
      """{"n":3,"rc":0,"tail":"_compute\":1.533,\"q_beta\":0.224,\"value\":9.9","parsed":null}""")
    java.nio.file.Files.writeString(dir.resolve("BENCH_r04.json"),
      """{"n":4,"rc":0,"tail":"_compute\":9.999,\"q_alpha\":2.500,\"q_beta\":0.300,\"steal_pct\":0.31","parsed":null}""")
    val got = Bench.priorTimings(dir.toString, Set("q_alpha", "q_beta", "q_gamma"))
    // newest record only, filtered to known names (no "value"/"steal_pct")
    assert(got === Map("q_alpha" -> 2.5, "q_beta" -> 0.3))
    assert(Bench.priorTimings(
      java.nio.file.Files.createTempDirectory("benchempty").toString,
      Set("q_alpha")) === Map.empty)
  }
}
