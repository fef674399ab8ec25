package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene: every oracle names a registered query, and EVERY
  * registered query carries a DuckDB oracle — the golden tier is empty
  * (round 10 promoted the BPE trio by unrolling the fixed 8 merge
  * rounds into a static CTE chain; simhash and LSH were promoted in
  * round 9). The Verify golden gates remain as an independent second
  * tier for the hash/iterative queries. */
class RegistryParitySpec extends AnyFunSuite {
  test("oracleSql keys ⊆ queries keys; every query is oracled") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val orphans = o -- q
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    val rowsOnly = (q -- o).toSeq.sorted
    assert(rowsOnly.isEmpty,
      s"queries without a DuckDB oracle (add one — the golden tier " +
        s"is closed): $rowsOnly")
  }
}
