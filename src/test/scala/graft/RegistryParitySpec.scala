package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene: every oracle names a registered query, and the
  * no-oracle set stays exactly the five hash-function queries whose
  * semantics DuckDB cannot express (each is golden-gated in Verify). */
class RegistryParitySpec extends AnyFunSuite {
  test("oracleSql keys ⊆ queries keys; the rows-only set is closed") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val orphans = o -- q
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    val rowsOnly = (q -- o).toSeq.sorted
    assert(rowsOnly == Seq("ann_lsh_topk", "bpe_encode", "bpe_train",
      "bpe_vocab", "dedup_simhash"),
      s"unexpected rows-only queries (add an oracle or a golden gate " +
        s"+ this allowlist entry): $rowsOnly")
  }
}
