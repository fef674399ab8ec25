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
    // only the genuinely iterative BPE trio lacks a DuckDB oracle
    // (golden-gated in graft.Verify); dedup_simhash and ann_lsh_topk
    // were promoted to full oracles in round 9
    val rowsOnly = (q -- o).toSeq.sorted
    assert(rowsOnly == Seq("bpe_encode", "bpe_train", "bpe_vocab"),
      s"unexpected rows-only queries (add an oracle or a golden gate " +
        s"+ this allowlist entry): $rowsOnly")
  }
}
