package graft

/** The driver-contract invariants the correctness gate relies on:
  * every oracle names a registered query, every query without an
  * oracle is one of the four documented rows-only entries (each
  * spec-verified against an independent single-node reference), and
  * every verify-dump sort key names a registered query. Guards the
  * registry drift the per-round hygiene check tracks.
  */
class EntryContractSpec extends org.scalatest.funsuite.AnyFunSuite {
  private val rowsOnly = Set("q_approx_distinct",
    "llm_bpe_train", "llm_bpe_apply", "llm_bpe_apply_idx")

  test("every oracle names a registered query; every oracle-less query is documented rows-only") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
    assert((q -- o) === rowsOnly,
      s"undocumented oracle-less queries: ${(q -- o -- rowsOnly).toSeq.sorted}; " +
        s"stale rows-only entries: ${(rowsOnly -- (q -- o)).toSeq.sorted}")
  }

  test("every verify-dump sort key names a registered query") {
    val extra = SparkEntry.dumpOrder.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"dumpOrder keys with no query: ${extra.toSeq.sorted}")
  }
}
