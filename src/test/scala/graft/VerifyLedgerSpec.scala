package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Verify self-describing ledger (VERDICT r8 item 1): the
  * per-round VERIFY_r{N}.json must let anyone distinguish "driver channel
  * failed" from "code failed" without re-running anything — so its JSON
  * shape, completeness flag and failure accounting are spec'd here as a
  * pure function, and the contract invariants (expected count == the
  * driver surface, exemption registry consistency) are pinned against
  * SparkEntry itself.
  */
class VerifyLedgerSpec extends AnyFunSuite {

  test("ledger is valid JSON with the completeness verdict inline") {
    val entries = Seq(
      ("q1_agg", "ok", 42L, 0.5),
      ("q2_join", "fail", -1L, 1.25))
    val j = Verify.ledgerJson("/data/sf0.01", entries, nExpected = 3,
      exempt = Set("mm_jpeg_decode"), nOracleSql = 2)
    // shape: parseable by the same class of consumer as the driver's
    // json.load — cross-check with a real parser (javax scripting is
    // gone; use the jackson shipped with Spark)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(j)
    assert(root.get("metric").asText() == "verify")
    assert(root.get("n_expected").asInt() == 3)
    assert(root.get("n_run").asInt() == 2)
    assert(root.get("n_dumped").asInt() == 1)
    assert(root.get("n_failed").asInt() == 1)
    assert(!root.get("complete").asBoolean())
    assert(root.get("failed").get(0).asText() == "q2_join")
    assert(root.get("oracle_exempt").get(0).asText() == "mm_jpeg_decode")
    assert(root.get("queries").get("q1_agg").get("rows").asLong() == 42L)
    assert(root.get("queries").get("q2_join").get("status").asText()
      == "fail")
  }

  test("complete run reports complete=true and no failures") {
    val entries = Seq(("a", "ok", 1L, 0.1), ("b", "ok", 2L, 0.2))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(
      Verify.ledgerJson("sf", entries, 2, Set.empty, 2))
    assert(root.get("complete").asBoolean())
    assert(root.get("n_failed").asInt() == 0)
    assert(root.get("failed").size() == 0)
  }

  test("control characters in names survive the JSON escape") {
    val entries = Seq(("q\twith\ncontrolchars", "ok", 1L, 0.1))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(
      Verify.ledgerJson("sf", entries, 1, Set.empty, 1))
    assert(root.get("queries").has("q\twith\ncontrolchars"))
  }

  test("ledger contract matches the driver surface: exemption registry" +
      " + oracle count close over SparkEntry") {
    // the invariant the committed VERIFY_r{N} artifact certifies: every
    // query is either oracled or registered-exempt, so n_expected ==
    // n_oracle_sql + |exempt| — if this drifts, the ledger's completeness
    // verdict would overstate coverage
    assert(SparkEntry.oracleExempt.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size ==
      SparkEntry.oracleSql.size + SparkEntry.oracleExempt.size)
  }
}
