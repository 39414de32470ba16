package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself (SparkEntry), independent of Spark.
  *
  * The correctness gate hash-compares every `oracleSql` entry against
  * DuckDB; a query WITHOUT an oracle gets only a weaker rows>0 check. That
  * omission is permitted by the contract, but only for the documented set
  * whose semantics are sketch-/seed-/engine-dependent (README "Oracle
  * coverage"). This spec turns the convention into a checked invariant: a
  * new query landing without an oracle outside the allowlist fails CI
  * instead of silently weakening the gate.
  */
class ContractSpec extends AnyFunSuite {

  /** The documented rows-only set. Grow this ONLY with a README entry
    * explaining why no DuckDB oracle can exist for the query. */
  private val noOracleAllowlist: Set[String] = Set(
    "q_approx",        // HLL/GK approx aggs — engine-specific estimates
    "q_dedup_minhash", // MLlib MinHashLSH — JVM-seeded coefficients
    "q_dedup_simhash", // xxhash64 bit layout has no DuckDB twin
    "q_misc_pack"      // soundex/xpath/sentences — functions DuckDB lacks
    // q_ann_knn / q_ann_lsh graduated in r14: re-seated on the
    // md5-deterministic multiprobe serving chain, now hash-oracled.
    // q_ann_ivf graduated in r15: md5-ordered centroid pick + exact
    // decimal L2² assignment replaced the JVM kmeans seed.
  )

  test("every query is oracled or in the documented no_oracle allowlist") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val unoracled = q -- o
    val stray = unoracled -- noOracleAllowlist
    assert(stray.isEmpty,
      s"queries without an oracleSql entry outside the allowlist: " +
        s"${stray.toSeq.sorted.mkString(", ")} — add an oracle or document " +
        "the impossibility in README and extend the allowlist")
    val stale = noOracleAllowlist -- unoracled
    assert(stale.isEmpty,
      s"allowlist entries that are now oracled or gone: " +
        s"${stale.toSeq.sorted.mkString(", ")} — shrink the allowlist")
  }

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracleSql entries with no query: ${orphans.toSeq.sorted.mkString(", ")}")
  }
}
