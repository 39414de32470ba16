package graft

import graft.queries.GovernOps
import org.apache.spark.sql.functions._

/** Properties of the corpus-governance pack beyond the DuckDB hash gate:
  * the sketch estimate tracks the exact overlap it estimates, the funnel
  * counts are an exact partition of the corpus, and the packing report
  * agrees with the packing manifest it summarizes. */
class GovernSpec extends SparkSpec {

  test("minhash source estimate tracks the exact Jaccard matrix") {
    val exact = GovernOps.qSourceOverlap(spark, sf)
      .select("s1", "s2", "j").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val est = GovernOps.qMinhashSource(spark, sf)
      .select("s1", "s2", "est_j").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est.keySet == exact.keySet,
      "estimate must cover every source pair the exact matrix covers")
    val diffs = exact.map { case (k, j) => math.abs(est(k) - j) }
    // 16 permutations: per-pair sd = sqrt(J(1-J)/16) <= 0.125; a single
    // pair may stray ~3 sd, the mean must sit well inside one
    assert(diffs.max <= 0.45, s"worst estimate error ${diffs.max}")
    assert(diffs.sum / diffs.size <= 0.15,
      s"mean estimate error ${diffs.sum / diffs.size}")
  }

  test("funnel stages chain exactly: out of stage k = into stage k+1") {
    val rows = GovernOps.qFilterFunnel(spark, sf)
      .orderBy("stage").collect()
    assert(rows.length == 4)
    val total = Tables.df(spark, sf, "documents").count()
    assert(rows.head.getLong(rows.head.fieldIndex("n_in")) == total,
      "stage 1 must see the whole corpus")
    for (r <- rows) {
      val in = r.getLong(r.fieldIndex("n_in"))
      val kept = r.getLong(r.fieldIndex("n_kept"))
      val dropped = r.getLong(r.fieldIndex("n_dropped"))
      assert(kept + dropped == in, s"stage ${r.getInt(0)} must partition")
      assert(kept >= 0 && kept <= in)
    }
    for (Array(a, b) <- rows.sliding(2))
      assert(b.getLong(b.fieldIndex("n_in")) == a.getLong(a.fieldIndex("n_kept")),
        "next stage input must equal previous stage survivors")
  }

  test("reshard plan shows the consistent-hashing trade-off exactly") {
    val rows = GovernOps.qReshardPlan(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("consistent", "mod"))
    val cons = rows("consistent"); val mod = rows("mod")
    def frac(r: org.apache.spark.sql.Row) =
      r.getDouble(r.fieldIndex("moved_frac"))
    // modulo resharding 8 -> 9 moves 1 - 1/9 of uniformly-hashed rows
    assert(math.abs(frac(mod) - 8.0 / 9.0) < 0.05,
      s"mod moved_frac ${frac(mod)} should be ~8/9")
    // the ring exists precisely because it moves far fewer rows
    assert(frac(cons) < frac(mod) / 2.0,
      s"consistent ${frac(cons)} should move far less than mod ${frac(mod)}")
    // ...at the cost of balance with only 4 vnodes/shard: mod stays tight
    val modBal = mod.getDouble(mod.fieldIndex("balance_ratio"))
    assert(modBal < 1.3, s"mod balance $modBal")
    for (r <- rows.values) {
      assert(r.getLong(r.fieldIndex("n_moved")) <=
        r.getLong(r.fieldIndex("n_docs")))
      assert(r.getDouble(r.fieldIndex("balance_ratio")) >= 1.0 - 1e-9)
    }
  }

  test("pack efficiency agrees with the q_pack_sequences manifest at 4000") {
    import spark.implicits._
    val manifest = queries.PipelineOps.qPackSequences(spark, sf)
    val eff4000 = GovernOps.qPackEfficiency(spark, sf)
      .filter($"cap" === 4000L).head()
    assert(eff4000.getLong(eff4000.fieldIndex("n_packs")) == manifest.count(),
      "pack count must match the manifest")
    val chars = manifest.agg(sum($"chars")).head().getLong(0)
    assert(eff4000.getLong(eff4000.fieldIndex("total_chars")) == chars)
    // a shard's FINAL doc may straddle its last pack boundary (docs are
    // never split), so util can exceed 1 by < max_doc/(n_packs·cap)
    val util = eff4000.getDouble(eff4000.fieldIndex("util"))
    assert(util > 0.0 && util < 1.15, s"utilization $util out of range")
  }
}
