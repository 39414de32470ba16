package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC): segment token streams at positions
  * where a rolling window hash clears a threshold, so segment boundaries
  * depend only on LOCAL content. Unlike fixed-size chunking, an edit near
  * the start of a document shifts only the segments up to the next
  * boundary — everything after re-aligns, which is what makes CDC the
  * storage/dedup-layer primitive (shared segments across near-identical
  * docs get identical keys and dedup away).
  *
  * Determinism/portability: the rolling hash is the md5 hex of the
  * space-joined 4-token window (no engine RNG, no custom hash), and the
  * boundary test is a plain string compare of its first two hex chars —
  * expressible identically in DuckDB, so segment rows hash-check.
  *
  * Scale shape: one ×tokens posexplode, a lag window and a running-sum
  * window both partitioned by doc_id, one (doc_id, seg) aggregate with an
  * ordered reassembly — every stage keyed by document, no joins, no
  * global state; cost ∝ tokens.
  */
object Chunking {

  /** Boundary probability: first two md5 hex chars < "08" is 8/256 =
    * 1/32 → mean segment length ≈ 32 tokens. */
  private val boundaryBar = "08"

  /** (doc_id, text) → (doc_id, seg_idx, n_tok, seg_text, seg_key).
    * A position p ≥ 3 ENDS its segment when md5 of tokens p−3..p clears
    * the bar; position p belongs to segment = #boundaries before p. */
  def cdcSegments(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val wLag = Window.partitionBy($"doc_id").orderBy($"p")
    val wRun = wLag.rowsBetween(Window.unboundedPreceding, -1)
    // NOTE on parallelism: at sf0.1 this runs nearly single-threaded
    // (the window exchange AQE-coalesces to ~1 partition at 11 MB), but
    // both pinned-repartition placements were tried and measured NEUTRAL
    // TO WORSE here (PERF.md round 9) — unlike the fan-out cases, the
    // dominant cost is the per-token window chain itself, which the
    // extra exchange only taxes. At scale the scan's own task count and
    // the doc_id-keyed window exchange provide the parallelism.
    docs
      .select($"doc_id",
        posexplode(graft.functions.TextFunctions.tokens($"text"))
          .as(Seq("p", "tok")))
      .withColumn("win4", concat_ws(" ",
        lag($"tok", 3).over(wLag), lag($"tok", 2).over(wLag),
        lag($"tok", 1).over(wLag), $"tok"))
      .withColumn("boundary",
        ($"p" >= 3 && substring(md5($"win4"), 1, 2) < boundaryBar)
          .cast("int"))
      .withColumn("seg", coalesce(sum($"boundary").over(wRun), lit(0L)))
      .groupBy($"doc_id", $"seg")
      .agg(count(lit(1)).as("n_tok"),
        array_join(transform(
          sort_array(collect_list(struct($"p", $"tok"))), s => s("tok")),
          " ").as("seg_text"))
      .select($"doc_id", $"seg".cast("long").as("seg_idx"), $"n_tok",
        $"seg_text", md5($"seg_text").as("seg_key"))
  }
}
