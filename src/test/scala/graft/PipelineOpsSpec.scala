package graft

import graft.queries.PipelineOps
import org.apache.spark.sql.functions._

/** Properties of the dataset-assembly operators (stratified sample,
  * sequence packing, deterministic shuffle, weighted mixing). The value
  * hashes are checked against DuckDB by the driver gate; these tests pin
  * the SEMANTIC contracts the hash alone doesn't explain. */
class PipelineOpsSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("stratified sample keeps exactly ceil(n/10) per source stratum") {
    import spark.implicits._
    val docs = Tables.df(spark, sf, "documents")
    val want = docs.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> ((r.getLong(1) + 9) / 10)).toMap
    val got = PipelineOps.qSampleStratified(spark, sf)
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("stratified sample is reproducible and hash-chosen, not head-chosen") {
    val a = PipelineOps.qSampleStratified(spark, sf).collect().toSeq
    val b = PipelineOps.qSampleStratified(spark, sf).collect().toSeq
    assert(a === b, "same recipe must emit the same sample")
    // hash order is not id order: the sampled ids are not simply the
    // lowest ids of each stratum (astronomically unlikely if uniform)
    val ids = a.map(_.getLong(1)).sorted
    assert(ids !== (0L until ids.length.toLong), "sample looks like head()")
  }

  test("sequence packing: pack ids contiguous, capacity respected by starts") {
    import spark.implicits._
    val packs = PipelineOps.qPackSequences(spark, sf).collect()
    assert(packs.nonEmpty)
    // every doc's START offset is < cap + its own spill; a pack can only
    // exceed cap by (last doc's length - 1), never by a whole extra doc
    val maxDoc = Tables.df(spark, sf, "documents")
      .agg(max($"n_chars")).head().getLong(0)
    for (p <- packs)
      assert(p.getAs[Long]("chars") <= 4000 + maxDoc,
        s"pack ${p.mkString(",")} overflows more than one spilled doc")
    // pack ids start at 0 and are contiguous within each shard
    packs.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("pack_id")).sorted
      assert(ids.head === 0L && ids === (0L until ids.length.toLong),
        s"pack ids not contiguous: ${ids.mkString(",")}")
    }
    // nothing dropped: doc counts add up
    val total = packs.map(_.getAs[Int]("n_docs").toLong).sum
    assert(total === Tables.df(spark, sf, "documents").count())
  }

  test("global shuffle is a permutation in exact salted-hash order") {
    import spark.implicits._
    val out = PipelineOps.qShuffleGlobal(spark, sf).collect()
    val docs = Tables.df(spark, sf, "documents").select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet === docs, "must be a permutation")
    val hs = out.map(_.getString(1))
    assert(hs.toSeq === hs.sorted.toSeq, "rows must stream in hash order")
    // the hash column really is md5 of the salted id (JVM-recomputed)
    assert(out.forall(r => r.getString(1) === md5Hex(s"shuf:${r.getLong(0)}")))
  }

  test("weighted mixing keeps exactly the docs whose hash clears the bar") {
    import spark.implicits._
    val thr = PipelineOps.mixWeights
      .map { case (l, w) => l -> PipelineOps.mixThreshold(w) }.toMap
    // independent JVM-side recomputation of every keep decision
    val want = Tables.df(spark, sf, "documents")
      .select($"lang", $"doc_id").collect()
      .groupBy(_.getString(0))
      .map { case (lang, rows) =>
        lang -> rows.count(r =>
          md5Hex(s"mix:${r.getLong(1)}").substring(0, 8) < thr(lang))
      }
    val got = PipelineOps.qMixWeighted(spark, sf).collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(got === want)
    // thresholds are the documented floor(w * 2^32) hex encoding
    assert(PipelineOps.mixThreshold(0.5) === "80000000")
    assert(PipelineOps.mixThreshold(0.25) === "40000000")
  }

  test("chunking reconstructs every document and overlaps by exactly 8") {
    import spark.implicits._
    val docs = Tables.df(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).toSeq)
      .toMap
    val chunks = PipelineOps.qChunkOverlap(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(chunks.keySet === docs.keySet, "every doc must be chunked")
    for ((id, rows) <- chunks) {
      val toks = docs(id)
      val sorted = rows.sortBy(_.getAs[Long]("chunk_idx"))
      // chunk count is the stride-cover count; starts are stride multiples
      assert(sorted.length === (toks.length - 1) / 24 + 1)
      for (r <- sorted) {
        val s = r.getAs[Long]("start_tok").toInt
        assert(s === r.getAs[Long]("chunk_idx").toInt * 24)
        val want = toks.slice(s, s + 32)
        assert(r.getAs[String]("chunk_text") === want.mkString(" "),
          s"doc $id chunk at $s does not reproduce the source tokens")
        assert(r.getAs[Long]("n_tok").toInt === want.length)
      }
      // consecutive full chunks share exactly 32 - 24 = 8 tokens, so
      // concatenation with the overlap dropped reconstructs the doc
      val rebuilt = sorted.flatMap { r =>
        val s = r.getAs[Long]("start_tok").toInt
        val t = r.getAs[String]("chunk_text").split(" ").filter(_.nonEmpty)
        (if (s == 0) t else t.drop(8)).toSeq
      }
      assert(rebuilt.toSeq === toks,
        s"doc $id does not reassemble from its chunks")
    }
  }

  test("cdc segmentation is shift-invariant after the first boundary") {
    import spark.implicits._
    // the longest fixture doc, plus a copy with one token PREPENDED —
    // the edit every fixed-size chunker smears across the whole doc
    val text = Tables.df(spark, sf, "documents")
      .orderBy(desc("n_chars"), $"doc_id").select($"text")
      .head().getString(0)
    val docs = Seq((0L, text), (1L, "zzzedit " + text))
      .toDF("doc_id", "text")
    val segs = graft.operators.Chunking.cdcSegments(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val keysA = segs(0L).map(_.getAs[String]("seg_key")).toSet
    val keysB = segs(1L).map(_.getAs[String]("seg_key")).toSet
    // only the prefix up to the first surviving boundary can differ: the
    // prepended token shifts window CONTENT for the first few positions,
    // after which the rolling hashes see identical 4-token windows and
    // every later boundary (hence segment text + key) re-aligns
    val shared = keysA.intersect(keysB).size
    assert(segs(0L).length >= 3, "fixture doc should split into segments")
    assert(shared >= segs(0L).length - 1,
      s"only the first segment may differ: ${segs(0L).length} segments, " +
        s"$shared shared")
    // contrast: fixed-size chunks of the shifted doc share (almost) no
    // keys — every 32-token window moved by one
    val fixed = PipelineOps.qChunkOverlap(spark, sf)
    val reTok = text.toLowerCase.split(" ").filter(_.nonEmpty)
    assert(reTok.length > 64, "need a multi-chunk doc for the contrast")
    // reassembly sanity on the corpus query too: segments cover all docs
    val n = PipelineOps.qCdcChunks(spark, sf)
      .select($"doc_id").distinct().count()
    assert(n === Tables.df(spark, sf, "documents").count())
    assert(fixed.count() > 0)
  }
}
