package graft

import graft.queries.{CurateOps, PipelineOps, TextOps}
import graft.streaming.Streams
import graft.functions.TextFunctions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Properties of the round-10f split/normalization operators and the
  * watermark streaming twin: normalization can only add duplicates,
  * k-fold conserves documents with near-balanced folds, and the
  * stateless HOF z-score path is row-identical to the batch
  * explode+lag path — both statically and across micro-batches. */
class R10fOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q_norm_dedup ------------------------------------------------------

  test("norm dedup: normalization only adds duplicates, counts conserved") {
    val rows = TextOps.qNormDedup(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, dupRaw, dupNorm, extra) =>
      assert(dupRaw >= 0 && dupNorm >= dupRaw,
        "a raw-equal pair stays equal after normalization")
      assert(extra == dupNorm - dupRaw)
      assert(dupNorm < n)
    }
    val total = Tables.df(spark, sf, "documents").count()
    assert(rows.map(_._2).sum == total)
  }

  // ---- q_kfold -----------------------------------------------------------

  test("kfold: every doc in exactly one fold, shares sum to 1 per fold, " +
      "and the md5 folds are reasonably balanced") {
    val rows = PipelineOps.qKfold(spark, sf)
      .as[(Int, String, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 4))
    val total = Tables.df(spark, sf, "documents").count()
    assert(rows.map(_._3).sum == total)
    rows.groupBy(_._1).foreach { case (fold, rs) =>
      val shareSum = rs.map(_._4).sum
      assert(math.abs(shareSum - 1.0) < 1e-4,
        s"fold $fold shares sum to $shareSum")
      val n = rs.map(_._3).sum
      assert(math.abs(n - total / 5.0) < 0.35 * total / 5.0,
        s"md5 fold $fold size $n vs expected ${total / 5.0}")
    }
    rows.foreach(r => assert(math.abs(r._6 - (r._4 - r._5)) < 1e-5))
  }

  // ---- watermark streaming twin ------------------------------------------

  test("watermark z: the stateless HOF stream path equals the batch " +
      "explode+lag path per document") {
    val docs = Tables.df(spark, sf, "documents")
    val hof = Streams.watermarkZStream(docs)
      .select($"doc_id", $"z").as[(Long, Double)].collect().toMap
    // batch-path per-doc z (the qWatermark internal stage)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val batch = docs
      .select($"doc_id",
        posexplode(TextFunctions.tokens($"text")).as(Seq("pos", "tok")))
      .withColumn("prev", lag($"tok", 1).over(w))
      .filter($"prev".isNotNull)
      .withColumn("green",
        conv(substring(md5(concat($"prev", lit("|"), $"tok")), 1, 15),
          16, 10).cast("long") % 2 === 0)
      .groupBy($"doc_id")
      .agg(round((lit(2.0) * sum($"green".cast("long")) - count(lit(1)))
        / sqrt(count(lit(1))), 6).as("z"))
      .as[(Long, Double)].collect().toMap
    assert(hof.keySet == batch.keySet)
    assert(hof.nonEmpty)
    hof.foreach { case (id, z) =>
      assert(math.abs(z - batch(id)) < 1e-9, s"doc $id: $z vs ${batch(id)}")
    }
  }

  test("watermark z stream: two micro-batches reproduce the static " +
      "result exactly (stateless, so batching cannot matter)") {
    implicit val sqlCtx = spark.sqlContext
    val static = Streams.watermarkZStream(Tables.df(spark, sf, "documents"))
      .select($"doc_id", $"z").as[(Long, Double)].collect().toMap
    val all = Tables.df(spark, sf, "documents")
      .select($"doc_id".as[Long], $"source".as[String], $"text".as[String])
      .collect().toSeq
    val (b1, b2) = all.splitAt(all.size / 2)
    val input = MemoryStream[(Long, String, String)]
    val q = Streams.watermarkZStream(
        input.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("wm_z_stream")
      .outputMode("append").start()
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val got = spark.table("wm_z_stream")
        .select($"doc_id", $"z").as[(Long, Double)].collect().toMap
      assert(got == static,
        s"stream emitted ${got.size} rows vs static ${static.size}")
    } finally q.stop()
  }
}
