package graft

import graft.queries.{GovernOps, TextOps}
import org.apache.spark.sql.functions._

/** Round-11 tenth batch: DP-histogram release laws and the blocking
  * eval's arithmetic-vs-enumeration consistency. */
class R11jOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dp histogram: released counts non-negative, shares sum to 1, " +
      "noisy replays the clamp") {
    val rows = GovernOps.qDpHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    var shareSum = 0.0
    rows.foreach { r =>
      val released = r.getAs[Double]("released")
      assert(released >= 0.0, "post-processing must clamp at zero")
      assert(released == math.max(r.getAs[Double]("noisy"), 0.0)
        || math.abs(released - math.max(r.getAs[Double]("noisy"), 0.0))
          < 1e-9)
      shareSum += r.getAs[Double]("released_share")
    }
    assert(math.abs(shareSum - 1.0) < 1e-3,
      s"renormalized shares must sum to ~1, got $shareSum")
  }

  test("blocking eval: candidate arithmetic equals brute enumeration " +
      "and the metrics are coherent") {
    val r = TextOps.qBlockingEval(spark, sf).collect().head
    val nPairs = r.getAs[Long]("n_pairs")
    val nCand = r.getAs[Long]("n_cand")
    val nTruth = r.getAs[Long]("n_truth")
    // brute-force the candidate count from lengths (tiny at sf0.001)
    val lens = Tables.df(spark, sf, "documents")
      .filter($"doc_id" % 3 === 0)
      .select($"n_chars").as[Long].collect()
    var brute = 0L
    for (i <- lens.indices; j <- (i + 1) until lens.length)
      if (math.abs(lens(i) - lens(j)) <= 40) brute += 1
    assert(nCand == brute, s"histogram arithmetic $nCand vs brute $brute")
    assert(nPairs == lens.length.toLong * (lens.length - 1) / 2)
    assert(nTruth > 0, "the fixture must contain J>=0.8 truth pairs")
    val rr = r.getAs[Double]("reduction_ratio")
    assert(rr > 0.0 && rr < 1.0)
    val pc = r.getAs[Double]("pair_completeness")
    assert(pc >= 0.0 && pc <= 1.0)
  }
}
