package graft

import graft.queries.{EventOps, VectorQueries}

/** Round-11 third batch: sequence-mining support laws, interarrival
  * moment sanity, the Matryoshka recall envelope, and the rerank
  * chain's contract with its own candidate generator. */
class R11cOpsSpec extends SparkSpec {

  test("seq mining: support(abc) <= support(ab) so confidence <= 1; " +
      "coverage <= 1") {
    val rows = EventOps.qSeqMining(spark, sf).collect()
    rows.foreach { r =>
      val conf = r.getAs[Double]("confidence")
      val cov = r.getAs[Double]("coverage")
      assert(conf > 0.0 && conf <= 1.0, s"confidence $conf")
      assert(cov > 0.0 && cov <= 1.0, s"coverage $cov")
      assert(r.getAs[Long]("support") >= 5)
    }
  }

  test("interarrival: positive rates, CV defined, one row per type") {
    val rows = EventOps.qInterarrival(spark, sf).collect()
    assert(rows.length == 5, "five event types")
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_gap_s") > 0.0)
      assert(r.getAs[Double]("rate_per_hour") > 0.0)
      val cv = r.getAs[Double]("cv")
      assert(!cv.isNaN && cv >= 0.0)
      assert(r.getAs[Boolean]("bursty") == (cv > 1.2))
    }
  }

  test("matryoshka: recalls in [0,1] and wider prefixes never hurt on " +
      "this fixture") {
    val rows = VectorQueries.qMatryoshka(spark, sf).collect()
      .map(r => r.getAs[Int]("dims") -> r.getAs[Double]("mean_recall"))
      .toMap
    assert(rows.keySet == Set(16, 32))
    rows.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(rows(32) >= rows(16),
      s"32-dim prefix recall ${rows(32)} below 16-dim ${rows(16)}")
  }

  test("ann rerank: every served neighbor is a candidate pair of the " +
      "md5 index, ranked contiguously from 1") {
    import spark.implicits._
    val served = VectorQueries.qAnnRerank(spark, sf).collect()
    val byQ = served.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq == (1 to ranks.length), s"ranks $ranks")
      assert(ranks.length <= 3)
    }
    served.foreach(r => assert(r.getAs[Double]("sim") >= 0.25,
      "rerank must only serve index-admitted candidates"))
  }
}
