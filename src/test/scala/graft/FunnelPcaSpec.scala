package graft

import graft.queries.{EventOps, VectorQueries}

/** Semantic contracts of the staged funnel and the power-iteration PCA.
  * Both queries hash-check against DuckDB via the driver gate; these
  * tests pin the properties the hash alone doesn't explain — the
  * strictly-after/within-window chaining against an independent
  * brute-force replay, and the eigenvector's fixed-point invariants. */
class FunnelPcaSpec extends SparkSpec {

  test("staged funnel matches an independent per-user replay") {
    import spark.implicits._
    val winUs = 24L * 3600 * 1000000
    val ev = Tables.df(spark, sf, "events")
      .select($"user_id", $"event_type",
        org.apache.spark.sql.functions.unix_micros(
          $"ts".cast("timestamp")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    // brute-force replay: first view; first click strictly after it and
    // within the window; first purchase strictly after that click ditto
    var n1 = 0L; var n2 = 0L; var n3 = 0L
    for ((_, rows) <- ev) {
      def minAfter(tpe: String, t: Long): Option[Long] = {
        val c = rows.collect {
          case (_, `tpe`, us) if us > t && us - t <= winUs => us
        }
        if (c.isEmpty) None else Some(c.min)
      }
      val t1 = {
        val v = rows.collect { case (_, "view", us) => us }
        if (v.isEmpty) None else Some(v.min)
      }
      t1.foreach { a =>
        n1 += 1
        minAfter("click", a).foreach { b =>
          n2 += 1
          minAfter("purchase", b).foreach(_ => n3 += 1)
        }
      }
    }
    val got = EventOps.qFunnelStaged(spark, sf).collect()
      .map(r => r.getAs[Long]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(got === Map(1L -> n1, 2L -> n2, 3L -> n3))
    assert(n1 >= n2 && n2 >= n3, "funnel stages must shrink monotonically")
    assert(n2 > 0 && n3 > 0, "fixture should exercise all three stages")
  }

  test("pca power iteration converges to a normalized covariance fixed point") {
    import spark.implicits._
    val out = VectorQueries.qPcaPower(spark, sf).collect()
      .sortBy(_.getAs[Long]("dim"))
    assert(out.length === 16)
    val pc1 = out.map(_.getAs[Double]("pc1"))
    // the max-|.| normalization pins the largest component to exactly ±1
    assert(pc1.map(math.abs).max === 1.0)
    // independent double-precision replay: covariance of the 6dp-rounded
    // leading 16 dims + 3 max-normalized power steps. The query's decimal
    // bookkeeping agrees with plain doubles to well under its 9dp rounds.
    val x = Tables.df(spark, sf, "embeddings")
      .select($"embedding".cast("array<double>")).collect()
      .map(_.getSeq[Double](0).take(16).toArray
        .map(v => math.rint(v * 1e6) / 1e6))
    val n = x.length
    val mu = Array.tabulate(16)(i => x.map(_(i)).sum / n)
    val cov = Array.tabulate(16, 16)((i, j) =>
      x.map(r => r(i) * r(j)).sum / n - mu(i) * mu(j))
    var v = Array.fill(16)(1.0)
    for (_ <- 1 to 3) {
      val u = Array.tabulate(16)(i =>
        (0 until 16).map(j => cov(i)(j) * v(j)).sum)
      val m = u.map(math.abs).max
      v = u.map(_ / m)
    }
    for (i <- 0 until 16)
      assert(math.abs(pc1(i) - v(i)) < 1e-5,
        s"dim $i: query ${pc1(i)} vs replay ${v(i)}")
    // var_d is the covariance diagonal
    for (i <- 0 until 16)
      assert(math.abs(out(i).getAs[Double]("var_d") - cov(i)(i)) < 1e-6)
  }
}
