package graft

import graft.queries.{Series2Ops, SeriesOps, Stats2Ops}
import org.apache.spark.sql.functions._

/** Round-15 third batch: effective sample size, the iid-vs-block
  * bootstrap sheet, and seasonal Mann–Kendall — replayed driver-side
  * against the same collected day series. */
class R15cOpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val series: Array[(String, Double)] =
    SeriesOps.dailySeries(spark, sf).orderBy($"t")
      .select($"d".cast("string"), $"y".cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))

  test("effective n: the ACF sum replays lag-by-lag and n_eff is " +
      "exactly n over the variance inflation factor") {
    val r = Stats2Ops.qEffectiveN(spark, sf).head()
    val ys = series.map(_._2)
    val n = ys.length
    assert(r.getLong(0) == n.toLong)
    val mean = ys.sum / n
    val dev = ys.map(_ - mean)
    def r9(v: Double) = math.rint(v * 1e9) / 1e9
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    val den = dev.map(e => r9(e * e)).sum
    val sr = (1 to 7).map { lag =>
      r6((lag until n).map(i => r9(dev(i) * dev(i - lag))).sum / den)
    }.sum
    assert(math.abs(r.getDouble(1) - r6(sr)) < 1e-9,
      s"sum_acf7 ${r.getDouble(1)} vs replay ${r6(sr)}")
    val vif = 1.0 + 2.0 * sr
    assert(math.abs(r.getDouble(2) - r6(vif)) < 1e-9)
    if (vif > 0) {
      val nEff = math.rint(n / math.max(vif, 1.0 / n) * 100) / 100
      assert(math.abs(r.getDouble(3) - nEff) < 1e-9,
        s"n_eff ${r.getDouble(3)} vs replay $nEff")
      assert(math.abs(r.getDouble(4) - r6(math.sqrt(vif))) < 1e-9)
    } else assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("boot compare: the block arm IS q_block_bootstrap's CI, the " +
      "est matches, and both CIs bracket it") {
    val r = Stats2Ops.qBootCompare(spark, sf).head()
    val blk = Series2Ops.qBlockBootstrap(spark, sf).head()
    assert(r.getLong(0) == blk.getLong(0), "same day count")
    assert(r.getDouble(1) == blk.getDouble(3), "same point estimate")
    assert(r.getDouble(4) == blk.getDouble(4) &&
      r.getDouble(5) == blk.getDouble(5),
      "the block arm must be the one q_block_bootstrap machinery")
    assert(r.getDouble(2) < r.getDouble(3), "iid CI ordered")
    assert(r.getDouble(4) < r.getDouble(5), "block CI ordered")
    val est = r.getDouble(1)
    assert(r.getDouble(2) <= est && est <= r.getDouble(3),
      "iid CI must bracket the estimate")
    assert(r.getDouble(4) <= est && est <= r.getDouble(5),
      "block CI must bracket the estimate")
    val ratio = math.rint((r.getDouble(5) - r.getDouble(4))
      / (r.getDouble(3) - r.getDouble(2)) * 1e6) / 1e6
    assert(math.abs(r.getDouble(6) - ratio) < 1e-9)
  }

  test("spc stream: two unordered micro-batches against the frozen " +
      "Phase-I limits reproduce the batch chart row-for-row") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val limits = Stats2Ops.spcLimits(spark, sf).localCheckpoint()
    val all = Tables.df(spark, sf, "orders")
      .select($"o_orderdate".cast("timestamp").as[Timestamp],
        $"o_totalprice".as[Double]).collect().toSeq
    val (b1, b2) = all.zipWithIndex.partition(_._2 % 2 == 0)
    val input = MemoryStream[(Timestamp, Double)]
    val q = graft.streaming.Streams.spcStream(
        input.toDF().toDF("ts", "value"), limits)
      .writeStream.format("memory").queryName("spc_stream")
      .outputMode("complete").start()
    try {
      input.addData(b1.map(_._1))
      q.processAllAvailable()
      input.addData(b2.map(_._1))
      q.processAllAvailable()
      val got = spark.table("spc_stream")
        .select(substring($"w.start".cast("string"), 1, 10).as("d"),
          $"n", $"xbar", $"lcl", $"ucl", $"ooc")
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
      val want = Stats2Ops.qSpcXbar(spark, sf)
        .select(substring($"d", 1, 10).as("d"),
          $"n", $"xbar", $"lcl", $"ucl", $"ooc")
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
      assert(got.size == want.size,
        s"day counts differ: ${got.size} vs ${want.size}")
      want.foreach { case (d, w) =>
        assert(got(d) == w, s"stream row $d ${got(d)} vs batch $w")
      }
    } finally q.stop()
  }

  test("seasonal mk: per-stratum S and variance replay from the dow " +
      "split and the combined statistic sums them") {
    val rows = Series2Ops.qSeasonalMk(spark, sf).collect()
      .sortBy(_.getInt(0))
    val epoch = java.time.LocalDate.of(1970, 1, 5)
    val byDow = series.zipWithIndex.groupBy { case ((d, _), _) =>
      (java.time.temporal.ChronoUnit.DAYS.between(
        epoch, java.time.LocalDate.parse(d.take(10))) % 7).toInt
    }
    assert(rows.length == byDow.size)
    var sTot = 0L
    var varTot = 0.0
    rows.foreach { r =>
      val g = byDow(r.getInt(0)).map(_._1._2)
      val nG = g.length
      assert(r.getLong(1) == nG.toLong)
      val s = (for (i <- g.indices; j <- i + 1 until nG)
        yield math.signum(g(j) - g(i)).toLong).sum
      assert(r.getLong(2) == s, s"S mismatch at dow ${r.getInt(0)}")
      val ties = g.groupBy(identity).values.map(_.length.toLong)
      val tieTerm = ties.map(t => t * (t - 1) * (2 * t + 5)).sum
      val v = (nG.toLong * (nG - 1) * (2L * nG + 5) - tieTerm) / 18.0
      assert(math.abs(r.getDouble(3) - math.rint(v * 1e6) / 1e6) < 1e-9)
      sTot += s
      varTot += math.rint(v * 1e9) / 1e9
    }
    val r0 = rows.head
    assert(r0.getLong(4) == sTot, "combined S must sum the strata")
    val z = if (sTot > 0) (sTot - 1) / math.sqrt(varTot)
      else if (sTot < 0) (sTot + 1) / math.sqrt(varTot) else 0.0
    assert(math.abs(r0.getDouble(5) - math.rint(z * 1e6) / 1e6) < 1e-9,
      s"z ${r0.getDouble(5)} vs replay $z")
    val zr = r0.getDouble(5)
    val want = if (zr > 1.959964) "increasing"
      else if (zr < -1.959964) "decreasing" else "no_trend"
    assert(rows.forall(_.getString(6) == want))
  }
}
