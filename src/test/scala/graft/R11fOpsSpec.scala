package graft

import graft.queries.{GovernOps, InferOps}
import org.apache.spark.sql.functions._

/** Round-11 sixth batch: TOST consistency with its own one-sided
  * statistics and the DP-mean release's JVM noise replay. */
class R11fOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tost: verdict replays from its own t statistics; margin is 5% " +
      "of the pooled mean") {
    val r = InferOps.qTost(spark, sf).collect().head
    val tl = r.getAs[Double]("t_lower"); val tu = r.getAs[Double]("t_upper")
    // rounded t's replay the unrounded verdict away from the knife edge
    if (math.min(tl, tu) < 1.64 || math.min(tl, tu) > 1.65)
      assert(r.getAs[Boolean]("equivalent") == (tl > 1.645 && tu > 1.645))
    assert(r.getAs[Double]("margin") > 0.0)
    assert(r.getAs[Double]("se") > 0.0)
    val d = r.getAs[Double]("cohens_d")
    assert(!d.isNaN && math.abs(d) < 3.0)
  }

  test("dp mean: the Laplace draws replay exactly on the JVM (sum at " +
      "scale C/eps, count at 1/eps)") {
    val rows = GovernOps.qDpMean(spark, sf)
      .select($"source", $"n", $"true_mean", $"dp_mean")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(tag: String, src: String): Double = {
      val hex = md.digest(s"dpm:$tag:$src".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) + 0.5) / math.pow(2, 60)
    }
    def lap(uu: Double, scale: Double): Double =
      BigDecimal(-scale * (if (uu >= 0.5) 1.0 else -1.0) *
        math.log(2.0 * math.min(uu, 1.0 - uu)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // recompute clipped sums straight from the fixture
    val sums = Tables.df(spark, sf, "documents")
      .groupBy($"source")
      .agg(sum(least($"n_chars".cast("double"), lit(1000.0))
        .cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("s"),
        count(lit(1)).as("n"))
      .as[(String, java.math.BigDecimal, Long)].collect()
      .map(t => t._1 -> (t._2.doubleValue(), t._3)).toMap
    rows.foreach { case (src, n, _, dpMean) =>
      val (s, nn) = sums(src)
      assert(nn == n)
      val noisyS = s + lap(u("s", src), 2000.0)
      val noisyN = n + lap(u("n", src), 2.0)
      val exp = BigDecimal(noisyS / noisyN)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(dpMean - exp) < 1e-9,
        s"$src dp_mean $dpMean vs replayed $exp")
    }
  }
}
