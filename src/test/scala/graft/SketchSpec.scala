package graft

import org.apache.spark.sql.functions._

/** The DataFrameStatFunctions sketch surface — Spark's counterpart of
  * Hive's GenericUDAFComputeStats ndv/NumDistinctValueEstimator family:
  * frequent items, count-min sketch, and bloom filter. All sketches are
  * mergeable (map-side partial → merge), so they keep the 100 TB shuffle
  * envelope of any algebraic aggregate. */
class SketchSpec extends SparkSpec {

  test("freqItems surfaces the genuinely frequent values") {
    import spark.implicits._
    val items = Tables.df(spark, sf, "orders").stat
      .freqItems(Seq("o_orderpriority"), 0.1)
      .head().getSeq[String](0).toSet
    val top = Tables.df(spark, sf, "orders")
      .groupBy($"o_orderpriority").count()
      .orderBy($"count".desc).head().getString(0)
    assert(items.contains(top))
  }

  test("count-min sketch estimates within epsilon of exact counts") {
    import spark.implicits._
    val orders = Tables.df(spark, sf, "orders")
    val cms = orders.stat
      .countMinSketch($"o_orderpriority", eps = 0.01, confidence = 0.95,
        seed = 42)
    val exact = orders.groupBy($"o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n, "CMS never undercounts")
      assert(est <= n + (0.01 * total).toLong + 1,
        s"$k: est $est vs exact $n")
    }
  }

  test("bloom filter has no false negatives and bounded false positives") {
    import spark.implicits._
    val orders = Tables.df(spark, sf, "orders")
    val bf = orders.stat.bloomFilter($"o_orderkey", expectedNumItems = 2000,
      fpp = 0.03)
    val keys = orders.select($"o_orderkey").collect().map(_.getLong(0))
    assert(keys.forall(bf.mightContain), "no false negatives allowed")
    val absent = (1000000L to 1002000L).count(bf.mightContain)
    assert(absent < 2000 * 0.10, s"false positive rate too high: $absent/2000")
  }
}
