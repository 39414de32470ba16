package graft

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Generator-driven properties (scalacheck Gens sampled inside scalatest —
  * the scalatest/scalacheck bridge artifact isn't available offline). */
class PropertySpec extends SparkSpec {

  private val seed = org.scalacheck.rng.Seed(42L)
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.iterate((g.pureApply(Gen.Parameters.default, seed), seed.next)) {
      case (_, s) => (g.pureApply(Gen.Parameters.default, s), s.next)
    }.map(_._1).take(n).toSeq

  private val wordGen = Gen.oneOf("the", "fox", "jumps", "data", "spark",
    "rows", "fast", "slow", "a", "join")
  private val docGen = Gen.chooseNum(1, 12)
    .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  test("property: exact dedup is idempotent and keeps distinct-count rows", Heavy) {
    import spark.implicits._
    samples(Gen.listOfN(30, docGen), 5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = Dedup.exactDedup(df, "text", "doc_id")
      assert(once.count() === texts.distinct.length)
      assert(Dedup.exactDedup(once, "text", "doc_id").count() === once.count())
    }
  }

  test("property: union-all count is additive, union-distinct bounded", Heavy) {
    import spark.implicits._
    samples(Gen.zip(Gen.listOf(Gen.chooseNum(0, 50)),
      Gen.listOf(Gen.chooseNum(0, 50))), 8).foreach { case (xs, ys) =>
      val a = xs.toDF("v"); val b = ys.toDF("v")
      assert(a.unionAll(b).count() === xs.length + ys.length)
      assert(a.union(b).distinct().count() === (xs ++ ys).distinct.length)
    }
  }

  test("property: rank multiset is invariant under input row permutation", Heavy) {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    samples(Gen.listOfN(40, Gen.zip(Gen.oneOf("x", "y"),
      Gen.chooseNum(0, 9))), 5).foreach { rows =>
      def ranks(rs: Seq[(String, Int)]): Seq[(String, Int, Int)] = {
        val w = Window.partitionBy($"k").orderBy($"v")
        rs.toDF("k", "v").withColumn("r", rank().over(w))
          .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
          .toSeq.sorted
      }
      assert(ranks(rows) === ranks(scala.util.Random.shuffle(rows)))
    }
  }

  test("property: cosine similarity symmetric and within bounds", Heavy) {
    import spark.implicits._
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-100, 100).map(_ / 10.0f))
      .suchThat(v => v.exists(_ != 0.0f))
    samples(Gen.zip(vecGen, vecGen), 10).foreach { case (a, b) =>
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
        .select(VectorFunctions.cosineSim($"a", $"b").as("ab"),
          VectorFunctions.cosineSim($"b", $"a").as("ba"))
      val r = df.head()
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      assert(r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9)
    }
  }

  test("property: fingerprint equal for equal strings, stable across runs", Heavy) {
    import spark.implicits._
    samples(docGen, 10).foreach { text =>
      val fp = Seq(text, text).toDF("text")
        .select(TextFunctions.fingerprint($"text").as("fp"))
        .collect().map(_.getLong(0))
      assert(fp(0) === fp(1))
    }
  }
}
