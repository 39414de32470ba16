package graft

import graft.functions.{SimHash64, SortedIntersectSize}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Generative properties for the custom Catalyst expressions, evaluated
  * through the public `Expression.eval` path (no SparkSession — these run
  * in milliseconds and cover the algebra the example-based specs can't). */
object ExpressionProps extends Properties("graft.expressions") {

  private def sortedLit(xs: Set[Long]) =
    Literal.create(xs.toArray.sorted, ArrayType(LongType))

  property("sortedIntersectSize equals set-intersection cardinality") =
    forAll { (a: Set[Long], b: Set[Long]) =>
      val got = SortedIntersectSize(sortedLit(a), sortedLit(b))
        .eval(null).asInstanceOf[Int]
      got == (a & b).size
    }

  property("sortedIntersectSize is symmetric") =
    forAll { (a: Set[Long], b: Set[Long]) =>
      SortedIntersectSize(sortedLit(a), sortedLit(b)).eval(null) ==
        SortedIntersectSize(sortedLit(b), sortedLit(a)).eval(null)
    }

  property("sortedIntersectSize self-intersection is the set size") =
    forAll { (a: Set[Long]) =>
      SortedIntersectSize(sortedLit(a), sortedLit(a))
        .eval(null).asInstanceOf[Int] == a.size
    }

  private val tokenGen = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))

  private def simhashOf(tokens: Seq[String]): Long =
    SimHash64(Literal.create(tokens, ArrayType(StringType)))
      .eval(null).asInstanceOf[Long]

  property("simhash is deterministic and permutation-invariant") =
    forAll(tokenGen) { tokens =>
      val fp = simhashOf(tokens)
      fp == simhashOf(tokens) &&
        fp == simhashOf(scala.util.Random.shuffle(tokens)) &&
        fp == simhashOf(tokens.reverse)
    }

  property("simhash of a single token is that token's hash") =
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { tok =>
      // with one token every bit count is ±1 following the hash bits
      simhashOf(Seq(tok)) ==
        SimHash64.hashToken(org.apache.spark.unsafe.types.UTF8String.fromString(tok))
    }

  property("Jaccard >= 0.5 implies token counts within 2x (the block bound)") =
    forAll { (a: Set[Long], b: Set[Long]) =>
      val inter = (a & b).size.toDouble
      val union = (a | b).size.toDouble
      val j = if (union == 0) 0.0 else inter / union
      j < 0.5 || {
        val (mn, mx) = (math.min(a.size, b.size), math.max(a.size, b.size))
        mx <= 2 * mn
      }
    }
}
