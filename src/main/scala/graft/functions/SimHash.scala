package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash over a token array — the classic near-duplicate
  * fingerprint (Charikar 2002; used at web scale for crawl dedup): hash
  * each token to 64 bits, sum ±1 per bit position, keep the sign bit.
  * Near-duplicate documents differ in few bit positions (small Hamming
  * distance), so grouping by the fingerprint (or by bands of it) turns
  * near-dedup into an ordinary hash shuffle — the 100 TB-safe formulation,
  * vs the O(n²) pairwise Jaccard join.
  *
  * Implemented as a native Catalyst `Expression` (not a Scala UDF) so null
  * handling and column binding stay inside Tungsten rows; token hashing
  * reuses Spark's own XxHash64 kernel. CodegenFallback keeps the
  * implementation small — the per-row cost is dominated by hashing, not
  * virtual dispatch.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Register `simhash64(array<string>) -> bigint` for use via expr()/SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")

  /** Hamming distance between two fingerprints (driver/test-side helper). */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
