package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins — the manual counterpart of Hive's
  * SkewJoinResolver and Spark AQE's skew-join split. AQE handles skew
  * detected at runtime; salting is the static tool for keys KNOWN to be
  * hot (e.g. a null-ish default key holding 10% of a 100 TB fact table).
  *
  * The left (large, skewed) side gets a deterministic salt in [0, n);
  * the right side is replicated n× with every salt value; the join key
  * becomes (key, salt). Row multiplicity is preserved exactly.
  */
object Skew {

  /** Inner equi-join with an n-way salted key. The salt mixes the row's
    * columns with its physical position (partition id + per-partition
    * offset) so FULLY IDENTICAL hot-key rows still spread across all n
    * buckets — hashing columns alone would send every duplicate to one
    * bucket, re-creating the skew. Any salt value joins correctly (the
    * right side carries every salt), so the physical-position component
    * never affects results, only distribution. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      n: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64((left.columns.map(col) :+
        spark_partition_id() :+ monotonically_increasing_id()): _*), lit(n)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1)).cast("array<bigint>")))
    saltedLeft.join(replicatedRight,
      saltedLeft(key) === replicatedRight(key)
        && saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
